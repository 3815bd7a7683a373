"""Streaming per-domain quota admission — the streaming dual of
``ext/curation.sample_domain_quota`` (the RefinedWeb/C4-style
per-source frequency cap, round 12).

Semantic difference, stated honestly: the BATCH operator ranks every
document by the md5 lottery over the WHOLE corpus and keeps each
source's ``cap`` smallest — a pure function of the data.  A stream
cannot rank against future arrivals, so the streaming policy is
necessarily first-come-first-served ACROSS micro-batches (per-source
admitted counter as state) while staying lottery-ordered WITHIN each
micro-batch — so a replayed batch admits the identical set
(at-least-once replay safety), and for any fixed chunking the whole
stream's admitted set is the deterministic greedy chunk-by-chunk
simulation (pinned by the batch≡stream equivalence test).  When the
whole corpus arrives in ONE batch the two operators agree exactly.

Scale: state is one counter per source (O(sources) total, store-
partitioned with the shuffle); each micro-batch shuffles only its own
rows on ``group_col``.  A saturated source costs one counter
comparison per arriving row — the stream-side analog of the batch
WindowGroupLimit bound.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..ext.curation import DOMAIN_QUOTA
from ..ext.hashing import h60


def _field(df: DataFrame, name: str) -> T.StructField:
    return T.StructField(name, df.schema[name].dataType)


def streaming_domain_quota(
    df: DataFrame,
    cap: int = DOMAIN_QUOTA,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Admit at most ``cap`` documents per source across the stream,
    emitting (id, source, rk) with rk = the source's running admitted
    count (1..cap) — run with outputMode('append').

    Per micro-batch, a source's rows are processed in (lottery, id)
    order — the SAME md5 lottery as the batch operator — then admitted
    while the per-source counter is below ``cap``.  State is one
    counter per source; rows after saturation are dropped (never
    emitted), which is the point of the cap."""
    lot = h60(F.concat(F.lit("domquota:"), F.col(id_col).cast("string")))
    tagged = df.select(id_col, group_col).withColumn("lottery", lot)
    out_schema = T.StructType(
        [
            _field(tagged, id_col),
            _field(tagged, group_col),
            T.StructField("rk", T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("admitted", T.LongType())])

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (admitted,) = state.get if state.exists else (0,)
        out: list[tuple] = []
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            # concat BEFORE the sort: a group's batch rows can span
            # Arrow chunks (the count_window lesson)
            pdf = pd.concat(chunks).sort_values(["lottery", id_col])
            for doc in pdf[id_col].to_numpy():
                if admitted >= cap:
                    break
                admitted += 1
                out.append((doc, key[0], admitted))
        state.update((admitted,))
        if out:
            yield pd.DataFrame(out, columns=[id_col, group_col, "rk"])

    return tagged.groupBy(group_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
