"""Structured Streaming wrappers (SURVEY.md §7.1 M4).

Structured Streaming's design premise — identical transformations for
batch and stream — means most of the engine needs no streaming-specific
code: the :mod:`sparksent.windows` / :mod:`sparksent.nlp` /
:mod:`sparksent.pipeline` functions apply unchanged to a streaming
DataFrame. This package holds the parts that ARE streaming-specific:

- sources.py: socket (the reference's ingest, SA.scala:41), file-replay
  (deterministic testing), rate (load generation)
- ops.py:     watermarked windowed aggregation + update-mode cumulative
- count_window.py: the one genuinely stateful custom operator
  (countWindow(N).sum, SA.scala:304-311) via applyInPandasWithState
- sinks.py:   console (the reference's only sink), memory (tests),
  parquet, foreachBatch
- neardup.py: incremental new-vs-corpus MinHash dedup (stream-static
  band join against a precomputed corpus index)
- ivf_route.py: route incoming embeddings to their trained IVF cell
  (stateless broadcast-argmin projection; admission control for the
  vector index)
"""

from .ivf_route import (  # noqa: F401
    ivf_centroid_row,
    route_to_cells,
)
from .neardup import (  # noqa: F401
    audio_fp_admit_batch,
    audio_fp_band_index,
    benchmark_gram_index,
    decontaminate_stream_batch,
    image_phash_admit_batch,
    image_phash_band_index,
    minhash_band_index,
    neardup_admit_batch,
    streaming_neardup_candidates,
    video_framehash_admit_batch,
    video_framehash_band_index,
    winnowing_admit_batch,
    winnowing_band_index,
    write_neardup_index,
)
from .annserve import (  # noqa: F401
    ivf_serve_batch,
    write_ivf_index,
)
from .count_window import (  # noqa: F401
    streaming_count_window,
    streaming_cumulative_per_record,
    streaming_ewma_per_record,
    streaming_rolling_window_stats,
    streaming_space_saving,
)
from .ops import (  # noqa: F401
    streaming_cumulative_sum,
    streaming_exact_dedup,
    streaming_interval_join,
    streaming_session_agg,
    streaming_tumbling_agg,
)
from .quota import (  # noqa: F401
    streaming_domain_quota,
    streaming_domain_quota_windowed,
    streaming_token_budget,
    streaming_token_budget_windowed,
)
from .sources import file_replay_source, kafka_lines, rate_events, socket_lines  # noqa: F401
from .sinks import (  # noqa: F401
    compact_bucketed_store,
    parquet_keyed_merge,
    to_console,
    to_memory,
    to_parquet,
)
