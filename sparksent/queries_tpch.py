"""Relational coverage queries (TPC-H-shaped) over the star-schema
fixtures — the join/aggregate/sort/limit surface a complete engine needs
(the reference has zero joins, SURVEY.md §2.3; these are the extension
layer's analytical core and the bench workhorses).

Exactness: money aggregates accumulate in DECIMAL and cast the final
value to DOUBLE (identical across engines and shuffle orders); averages
divide the exact sum by the exact count; dates are emitted as formatted
strings (wall-clock, timezone-proof); every ORDER BY ends in a unique
key so LIMIT is total.

Scale shape: dimension tables (region/nation/customer/supplier/part)
broadcast; the fact tables (lineitem, orders) never shuffle for the
joins — only for the final aggregation. Filters sit directly on the
scans where Catalyst pushes them into parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import tables
from .registry import register


def _dec(col: str, scale: int = 2):
    return F.col(col).cast(f"decimal(18,{scale})")


@register(
    "tpch_q1_pricing",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity::DECIMAL(18,2))::DOUBLE AS sum_qty,
           sum(l_extendedprice::DECIMAL(18,2))::DOUBLE AS sum_base_price,
           sum(l_extendedprice::DECIMAL(18,2) * (1 - l_discount::DECIMAL(18,2)))::DOUBLE
             AS sum_disc_price,
           sum(l_extendedprice::DECIMAL(18,2) * (1 - l_discount::DECIMAL(18,2))
               * (1 + l_tax::DECIMAL(18,2)))::DOUBLE AS sum_charge,
           sum(l_quantity::DECIMAL(18,2))::DOUBLE / count(*) AS avg_qty,
           sum(l_extendedprice::DECIMAL(18,2))::DOUBLE / count(*) AS avg_price,
           sum(l_discount::DECIMAL(18,2))::DOUBLE / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY 1, 2
    """,
    tags=("tpch", "agg"),
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 pricing summary: one scan, map-side partial aggregation into
    4-6 groups; the shipdate filter and 7-column projection push into
    the parquet reader."""
    li = tables.load_table(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    charge = disc_price * (F.lit(1).cast("decimal(18,2)") + _dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(_dec("l_discount")).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "tpch_q3_shipping",
    oracle="""
    SELECT l_orderkey,
           sum(l_extendedprice::DECIMAL(18,2) * (1 - l_discount::DECIMAL(18,2)))::DOUBLE
             AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("tpch", "join"),
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shipping priority: broadcast the filtered customer dimension
    into orders, join lineitem, top-10 revenue. The customer filter
    shrinks the broadcast side to one segment before shipping it."""
    cu = tables.load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = tables.load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    li = tables.load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp_ntz")
    )
    revenue = F.sum(
        _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    ).cast("double")
    return (
        li.join(o.join(F.broadcast(cu), o.o_custkey == cu.c_custkey),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(revenue.alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5_regional",
    oracle="""
    SELECT n_name,
           sum(l_extendedprice::DECIMAL(18,2) * (1 - l_discount::DECIMAL(18,2)))::DOUBLE
             AS revenue
    FROM region JOIN nation ON n_regionkey = r_regionkey
                JOIN customer ON c_nationkey = n_nationkey
                JOIN orders ON o_custkey = c_custkey
                JOIN lineitem ON l_orderkey = o_orderkey
                JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
    tags=("tpch", "join"),
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 local-supplier volume: five joins; every dimension side
    broadcasts (region->nation->customer chain collapses before touching
    the facts), so lineitem/orders shuffle only for the l_orderkey join
    and the final 25-group aggregate."""
    r = tables.load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = tables.load_table(spark, sf_dir, "nation")
    c = tables.load_table(spark, sf_dir, "customer")
    s = tables.load_table(spark, sf_dir, "supplier")
    o = tables.load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = tables.load_table(spark, sf_dir, "lineitem")
    dims = (
        c.join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
               c.c_nationkey == F.col("n_nationkey"))
    )
    revenue = F.sum(
        _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    ).cast("double")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s),
              (li.l_suppkey == s.s_suppkey)
              & (s.s_nationkey == F.col("c_nationkey")))
        .groupBy("n_name")
        .agg(revenue.alias("revenue"))
    )


@register(
    "tpch_q6_forecast",
    oracle="""
    SELECT sum(l_extendedprice::DECIMAL(18,2) * l_discount::DECIMAL(18,2))::DOUBLE
             AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
    tags=("tpch", "agg"),
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 revenue-change forecast: pure scan-and-aggregate; all four
    predicates push to the parquet row-group level, the projection reads
    3 columns."""
    li = tables.load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.04)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(_dec("l_extendedprice") * _dec("l_discount")).cast("double").alias("revenue"),
        F.count("*").alias("n"),
    )


@register(
    "tpch_q17_small_quantity",
    oracle="""
    SELECT sum(l_extendedprice::DECIMAL(18,2))::DOUBLE / 7.0 AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)
    """,
    tags=("tpch", "subquery"),
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 small-quantity revenue: a correlated scalar subquery
    (per-part average quantity) decorrelated by hand into the plan
    Catalyst would produce — one per-part aggregate joined back to the
    filtered fact rows. The brand filter broadcasts part; the per-part
    averages aggregate BEFORE the join, so the big side joins against
    #parts rows, not #lineitem."""
    li = tables.load_table(spark, sf_dir, "lineitem")
    p = tables.load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    avg_q = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum(_dec("l_quantity")) / F.count("*")).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(avg_q, li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "tpch_q18_large_orders",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           sum(l.l_quantity::DECIMAL(18,2))::DOUBLE AS total_qty
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey
                           HAVING sum(l_quantity::DECIMAL(18,2)) > 55)
    GROUP BY o.o_orderkey, o.o_custkey, o.o_orderdate
    """,
    tags=("tpch", "subquery"),
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume orders: IN-subquery with HAVING. The naive plan
    (semi-join the qualifying keys, then re-join the detail rows and
    re-aggregate) shuffles lineitem twice; since the final per-order
    total IS the HAVING aggregate, we aggregate lineitem ONCE, filter,
    and join the small qualifying set to orders — one fact shuffle, and
    the post-filter side is small enough that AQE broadcasts it."""
    li = tables.load_table(spark, sf_dir, "lineitem")
    o = tables.load_table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("tq"))
        .filter(F.col("tq") > 55)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .select(
            "o_orderkey",
            "o_custkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("tq").cast("double").alias("total_qty"),
        )
    )


@register(
    "tpch_q10_returns",
    oracle="""
    SELECT c_custkey, c_name, n_name, c_acctbal,
           sum(l_extendedprice::DECIMAL(18,2) * (1 - l_discount::DECIMAL(18,2)))::DOUBLE
             AS revenue
    FROM customer JOIN orders ON o_custkey = c_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation ON n_nationkey = c_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-07-01'
      AND l_returnflag = 'R'
    GROUP BY 1, 2, 3, 4
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("tpch", "join"),
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned-item reporting: top-20 customers by lost revenue on
    returned items in a half-year. Both filters push into the fact
    scans; customer and nation broadcast; one aggregate on the customer
    key, then a global top-20 (TakeOrderedAndProject — no full sort)."""
    c = tables.load_table(spark, sf_dir, "customer")
    n = tables.load_table(spark, sf_dir, "nation")
    o = tables.load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
    )
    li = tables.load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    revenue = F.sum(
        _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    ).cast("double")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(revenue.alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q14_promo",
    oracle="""
    SELECT 100.0 * sum(CASE WHEN p_type = 'PROMO'
                            THEN (l_extendedprice::DECIMAL(18,2)
                                  * (1 - l_discount::DECIMAL(18,2)))
                            ELSE 0::DECIMAL(18,2) END)::DOUBLE
           / sum(l_extendedprice::DECIMAL(18,2)
                 * (1 - l_discount::DECIMAL(18,2)))::DOUBLE AS promo_revenue_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    """,
    tags=("tpch", "join"),
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 promotion effect: share of revenue from promo parts in a
    year — conditional aggregation over a broadcast part join; the
    shipdate window pushes into the lineitem scan."""
    li = tables.load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    p = tables.load_table(spark, sf_dir, "part")
    disc = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0) * F.sum(promo).cast("double")
                / F.sum(disc).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "tpch_q16_supplier_cnt",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 2, 3, 4, 5)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
    tags=("tpch", "subquery"),
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16-shaped supplier counting (lineitem as the part-supplier
    relation; exclusion set = negative-balance suppliers standing in
    for the comment filter): NOT IN anti-join + exact distinct count
    per part attribute group."""
    li = tables.load_table(spark, sf_dir, "lineitem")
    p = tables.load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size").isin(1, 2, 3, 4, 5))
    )
    bad = tables.load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q19_disjunctive",
    oracle="""
    SELECT sum(l_extendedprice::DECIMAL(18,2) * (1 - l_discount::DECIMAL(18,2)))::DOUBLE
             AS revenue,
           count(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("tpch", "join"),
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 discounted revenue under disjunctive brand/quantity
    predicates — the OR-of-conjunctions shape that exercises predicate
    normalization: the quantity bounds refer to both sides, so the
    disjunction evaluates post-join while the common subexpressions
    stay in one codegen stage."""
    li = tables.load_table(spark, sf_dir, "lineitem")
    p = tables.load_table(spark, sf_dir, "part")
    cond = (
        ((p.p_brand == "Brand#1") & F.col("l_quantity").between(1, 11))
        | ((p.p_brand == "Brand#2") & F.col("l_quantity").between(10, 20))
        | ((p.p_brand == "Brand#3") & F.col("l_quantity").between(20, 30))
    )
    revenue = F.sum(
        _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    ).cast("double")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(revenue.alias("revenue"), F.count("*").alias("n"))
    )


@register(
    "tpch_q7_nation_trade",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           sum(l_extendedprice::DECIMAL(18,2) * (1 - l_discount::DECIMAL(18,2)))::DOUBLE
             AS revenue
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
                  JOIN customer ON c_custkey = o_custkey
                  JOIN supplier ON s_suppkey = l_suppkey
                  JOIN nation n1 ON n1.n_nationkey = s_nationkey
                  JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
    tags=("tpch", "join"),
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 bilateral trade volume: the same nation dimension joins TWICE
    under different roles (supplier side, customer side) with a
    symmetric pair predicate applied after both — per-year revenue
    between the two nations in either direction. All four dimensions
    broadcast; lineitem/orders shuffle once on the order key."""
    li = tables.load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    o = tables.load_table(spark, sf_dir, "orders")
    c = tables.load_table(spark, sf_dir, "customer")
    s = tables.load_table(spark, sf_dir, "supplier")
    n = tables.load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    revenue = F.sum(
        _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    ).cast("double")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(revenue.alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Remaining TPC-H shapes (fixture-adapted: no partsupp/shipmode/commitdate
# columns exist, so supply cost ~ p_retailprice, lateness ~ l_shipdate vs
# o_orderdate; Q13's distribution shape is outer_order_count_distribution
# in queries_relational.py). Completes all 22 Q-shapes.
# ---------------------------------------------------------------------------


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS unit_price
      FROM lineitem GROUP BY 1, 2
    ),
    eu AS (
      SELECT s_suppkey, s_name, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    best AS (
      SELECT ps.l_partkey, min(unit_price) AS best_price
      FROM ps JOIN eu ON ps.l_suppkey = eu.s_suppkey
      GROUP BY 1
    )
    SELECT p_partkey, s_name, n_name, round(unit_price, 6) AS unit_price_r
    FROM ps JOIN eu ON ps.l_suppkey = eu.s_suppkey
            JOIN best ON best.l_partkey = ps.l_partkey
                     AND ps.unit_price = best.best_price
            JOIN part ON p_partkey = ps.l_partkey
    WHERE p_size <= 5 AND p_type = 'STANDARD'
    """,
    tags=("tpch", "subquery"),
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 minimum-cost supplier (fixture-adapted: unit price observed in
    lineitem stands in for ps_supplycost): for each small STANDARD part,
    the EUROPE supplier(s) offering the per-part minimum unit price.
    The correlated min decorrelates into a per-part aggregate joined
    back (exactly Catalyst's rewrite); region/nation/supplier collapse
    broadcast-side before touching the fact-derived price relation."""
    li = tables.load_table(spark, sf_dir, "lineitem")
    p = tables.load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 5) & (F.col("p_type") == "STANDARD")
    )
    s = tables.load_table(spark, sf_dir, "supplier")
    n = tables.load_table(spark, sf_dir, "nation")
    r = tables.load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        s.join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
               s.s_nationkey == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    ps = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"))
        .join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    best = ps.groupBy(F.col("l_partkey").alias("bp_key")).agg(
        F.min("unit_price").alias("best_price")
    )
    return (
        ps.join(best, (ps.l_partkey == F.col("bp_key"))
                & (ps.unit_price == F.col("best_price")))
        .join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .select("p_partkey", "s_name", "n_name",
                F.round("unit_price", 6).alias("unit_price_r"))
    )


@register(
    "tpch_q4_priority_check",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY 1
    """,
    tags=("tpch", "subquery"),
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 order-priority checking (lateness = shipped >90 days after the
    order date, standing in for the absent commit/receipt dates): an
    EXISTS correlated subquery = left-semi join with a cross-side
    predicate; one shuffle pair on the order key, then a 5-group
    aggregate."""
    o = tables.load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = tables.load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "tpch_q8_market_share",
    oracle="""
    WITH t AS (
      SELECT year(o_orderdate) AS o_year,
             sum(l_extendedprice::DECIMAL(18,2)
                 * (1 - l_discount::DECIMAL(18,2)))::DOUBLE AS volume,
             n1.n_name AS supp_nation
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
                    JOIN customer ON c_custkey = o_custkey
                    JOIN nation n2 ON n2.n_nationkey = c_nationkey
                    JOIN region ON r_regionkey = n2.n_regionkey
                    JOIN supplier ON s_suppkey = l_suppkey
                    JOIN nation n1 ON n1.n_nationkey = s_nationkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY 1, 3
    )
    SELECT o_year,
           sum((CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
               ::DECIMAL(28,6))::DOUBLE
             / sum(volume::DECIMAL(28,6))::DOUBLE AS mkt_share
    FROM t GROUP BY 1
    """,
    tags=("tpch", "join"),
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 national market share: NATION_3 suppliers' slice of revenue
    sold into ASIA-region customers per year. Two-level aggregate —
    (year, supp_nation) decimal-exact partials, then the conditional
    share in double; all five dimensions broadcast."""
    li = tables.load_table(spark, sf_dir, "lineitem")
    o = tables.load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    c = tables.load_table(spark, sf_dir, "customer")
    s = tables.load_table(spark, sf_dir, "supplier")
    n = tables.load_table(spark, sf_dir, "nation")
    r = tables.load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_asia = c.join(
        F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
        c.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"),
                  F.col("n_name").alias("supp_nation"))
    volume = F.sum(
        _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    ).cast("double")
    t = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust_asia), o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"), "supp_nation")
        .agg(volume.alias("volume"))
    )
    # second-level sums re-accumulate in decimal: summing the per-nation
    # doubles directly would be shuffle-order-dependent at the last bit
    return t.groupBy("o_year").agg(
        (
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                .otherwise(F.lit(0.0))
                .cast("decimal(28,6)")
            ).cast("double")
            / F.sum(F.col("volume").cast("decimal(28,6)")).cast("double")
        ).alias("mkt_share")
    )


@register(
    "tpch_q9_product_profit",
    oracle="""
    SELECT n_name AS nation, year(l_shipdate) AS o_year,
           sum(l_extendedprice::DECIMAL(18,2)
               * (1 - l_discount::DECIMAL(18,2)))::DOUBLE
           - 0.1 * sum(p_retailprice::DECIMAL(18,2)
                       * l_quantity::DECIMAL(18,2))::DOUBLE AS profit
    FROM lineitem JOIN part ON p_partkey = l_partkey
                  JOIN supplier ON s_suppkey = l_suppkey
                  JOIN nation ON n_nationkey = s_nationkey
    WHERE p_type = 'STANDARD'
    GROUP BY 1, 2
    """,
    tags=("tpch", "join"),
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 product-type profit (supply cost adapted to 10% of retail
    price x quantity — the fixture has no partsupp): profit per supplier
    nation per year over STANDARD parts. Both decimal sums stay exact;
    the profit difference is computed once per group in double."""
    li = tables.load_table(spark, sf_dir, "lineitem")
    p = tables.load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    s = tables.load_table(spark, sf_dir, "supplier")
    n = tables.load_table(spark, sf_dir, "nation")
    revenue = F.sum(
        _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    ).cast("double")
    cost = F.sum(_dec("p_retailprice") * _dec("l_quantity")).cast("double")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("l_shipdate").alias("o_year"))
        .agg((revenue - F.lit(0.1) * cost).alias("profit"))
    )


@register(
    "tpch_q11_important_stock",
    oracle="""
    WITH v AS (
      SELECT l_partkey,
             sum(l_extendedprice::DECIMAL(18,2))::DOUBLE AS part_value
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                    JOIN nation ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_5'
      GROUP BY 1
    )
    SELECT l_partkey, part_value
    FROM v
    WHERE part_value > (SELECT 0.005 * sum(part_value) FROM v)
    """,
    tags=("tpch", "subquery"),
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 important stock (part value = lineitem revenue through
    NATION_5 suppliers, standing in for partsupp value): parts whose
    value exceeds a fraction of the nation's total — the global-total
    scalar subquery becomes a 1-row broadcast cross join; the per-part
    aggregate is computed ONCE and reused for both the total and the
    filter (Spark reuses the exchange)."""
    li = tables.load_table(spark, sf_dir, "lineitem")
    s = tables.load_table(spark, sf_dir, "supplier")
    n = tables.load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_5"
    )
    v = (
        li.join(F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)),
                li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice")).cast("double").alias("part_value"))
    )
    total = v.agg((F.lit(0.005) * F.sum("part_value")).alias("threshold"))
    return (
        v.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
    )


@register(
    "tpch_q12_late_shipments",
    oracle="""
    SELECT floor(datediff('day', o_orderdate, l_shipdate) / 30.0)::BIGINT
             AS delay_band,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END)::BIGINT AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
    tags=("tpch", "join"),
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shipping-delay priority audit (delay bands of 30 days stand
    in for the absent shipmode): per band, how many lineitems belong to
    high- vs low-priority orders — conditional counts after one
    fact-fact join on the order key."""
    o = tables.load_table(spark, sf_dir, "orders")
    li = tables.load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.floor(F.datediff("l_shipdate", "o_orderdate") / 30)
            .cast("long")
            .alias("delay_band")
        )
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             sum(l_extendedprice::DECIMAL(18,2)
                 * (1 - l_discount::DECIMAL(18,2)))::DOUBLE AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY 1
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
    tags=("tpch", "subquery"),
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 top supplier: quarterly revenue view, then the supplier(s)
    hitting the maximum — the scalar max broadcasts back over the same
    aggregate (exchange reuse, no second lineitem scan); exact equality
    on the decimal-accumulated double is engine-stable."""
    li = tables.load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    s = tables.load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            _dec("l_extendedprice")
            * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
        ).cast("double").alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q20_excess_suppliers",
    oracle="""
    WITH pq AS (
      SELECT l_partkey, l_suppkey,
             sum(l_quantity::DECIMAL(18,2))::DOUBLE AS sq
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_type = 'PROMO'
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY 1, 2
    ),
    tot AS (SELECT l_partkey, sum(sq) AS tq FROM pq GROUP BY 1)
    SELECT DISTINCT s_suppkey, s_name
    FROM pq JOIN tot USING (l_partkey)
            JOIN supplier ON s_suppkey = l_suppkey
    WHERE sq > 0.5 * tq
    """,
    tags=("tpch", "subquery"),
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 dominant suppliers (adapted): suppliers who shipped more than
    half of a PROMO part's total 1997 quantity — nested aggregation
    (per part+supplier, then per part) with the inner result reused on
    both sides of the comparison join."""
    li = tables.load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    p = tables.load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = tables.load_table(spark, sf_dir, "supplier")
    pq = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("sq"))
    )
    tot = pq.groupBy(F.col("l_partkey").alias("t_key")).agg(F.sum("sq").alias("tq"))
    return (
        pq.join(tot, pq.l_partkey == F.col("t_key"))
        .filter(F.col("sq") > F.lit(0.5) * F.col("tq"))
        .join(F.broadcast(s), pq.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name")
        .distinct()
    )


@register(
    "tpch_q21_waiting_supplier",
    oracle="""
    WITH l AS (
      SELECT l_orderkey, l_suppkey,
             max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                      THEN 1 ELSE 0 END) AS is_late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
      GROUP BY 1, 2
    ),
    per_order AS (
      SELECT l_orderkey, count(*) AS n_supp, sum(is_late) AS n_late
      FROM l GROUP BY 1
    )
    SELECT s_name, count(*) AS numwait
    FROM l JOIN per_order USING (l_orderkey)
           JOIN supplier ON s_suppkey = l_suppkey
    WHERE is_late = 1 AND n_supp > 1 AND n_late = 1
    GROUP BY 1
    """,
    tags=("tpch", "subquery"),
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 suppliers who kept orders waiting: on finished orders, the
    supplier was LATE (>90 days after order date, the fixture's lateness
    notion) in a multi-supplier order where NO OTHER supplier was late.
    The reference EXISTS/NOT-EXISTS pair decorrelates into per-order
    counts joined back — two aggregates and one join on the order key
    instead of two correlated subquery scans."""
    o = tables.load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = tables.load_table(spark, sf_dir, "lineitem")
    s = tables.load_table(spark, sf_dir, "supplier")
    per_ls = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("is_late")
        )
    )
    per_order = per_ls.groupBy(F.col("l_orderkey").alias("po_key")).agg(
        F.count("*").alias("n_supp"), F.sum("is_late").alias("n_late")
    )
    return (
        per_ls.join(per_order, per_ls.l_orderkey == F.col("po_key"))
        .filter((F.col("is_late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(s), per_ls.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "tpch_q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
      SELECT sum(c_acctbal::DECIMAL(18,2))::DOUBLE / count(*) AS ab
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey AS cntrycode, count(*) AS numcust,
           sum(c_acctbal::DECIMAL(18,2))::DOUBLE AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT ab FROM avg_bal)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY 1
    """,
    tags=("tpch", "subquery"),
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 dormant rich customers (nation key stands in for the phone
    country code): above-average balance, no recent orders. Scalar-avg
    broadcast + anti-join against recent orders; the average divides the
    exact decimal sum by the exact count so the threshold is bit-stable
    across engines."""
    c = tables.load_table(spark, sf_dir, "customer")
    o = tables.load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp_ntz")
    ).select("o_custkey")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count("*")).alias("ab")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )
