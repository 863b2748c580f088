"""Benchmark-head analytical queries (SURVEY §6 targets; bench.py heads).

TPC-H-shaped queries over the synthetic star schema — these are the
scale stress tests: wide aggregations, multi-way joins with one large
fact side, grouped top-k. Aggregates use exact decimal accumulation
(functions/aggfns.py) so results are bit-stable across engines and
partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.functions.aggfns import davg, dsum
from sensorstream_scalable_sensor_data_pipeline_spark.operators.enrich import enrich
from sensorstream_scalable_sensor_data_pipeline_spark.operators.topk import topk_per_group
from sensorstream_scalable_sensor_data_pipeline_spark.plans.registry import (
    davg_sql,
    dsum_sql,
    query,
)
from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import load_table


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_base_price,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {davg_sql('l_quantity')} AS avg_qty,
           {davg_sql('l_extendedprice')} AS avg_price,
           {davg_sql('l_discount')} AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy grouped aggregation. Plan: pruned
    parquet scan (3 filters pushed) → partial hash agg (map-side) →
    4-group exchange → final agg. The shuffle carries ~4 rows —
    scan-bound at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: dim-filtered multi-way join + grouped top-N.
    customer and orders are broadcast-joined against the lineitem fact
    (fact never shuffles pre-aggregation); the ORDER BY ... LIMIT is a
    TakeOrdered, not a global sort. Tie-broken by l_orderkey so the
    LIMIT frontier is deterministic."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15 00:00:00").cast("timestamp")
    )
    co = enrich(orders, cust, orders["o_custkey"] == cust["c_custkey"], "inner")
    col = li.join(
        F.broadcast(co), li["l_orderkey"] == co["o_orderkey"], "inner"
    )
    return (
        col.groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN supplier s ON s.s_nationkey = n.n_nationkey
    JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: snowflake join chain around one fact. All dims
    broadcast; orders↔lineitem is the only big-big join — Catalyst
    (with AQE) picks broadcast when orders' filtered side fits, else
    sort-merge on the co-partitioned orderkey."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    dims = enrich(
        supplier,
        enrich(nation, region, nation["n_regionkey"] == region["r_regionkey"], "inner"),
        F.col("s_nationkey") == F.col("n_nationkey"),
        "inner",
    )
    fact = li.join(F.broadcast(dims), li["l_suppkey"] == dims["s_suppkey"], "inner")
    fact = fact.join(orders, fact["l_orderkey"] == orders["o_orderkey"], "inner")
    return fact.groupBy("n_name").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


#: q6's oracle, kept importable for the rotated-slot local suite
#: (tests/test_queries_vs_oracle.py) after the round-8 registry
#: rotation (r7 verdict task #1).
Q6_FORECAST_REVENUE_ORACLE = f"""
    SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: selective filters + ungrouped aggregate — the
    purest pushdown test. All four predicates reach the parquet scan
    (row-group min/max skipping on l_shipdate), the partial aggregate
    reduces each task to one row, and the exchange carries exactly
    #partitions rows. At 100 TB this is I/O-bound scan, nothing else.

    Rotated OUT of the 50-slot driver registry in round 8 (r7 verdict
    task #1): its filter+scalar-agg semantics stay driver-covered by
    ``p4_p5_filters``/``p6_range_cutoff``/``a1_a3_a4_scalar_aggs``,
    and it remains a bench HEADLINE head (resolved via EXTRA_HEADS)
    plus locally oracle-pinned. The freed slot carries the
    temporal-join family (plans/temporal.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


_SESSION_GAP_MIN = 30

_SESSIONIZE_ORACLE = f"""
SELECT user_id, session_idx,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events
FROM (
  SELECT user_id, ts,
         CAST(sum(new_sess) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING
         ) AS BIGINT) AS session_idx
  FROM (
    SELECT user_id, ts, event_id,
           CASE WHEN ts - lag(ts) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                ) <= INTERVAL {_SESSION_GAP_MIN} MINUTE
                THEN 0 ELSE 1 END AS new_sess
    FROM events
  )
)
GROUP BY user_id, session_idx
"""


@query("w2_sessionize", oracle=_SESSIONIZE_ORACLE)
def w2_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization as gaps-and-islands window math (an analytic
    capability the reference lacks entirely — SURVEY §2.5 notes zero
    window functions). lag → new-session flag → running sum = session
    index → per-session aggregate. One shuffle on user_id serves both
    window passes and the final aggregate (same key); ties broken by
    event_id so session boundaries are deterministic."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ok = (
        F.unix_micros(F.col("ts")) - F.unix_micros(F.lag(F.col("ts")).over(w))
    ) <= _SESSION_GAP_MIN * 60 * 1_000_000
    flagged = ev.withColumn(
        "new_sess", F.when(gap_ok, F.lit(0)).otherwise(F.lit(1))
    )
    sessioned = flagged.withColumn(
        "session_idx",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sessioned.groupBy("user_id", "session_idx").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


# Registered in round 12 (rotation #4, queued in the r11 verdict):
# the native session_window operator now carries a driver CORRECTNESS
# row; `u1_u2_union_suite` rotated out (its union/dedup semantics are
# separately covered by `a2_d1_d2_distinct_dedup` and the setops unit
# suite, and it keeps a local oracle in the rotated-slot suite).
W3_SESSION_WINDOW_ORACLE = f"""
SELECT user_id,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events
FROM (
  SELECT user_id, ts,
         sum(new_sess) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING
         ) AS session_idx
  FROM (
    SELECT user_id, ts, event_id,
           CASE WHEN ts - lag(ts) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                ) < INTERVAL {_SESSION_GAP_MIN} MINUTE
                THEN 0 ELSE 1 END AS new_sess
    FROM events
  )
)
GROUP BY user_id, session_idx
"""


@query("w3_session_window", oracle=W3_SESSION_WINDOW_ORACLE)
def w3_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same sessions via Spark's native ``session_window``
    aggregation — the streaming-ready form (works identically under a
    watermarked stream). Note the boundary semantics: session_window
    merges events strictly closer than the gap (lag < gap), where the
    window-math variant uses lag <= gap; the oracle mirrors each.
    One shuffle on user_id, sessions merged by the agg operator."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    return (
        ev.groupBy(
            F.col("user_id"),
            F.session_window("ts", f"{_SESSION_GAP_MIN} minutes").alias("sw"),
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rank FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rank
      FROM orders
    ) WHERE rank <= 3
    """,
)
def topk_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k (engine extension, SURVEY §2.12/§4): window +
    row_number + filter compiles to WindowGroupLimit — each task keeps
    only k rows per key, so this survives 100× scale-up unlike a
    global sort."""
    orders = load_table(spark, sf_dir, "orders")
    out = topk_per_group(
        orders.select("o_orderpriority", "o_orderkey", "o_totalprice"),
        ["o_orderpriority"],
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        k=3,
        rank_col="rank",
    )
    return out.select("o_orderpriority", "o_orderkey", "o_totalprice", "rank")


def sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP — revenue by (region, nation), with nation
    subtotals rolling up to region totals and a grand total, plus
    ``grouping_id`` so consumers can tell a real NULL from a subtotal
    row. The reference has no grouping-sets surface at all (SURVEY
    §2.4); this closes that analytics gap the Catalyst-native way:
    ``rollup(...)`` expands to grouping sets inside ONE hash
    aggregate — partial aggregation still collapses map-side, so the
    shuffle carries one row per (grouping-set, group), not one per
    input row. Not registered (driver registry sits at its 50-row
    cap); DuckDB ``GROUP BY ROLLUP`` local oracle in
    tests/test_queries_vs_oracle.py."""
    region = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey"), F.col("r_name")
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey"), F.col("n_regionkey"), F.col("n_name")
    )
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_nationkey")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey"), F.col("o_totalprice")
    )
    joined = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            dsum("o_totalprice").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping_id().alias("gid"),
        )
        .select("r_name", "n_name", "revenue", "n_orders", "gid")
    )


def sales_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over two INDEPENDENT dimensions — revenue by
    (region, order priority) with every marginal: per-region totals,
    per-priority totals, and the grand total in one pass. The
    complement of :func:`sales_rollup` (whose dimensions are
    hierarchical); together they cover Spark's grouping-sets surface.
    Same execution shape: ``cube(...)`` expands inside ONE hash
    aggregate with map-side partial aggregation — the shuffle carries
    one row per (grouping-set, group), 4× the groups of a flat
    aggregate here, not 4× the data. Not registered (50-row cap);
    DuckDB ``GROUP BY CUBE`` local oracle."""
    region = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey"), F.col("r_name")
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey"), F.col("n_regionkey")
    )
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_nationkey")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey"), F.col("o_totalprice"), F.col("o_orderpriority")
    )
    joined = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.cube("r_name", "o_orderpriority")
        .agg(
            dsum("o_totalprice").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping_id().alias("gid"),
        )
        .select("r_name", "o_orderpriority", "revenue", "n_orders", "gid")
    )
