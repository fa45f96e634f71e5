"""Driver contract: entry / queries / oracle_sql.

Each key in ``queries()`` is an implemented operator from SURVEY.md §2 (or a
beyond-reference LLM-pipeline operator); ``oracle_sql()`` holds the DuckDB
ANSI-SQL equivalent run against the same parquet tables.

Determinism rules used throughout (so Spark and DuckDB hash-match):
- Sums over doubles go through ``CAST(x AS DECIMAL(18,2|4))`` on BOTH sides
  (exact decimal accumulation — double summation order would differ), then
  cast back to DOUBLE (a decimal→double conversion is deterministic).
- Averages are computed as decimal-sum / count in double arithmetic.
- Window starts use ``date_trunc`` / epoch arithmetic on naive UTC
  timestamps (the Spark session runs with ``spark.sql.session.timeZone=UTC``).
- Every computed column is aliased identically in both engines.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from faust_spark.catalog import load_table

    return load_table(spark, sf_dir, name)


def _dec_sum(col, scale: int = 2, alias: str = "total"):
    """Deterministic double-sum: exact decimal accumulation, double result."""
    return F.sum(F.col(col).cast(f"decimal(18,{scale})")).cast("double").alias(alias)


# =====================================================================
# faust surface: counters / filters / projections (SURVEY §2.2, §2.4)
# =====================================================================


@_q(
    "counter_table",
    """
    SELECT user_id, COUNT(*) AS cnt
    FROM events GROUP BY user_id
    """,
)
def counter_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The word_count counter-table pattern (``default=int`` table).

    Reference behavior: examples/word_count.py:28-32 — ``table[k] += 1``
    per event. Spark: hash aggregation with map-side partial aggregates;
    at 100 TB this is one shuffle of pre-combined (key, count) pairs.
    """
    from faust_spark import App

    app = App("counter", spark=spark)
    events = app.stream(_t(spark, sf_dir, "events")).group_by("user_id")
    return app.Table("hits").count(events, alias="cnt")


@_q(
    "sum_table",
    """
    SELECT user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM events GROUP BY user_id
    """,
)
def sum_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The withdrawals reducer pattern (``table[k] += amount``).

    Reference behavior: examples/withdrawals.py:51-60.
    """
    from faust_spark import App

    app = App("spend", spark=spark)
    s = app.stream(_t(spark, sf_dir, "events")).group_by("user_id")
    return app.Table("spend").aggregate(s, _dec_sum("value"))


@_q(
    "filter_project",
    """
    SELECT event_id, user_id, value
    FROM events WHERE event_type = 'error'
    """,
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream.filter + items projection (faust/streams.py:606-627,279-291).

    Both the predicate and the projection reach the parquet scan
    (PushedFilters + pruned ReadSchema) — verified in tests/test_plans.py.
    """
    from faust_spark import App

    app = App("filters", spark=spark)
    return (
        app.stream(_t(spark, sf_dir, "events"))
        .filter(F.col("event_type") == "error")
        .select("event_id", "user_id", "value")
        .to_df()
    )


@_q(
    "rekey_json",
    """
    SELECT json_extract_string(props, '$.k') AS k, COUNT(*) AS cnt
    FROM events GROUP BY 1
    """,
)
def rekey_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group_by on a derived key (JSON field) — the repartition operator.

    Reference behavior: Stream.group_by with a callable key selector
    (faust/streams.py:507-604); the shuffle is the repartition topic.
    """
    from faust_spark import App

    app = App("rekey", spark=spark)
    s = (
        app.stream(_t(spark, sf_dir, "events"))
        .group_by(F.get_json_object("props", "$.k"), name="k")
    )
    return app.Table("per_k").count(s, alias="cnt")


@_q(
    "set_table",
    """
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types
    FROM events GROUP BY user_id
    """,
)
def set_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SetTable: per-key changelogged set (faust/tables/sets.py:270-311).

    ``collect_set`` is the distributed set-union; sorted + joined for a
    deterministic comparison encoding.
    """
    from faust_spark import App

    app = App("sets", spark=spark)
    s = app.stream(_t(spark, sf_dir, "events")).group_by("user_id")
    out = app.SetTable("types").collect(s, "event_type", alias="types_arr")
    return out.select(
        "user_id", F.array_join("types_arr", ",").alias("types")
    )


@_q(
    "take_first",
    """
    SELECT event_id, user_id, ts FROM events
    ORDER BY ts, event_id LIMIT 20
    """,
)
def take_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream.take(max_) — bounded buffer (faust/streams.py:303-395).

    Batch semantics: first N in event-time order. Spark executes
    TakeOrderedAndProject — a per-partition top-N then a tiny driver merge,
    never a global sort.
    """
    return (
        _t(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts")
        .orderBy("ts", "event_id")
        .limit(20)
    )


@_q(
    "enumerate_stream",
    """
    SELECT event_id,
           ROW_NUMBER() OVER (ORDER BY event_id) - 1 AS idx
    FROM events WHERE event_type = 'error'
    """,
)
def enumerate_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream.enumerate (faust/streams.py:397-403): running index.

    Note: a global contiguous index is inherently a single-partition
    operation; at scale prefer monotonically_increasing_id (documented in
    Stream.enumerate).
    """
    from faust_spark import App

    app = App("enum", spark=spark)
    return (
        app.stream(_t(spark, sf_dir, "events"))
        .filter(F.col("event_type") == "error")
        .select("event_id")
        .enumerate("event_id", name="idx")
        .to_df()
    )


@_q(
    "union_streams",
    """
    SELECT event_id, event_type, value FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT event_id, event_type, value FROM events WHERE event_type = 'error'
    """,
)
def union_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-stream merge (reference: agent consuming several topics /
    Stream combine; Spark: unionByName, a zero-shuffle narrow op)."""
    from faust_spark import App

    app = App("union", spark=spark)
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    a = app.stream(ev).filter("event_type = 'purchase'")
    b = app.stream(ev).filter("event_type = 'error'")
    return a.union(b).to_df()


@_q("distinct_types", "SELECT DISTINCT event_type FROM events")
def distinct_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup surface (SURVEY §2.6, dropDuplicates)."""
    return _t(spark, sf_dir, "events").select("event_type").distinct()


@_q(
    "topk_users",
    """
    SELECT user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id
    ORDER BY total DESC, user_id LIMIT 10
    """,
)
def topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k over an aggregation — agg + TakeOrderedAndProject (no global
    sort; SURVEY §2.6)."""
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(_dec_sum("value"))
        .orderBy(F.desc("total"), "user_id")
        .limit(10)
    )


# =====================================================================
# windows (SURVEY §2.5)
# =====================================================================


@_q(
    "tumbling_hourly",
    """
    SELECT date_trunc('hour', ts) AS wstart, event_type,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM events GROUP BY 1, 2
    """,
)
def tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling window aggregation (Table.tumbling, faust/windows.py:89-96).

    ``F.window(ts, '3600 seconds')`` start == date_trunc('hour') for
    hour-aligned grids.
    """
    from faust_spark import App

    app = App("tumbling", spark=spark)
    s = app.stream(_t(spark, sf_dir, "events")).group_by("event_type")
    tbl = app.Table("hourly", ts_col="ts").tumbling(3600)
    out = tbl.aggregate(s, F.count(F.lit(1)).alias("cnt"), _dec_sum("value"))
    return out.select(
        F.col("window.start").alias("wstart"), "event_type", "cnt", "total"
    )


@_q(
    "hopping_30m_15m",
    """
    WITH e AS (SELECT epoch(ts) AS te FROM events),
    w AS (
      SELECT CAST(floor(te / 900) * 900 - k * 900 AS BIGINT) AS ws
      FROM e CROSS JOIN (VALUES (0), (1)) t(k)
      WHERE floor(te / 900) * 900 - k * 900 > te - 1800
    )
    SELECT TIMESTAMP '1970-01-01 00:00:00' + INTERVAL '1 second' * ws AS wstart,
           COUNT(*) AS cnt
    FROM w GROUP BY 1
    """,
)
def hopping_30m_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping window (size 30 min, hop 15 min): each event lands in 2
    windows (faust HoppingWindow.ranges, faust/windows.py:25-70).

    The DuckDB oracle materializes the same window-assignment rule
    explicitly (hop-grid floor minus k steps).
    """
    from faust_spark import App

    app = App("hopping", spark=spark)
    s = app.stream(_t(spark, sf_dir, "events")).group_by(F.lit(1), name="g")
    tbl = app.Table("hop", ts_col="ts").hopping(1800, 900)
    out = tbl.aggregate(s, F.count(F.lit(1)).alias("cnt"))
    return out.select(F.col("window.start").alias("wstart"), "cnt")


@_q(
    "window_point_read",
    """
    SELECT user_id, COUNT(*) AS cnt
    FROM events
    WHERE date_trunc('hour', ts) = TIMESTAMP '2024-01-15 12:00:00'
    GROUP BY user_id
    """,
)
def window_point_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed point read: ``table[k].current()/.value()`` selects one
    window's value (faust/tables/wrappers.py:214-237) — a filter on the
    window struct, which Catalyst pushes down to the scan."""
    from faust_spark import App

    app = App("pointread", spark=spark)
    s = app.stream(_t(spark, sf_dir, "events")).group_by("user_id")
    tbl = app.Table("hourly", ts_col="ts").tumbling(3600)
    out = tbl.count(s, alias="cnt")
    # 2024-01-15 12:30 UTC falls in the window starting 12:00
    ts = 1705320000.0  # 2024-01-15 12:00:00 UTC
    return tbl.window_at(out, ts + 1800).select("user_id", "cnt")


# =====================================================================
# joins (SURVEY §2.3) — real implementations where the reference stubs
# =====================================================================


@_q(
    "global_table_join",
    """
    SELECT n.n_name, COUNT(*) AS cnt,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def global_table_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GlobalTable enrichment: broadcast the dimension to every task
    (faust/tables/globaltable.py:5; app.GlobalTable). The fact side never
    shuffles for the join — only the final small agg exchanges."""
    from faust_spark.joins import global_lookup

    e = _t(spark, sf_dir, "events")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    enriched = global_lookup(
        e, c, on=e.user_id == c.c_custkey, how="inner"
    )
    enriched = global_lookup(
        enriched, n, on=enriched.c_nationkey == n.n_nationkey, how="inner"
    )
    return enriched.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("cnt"), _dec_sum("value")
    )


@_q(
    "stream_table_lookup",
    """
    SELECT c.c_mktsegment AS segment, COUNT(*) AS cnt
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    """,
)
def stream_table_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream–table lookup: the ``table[key]`` enrich idiom inside agent
    bodies (reference examples/withdrawals.py:51-60) as a stream-static
    join."""
    from faust_spark.joins import stream_table_join

    e = _t(spark, sf_dir, "events")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    out = stream_table_join(e, c, on=e.user_id == c.c_custkey, how="inner")
    return out.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


@_q(
    "interval_join_sliding",
    """
    SELECT p.user_id, COUNT(*) AS pairs
    FROM events p
    JOIN events c
      ON p.user_id = c.user_id
     AND c.event_type = 'click'
     AND c.ts BETWEEN p.ts - INTERVAL '30 minutes' AND p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.user_id
    """,
)
def interval_join_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SlidingWindow-semantics interval join: clicks within 30 min before a
    purchase, per user (spec: faust/windows.py:116-132 docstring SQL).

    Executes as an equi-join on user_id with the range as residual
    predicate — shuffle by key, no cartesian.
    """
    from faust_spark.joins import interval_join

    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    c = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    out = interval_join(
        p, c, left_ts="ts", right_ts="ts", before=1800.0, after=0.0,
        on="user_id", how="inner",
    )
    return out.groupBy(F.col("l.user_id").alias("user_id")).agg(
        F.count(F.lit(1)).alias("pairs")
    )


@_q(
    "semi_join",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 300000)
    """,
)
def semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi — available natively (absent in the reference, SURVEY
    §2.3 'missing vs relational engines')."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@_q(
    "anti_join",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti — customers with no orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@_q(
    "asof_join",
    """
    WITH last_o AS (
      SELECT o_custkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    )
    SELECT e.event_id, e.user_id, lo.o_totalprice AS last_order_price
    FROM events e
    LEFT JOIN last_o lo ON lo.o_custkey = e.user_id AND lo.rn = 1
    """,
)
def asof_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join: each event enriched with the customer's most
    recent order at event time. Neither faust nor the DataFrame API has
    this; implemented with the union + last-value-carry-forward trick
    (one shuffle, no range scan) in faust_spark.joins.asof_join.

    All fixture orders predate all events, so the oracle reduces to
    'latest order per customer' — the operator itself honors ts ordering.
    """
    from faust_spark.joins import asof_join

    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = (
        _t(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate"),
            F.col("o_orderkey"),
            F.col("o_totalprice"),
        )
    )
    out = asof_join(
        e,
        o,
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        right_tiebreak="o_orderkey",
    )
    return out.select(
        "event_id", "user_id", F.col("o_totalprice").alias("last_order_price")
    )


# =====================================================================
# relational proof queries (TPC-H-ish; the batch surface faust lacks)
# =====================================================================


@_q(
    "q1_pricing",
    """
    WITH li AS (
      SELECT l_returnflag, l_linestatus,
             CAST(l_quantity AS DECIMAL(12,2)) AS qty,
             CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
             CAST(l_discount AS DECIMAL(4,2)) AS disc,
             CAST(l_tax AS DECIMAL(4,2)) AS tax
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    )
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(qty) AS DOUBLE) AS sum_qty,
           CAST(SUM(price) AS DOUBLE) AS sum_base_price,
           CAST(SUM(price * (1 - disc)) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(price * (1 - disc) * (1 + tax)) AS DOUBLE) AS sum_charge,
           CAST(SUM(qty) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(price) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(disc) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM li
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1 pricing summary — full-scan aggregate.

    Scale: map-side partial aggregation over a 4-group key means the
    shuffle carries ~#partitions × 4 rows regardless of input size; the
    scan is the whole cost and prunes to 7 of 11 columns.
    """
    li = _t(spark, sf_dir, "lineitem")
    # exact decimal arithmetic from per-column casts: the sources carry at
    # most 2 decimal digits, so double→decimal(.,2) is unambiguous and the
    # products are computed exactly in both engines (no double rounding).
    qty = F.col("l_quantity").cast("decimal(12,2)")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    sum_qty = F.sum(qty)
    sum_price = F.sum(price)
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_qty.cast("double").alias("sum_qty"),
            sum_price.cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax))
            .cast("double")
            .alias("sum_charge"),
            (sum_qty.cast("double") / cnt).alias("avg_qty"),
            (sum_price.cast("double") / cnt).alias("avg_price"),
            (F.sum(disc).cast("double") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


@_q(
    "q3_shipping",
    """
    SELECT l.l_orderkey AS o_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY 1, 3, 4
    ORDER BY revenue DESC, o_orderkey LIMIT 10
    """,
)
def q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority: selective dim filter → broadcast join →
    agg → top-k. Customer/orders prune before the lineitem join; the final
    top-10 is TakeOrderedAndProject."""
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        l.join(F.broadcast(o), l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("l_orderkey").alias("o_orderkey"),
            "o_orderdate",
            "o_orderpriority",
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@_q(
    "q5_local_volume",
    """
    SELECT n.n_name, r.r_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    """,
)
def q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-style star join: fact → snowflake dims, all broadcast.

    (Simplified vs TPC-H: no supplier-nation equality — the fixture's
    supplier table is vestigial at this scale.)
    """
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


@_q(
    "q6_forecast",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS cnt
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter-aggregate; every predicate pushes to parquet."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * F.col("l_discount").cast("decimal(4,2)")
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


# =====================================================================
# driver contract
# =====================================================================


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: TPC-H Q1 pricing summary."""
    return q1_pricing(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
