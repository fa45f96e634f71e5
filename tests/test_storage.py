"""Bucketed co-located joins: the pre-shuffled layout must join with no
Exchange, and partitioned writes must prune partitions at scan time."""

import pytest

from pyspark.sql import functions as F

from faust_spark.catalog import load_table
from faust_spark.storage import write_bucketed, write_partitioned


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, ["o_orderkey"])
    write_bucketed(lineitem, "b_lineitem", ["l_orderkey"], 8, ["l_orderkey"])

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed join still shuffled"
        assert "SelectedBucketsCount" in plan
        # sanity: result matches the unbucketed join
        expected = lineitem.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).count()
        assert j.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_by_type")
    write_partitioned(events, path, ["event_type"])
    df = spark.read.parquet(path).filter(F.col("event_type") == "error")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "event_type" in plan.split(
        "PartitionFilters:"
    )[1].splitlines()[0]
    expected = events.filter("event_type = 'error'").count()
    assert df.count() == expected


def test_zorder_key_interleaves_bits(spark):
    from faust_spark.storage import zorder_key

    # x,y already spanning [0,3]: with bits=2 quantization is identity
    df = spark.createDataFrame(
        [(0, 0), (3, 0), (0, 3), (3, 3), (1, 2)], "x int, y int"
    )
    out = {(r.x, r.y): r.zkey for r in zorder_key(df, "x", "y", bits=2).collect()}
    # morton: x bits at even positions, y bits at odd
    assert out[(0, 0)] == 0
    assert out[(3, 0)] == 0b0101
    assert out[(0, 3)] == 0b1010
    assert out[(3, 3)] == 0b1111
    assert out[(1, 2)] == 0b1001  # x=01 -> bit0; y=10 -> bit3


def test_zorder_key_constant_column(spark):
    from faust_spark.storage import zorder_key

    df = spark.createDataFrame([(7, 1), (7, 2)], "x int, y int")
    ks = [r.zkey for r in zorder_key(df, "x", "y", bits=4).collect()]
    assert all(k >= 0 for k in ks)  # degenerate dim quantizes to 0


def test_write_zordered_round_trip(spark, tmp_path):
    from faust_spark.storage import write_zordered

    df = spark.range(1000).selectExpr(
        "id", "id % 37 as x", "cast(id * 7 % 101 as int) as y"
    )
    dest = str(tmp_path / "z")
    write_zordered(df, dest, "x", "y", bits=8, num_files=4)
    back = spark.read.parquet(dest)
    assert back.count() == 1000
    assert set(back.columns) == {"id", "x", "y"}
