"""Physical-plan assertions: the scale contract.

Correct results are necessary; these tests pin the *plans* — pushdown,
pruning, broadcast, codegen — so a regression that keeps results right but
wrecks the 100 TB execution strategy still fails CI.
"""

import pytest

from pyspark.sql import functions as F

import __spark_entry__ as entry
from faust_spark.catalog import load_table


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = entry.queries()["filter_project"](spark, sf_dir)
    plan = plan_of(df)
    assert "PushedFilters: [" in plan and "event_type" in plan


def test_column_pruning(spark, sf_dir):
    df = entry.queries()["filter_project"](spark, sf_dir)
    plan = plan_of(df)
    # only the needed columns reach the parquet reader
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "props" not in read_schema and "l_" not in read_schema


def test_q1_scan_prunes_columns(spark, sf_dir):
    df = entry.queries()["q1_pricing"](spark, sf_dir)
    plan = plan_of(df)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" not in read_schema  # unused column stays unread
    assert "l_quantity" in read_schema


def test_global_table_join_broadcasts(spark, sf_dir):
    df = entry.queries()["global_table_join"](spark, sf_dir)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q3_uses_broadcast_not_sortmerge(spark, sf_dir):
    df = entry.queries()["q3_shipping"](spark, sf_dir)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan


def test_topk_avoids_global_sort(spark, sf_dir):
    df = entry.queries()["topk_users"](spark, sf_dir)
    assert "TakeOrderedAndProject" in plan_of(df)


def test_counter_has_partial_aggregation(spark, sf_dir):
    df = entry.queries()["counter_table"](spark, sf_dir)
    plan = plan_of(df)
    # partial_count before the exchange → map-side combine
    assert "partial_count" in plan or "partial count" in plan.lower()


def test_no_python_udf_in_relational_queries(spark, sf_dir):
    """Core relational/faust-surface queries stay 100% JVM-side."""
    for key in (
        "counter_table", "sum_table", "tumbling_hourly", "q1_pricing",
        "global_table_join", "dedup_jaccard", "simhash_fp", "text_quality",
        "ann_cosine_topk",
    ):
        plan = plan_of(entry.queries()[key](spark, sf_dir))
        assert "BatchEvalPython" not in plan, key
        assert "ArrowEvalPython" not in plan, key


def test_whole_stage_codegen_active(spark, sf_dir):
    df = entry.queries()["q1_pricing"](spark, sf_dir)
    df.collect()  # AQE finalizes the physical plan only on execution
    # codegen stages render as "*(n) Operator" in the executed plan
    assert "*(1)" in plan_of(df)


def test_interval_join_is_equi_join_with_residual(spark, sf_dir):
    """The keyed interval join must plan as a hash/sortmerge equi-join on
    user_id — not BroadcastNestedLoopJoin/cartesian."""
    df = entry.queries()["interval_join_sliding"](spark, sf_dir)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
