"""CDC export: update-mode emissions land in a replayable parquet log."""

import pytest
from pyspark.sql import functions as F

from faust_spark.streaming.runner import cdc_export, stream_parquet
from faust_spark.streaming.state import stateful_counter


@pytest.mark.slow
def test_cdc_log_replays_to_final_state(spark, sf_dir, tmp_path):
    from faust_spark.catalog import load_table

    src = str(tmp_path / "src")
    load_table(spark, sf_dir, "events").repartition(3).write.parquet(src)

    log = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")
    s = stream_parquet(spark, src, max_files_per_trigger=1)
    counted = stateful_counter(s.groupBy("user_id"), "user_id")
    cdc_export(counted, log, ckpt)

    # replay: last write per key (max batch id) must equal the batch truth
    log_df = spark.read.parquet(log)
    assert log_df.select("__batch_id").distinct().count() >= 3
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(
        F.desc("__batch_id"), F.desc("cnt")
    )
    final = (
        log_df.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", "cnt")
    )
    truth = {
        r.user_id: r.c
        for r in spark.read.parquet(src)
        .groupBy("user_id")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    got = {r.user_id: r.cnt for r in final.collect()}
    assert got == truth
