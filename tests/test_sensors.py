"""Monitor listener: batch metrics surface through QueryStats."""

import time

from pyspark.sql import functions as F

from faust_spark.sensors import Monitor
from faust_spark.streaming.runner import run_to_memory, stream_parquet


def test_monitor_collects_progress(spark, sf_dir, tmp_path):
    from faust_spark.catalog import load_table

    d = str(tmp_path / "ev")
    load_table(spark, sf_dir, "events").repartition(3).write.parquet(d)

    mon = Monitor()
    spark.streams.addListener(mon)
    try:
        s = stream_parquet(spark, d, max_files_per_trigger=1)
        agg = s.groupBy("user_id").agg(F.count("*").alias("c"))
        run_to_memory(agg, output_mode="complete", query_name="monq")
        # listener events are async; give the bus a moment
        for _ in range(50):
            st = mon.queries.get("monq")
            if st and st.batches >= 3 and st.total_input_rows >= 1000:
                break
            time.sleep(0.2)
        st = mon.queries["monq"]
        assert st.batches >= 3            # one per file trigger
        assert st.total_input_rows == 1000
        assert st.last_processed_rows_per_sec >= 0
    finally:
        spark.streams.removeListener(mon)
