"""LiveCheck analogue (faust_spark/livecheck.py vs reference
faust/livecheck/): signals, cases, canary-through-pipeline end-to-end,
failure budgets, stall detection, reporting."""

import os
import time

import pytest
from pyspark.sql import functions as F

from faust_spark.livecheck import (
    Case,
    LiveCheck,
    Signal,
    SuiteFailed,
    TestTimeout,
)


def test_signal_send_wait_roundtrip(tmp_path):
    lc = LiveCheck("lc", str(tmp_path / "state"))

    @lc.case(name="c1")
    class C1(Case):
        done = Signal()

        def run(self, test):
            pass

    C1.done.send("t1", {"n": 3})
    assert C1.done.wait("t1", timeout=1) == {"n": 3}


def test_signal_wait_timeout_marks_case(tmp_path):
    lc = LiveCheck("lc", str(tmp_path / "state"))

    @lc.case(name="never", test_timeout=0.2)
    class Never(Case):
        done = Signal()

        def run(self, test):
            self.done.wait(test.id, timeout=0.2)

    assert lc.run_case(Never) == "TIMEOUT"
    rows = dict((r[0], r[1]) for r in lc.report_rows())
    assert rows["never"] == "TIMEOUT"


def test_canary_through_streaming_pipeline(spark, tmp_path):
    """The reference's core loop: inject a fake request, let the REAL
    pipeline process it, resolve a signal at the sink stage, assert
    end-to-end arrival (faust/livecheck/case.py:run/make_fake_request)."""
    from faust_spark.streaming.runner import stream_parquet

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    lc = LiveCheck("pipeline-lc", os.path.join(ckpt, "livecheck"))
    # seed the source so the schema exists before the canary
    spark.createDataFrame(
        [("seed", "payload")], ["test_id", "data"]
    ).write.mode("overwrite").parquet(src)

    @lc.case(name="roundtrip")
    class Roundtrip(Case):
        arrived = Signal()

        def make_fake_request(self, test):
            spark.createDataFrame(
                [(test.id, "canary")], ["test_id", "data"]
            ).write.mode("append").parquet(src)

        def run(self, test):
            case = self

            def sink(df, bid):
                # the pipeline stage resolves the signal for any
                # tracked order it just committed
                for r in df.filter(
                    F.col("data") == "canary"
                ).collect():
                    case.arrived.send(r.test_id, {"batch": bid})

            q = (
                stream_parquet(spark, src)
                .writeStream.foreachBatch(sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            try:
                got = self.arrived.wait(test.id, timeout=60)
                assert got["batch"] >= 0
            finally:
                q.awaitTermination(120)

    assert lc.run_once() == {"roundtrip": "PASS"}


def test_consecutive_failures_raise_suite_failed(tmp_path):
    lc = LiveCheck("lc", str(tmp_path / "state"))

    @lc.case(name="flaky", max_consecutive_failures=2)
    class Flaky(Case):
        def run(self, test):
            raise AssertionError("broken invariant")

    assert lc.run_case(Flaky) == "FAIL"
    with pytest.raises(SuiteFailed):
        lc.run_case(Flaky)
    # a PASS resets the budget
    Flaky.run = lambda test: None  # instance attr: no self binding
    assert lc.run_case(Flaky) == "PASS"
    rows = {r[0]: r for r in lc.report_rows()}
    assert rows["flaky"][4] == 0  # consecutive reset
    assert rows["flaky"][3] == 2  # total failures kept


def test_probability_gate_is_deterministic(tmp_path):
    lc = LiveCheck("lc", str(tmp_path / "state"))
    calls = {"never": 0, "always": 0}

    @lc.case(name="never_runs", probability=0.0)
    class NeverRuns(Case):
        def run(self, test):
            calls["never"] += 1

    @lc.case(name="always_runs", probability=1.0)
    class AlwaysRuns(Case):
        def run(self, test):
            calls["always"] += 1

    for _ in range(5):
        lc.run_once(live_traffic=True)
    assert calls == {"never": 0, "always": 5}


def test_stall_detection_and_report_df(spark, tmp_path):
    lc = LiveCheck("lc", str(tmp_path / "state"))

    @lc.case(name="quiet", warn_stalled_after=0.05)
    class Quiet(Case):
        def run(self, test):
            pass

    assert lc.run_case(Quiet) == "PASS"
    time.sleep(0.1)
    lc._update_stalled()
    rows = {r[0]: r[1] for r in lc.report_rows()}
    assert rows["quiet"] == "STALL"
    df = lc.report_df(spark)
    assert df.columns == [
        "case", "status", "runs", "total_failures",
        "consecutive_failures", "last_error",
    ]
    assert df.filter(F.col("case") == "quiet").first().status == "STALL"
