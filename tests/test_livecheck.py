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


def test_evaluate_executions_verdicts(spark):
    """Batch audit path: PASS / FAIL(order) / TIMEOUT(late) / INIT
    (pending), duplicate signals keep first arrival, unregistered
    signal names ignored (reference runner state machine,
    faust/livecheck/runners.py:77-108)."""
    import datetime as dt

    from faust_spark.livecheck import (
        evaluate_executions,
        signal_latencies,
    )

    T = dt.datetime
    ex = spark.createDataFrame(
        [
            ("t1", "flow", T(2024, 1, 1, 0, 0), T(2024, 1, 1, 2, 0)),
            ("t2", "flow", T(2024, 1, 1, 0, 0), T(2024, 1, 1, 2, 0)),
            ("t3", "flow", T(2024, 1, 1, 0, 0), T(2024, 1, 1, 2, 0)),
            ("t4", "flow", T(2024, 1, 1, 0, 0), T(2024, 1, 2, 23, 0)),
        ],
        "test_id string, case_name string, ts timestamp, "
        "expires timestamp",
    )
    sig = spark.createDataFrame(
        [
            ("t1", "flow", "a", T(2024, 1, 1, 0, 10)),
            ("t1", "flow", "b", T(2024, 1, 1, 0, 20)),
            ("t1", "flow", "a", T(2024, 1, 1, 0, 50)),  # dup: ignored
            ("t2", "flow", "b", T(2024, 1, 1, 0, 10)),  # order
            ("t2", "flow", "a", T(2024, 1, 1, 0, 20)),  # inverted
            ("t3", "flow", "a", T(2024, 1, 1, 0, 10)),
            ("t3", "flow", "b", T(2024, 1, 1, 3, 0)),  # past expires
            ("t1", "flow", "zzz", T(2024, 1, 1, 0, 1)),  # unregistered
        ],
        "test_id string, case_name string, signal_name string, "
        "ts timestamp",
    )
    specs = spark.createDataFrame(
        [("flow", "a", 0), ("flow", "b", 1)],
        "case_name string, signal_name string, sig_index int",
    )
    out = {
        r.test_id: r
        for r in evaluate_executions(
            ex, sig, specs, as_of=T(2024, 1, 2), require_order=True
        ).collect()
    }
    assert out["t1"].state == "PASS"
    assert out["t1"].runtime_secs == 1200.0  # first 'a', not the dup
    assert out["t2"].state == "FAIL"
    assert out["t2"].runtime_secs == 1200.0  # complete, just disordered
    assert out["t3"].state == "TIMEOUT" and out["t3"].n_seen == 1
    assert out["t4"].state == "INIT"  # expires after as_of

    # without the order assertion t2 is a PASS (reference wait()
    # tolerates early arrivals)
    no_order = {
        r.test_id: r.state
        for r in evaluate_executions(
            ex, sig, specs, as_of=T(2024, 1, 2)
        ).collect()
    }
    assert no_order["t2"] == "PASS"

    lat = {
        (r.test_id, r.signal_name): r.latency_secs
        for r in signal_latencies(ex, sig, specs).collect()
    }
    assert lat[("t1", "a")] == 600.0
    assert lat[("t3", "b")] == 10800.0  # late arrivals included
    assert ("t1", "zzz") not in lat


def test_case_specs_df_declaration_order(spark, tmp_path):
    from faust_spark.livecheck import case_specs_df

    lc = LiveCheck("lc", str(tmp_path / "state"))

    @lc.case(name="ordered")
    class Ordered(Case):
        third_alphabetically = Signal()
        a_first_declared = Signal()

        def run(self, test):
            pass

    rows = case_specs_df(spark, [Ordered]).collect()
    by_name = {r.signal_name: r.sig_index for r in rows}
    # declaration order, not alphabetical (await order of run())
    assert by_name == {"third_alphabetically": 0, "a_first_declared": 1}


def test_case_specs_df_includes_inherited_signals(spark, tmp_path):
    from faust_spark.livecheck import case_specs_df

    lc = LiveCheck("lc", str(tmp_path / "state"))

    class BaseFlow(Case):
        order_sent = Signal()

        def run(self, test):
            pass

    @lc.case(name="checkout")
    class Checkout(BaseFlow):
        order_confirmed = Signal()

    rows = case_specs_df(spark, [Checkout]).collect()
    got = {(r.signal_name, r.sig_index) for r in rows}
    # base signal keeps position 0, subclass signal follows
    assert got == {("order_sent", 0), ("order_confirmed", 1)}


def test_probability_gate_advances_past_skips(tmp_path):
    """The live-traffic draw hashes the TICK counter (every run_once
    call), not the run counter — a case whose draw fails once must not
    be frozen out forever (the draw input must change every tick)."""
    lc = LiveCheck("lc", str(tmp_path / "state"))
    calls = {"n": 0}

    @lc.case(name="coinflip", probability=0.5)
    class Coinflip(Case):
        def run(self, test):
            calls["n"] += 1

    for _ in range(40):
        lc.run_once(live_traffic=True)
    # deterministic md5 draws: some ticks skip, some run — but never
    # all-skip-after-first-failure (the frozen-gate bug) and never all
    assert 5 < calls["n"] < 40


def test_new_case_gets_stall_grace_period(tmp_path):
    """A just-registered case that hasn't run yet measures the stall
    clock from registration — no instant STALL."""
    lc = LiveCheck("lc", str(tmp_path / "state"))

    @lc.case(name="gated", probability=0.0, warn_stalled_after=3600)
    class Gated(Case):
        def run(self, test):
            pass

    lc.run_once(live_traffic=True)  # probability gates it off
    rows = {r[0]: r[1] for r in lc.report_rows()}
    assert rows["gated"] == "INIT"  # not STALL: grace period active


def test_case_test_timeout_knob_bounds_wait(tmp_path):
    """@lc.case(test_timeout=...) is the default Signal.wait deadline."""
    import time as _time

    lc = LiveCheck("lc", str(tmp_path / "state"))

    @lc.case(name="short", test_timeout=0.3)
    class Short(Case):
        done = Signal()

        def run(self, test):
            self.done.wait(test.id)  # no explicit timeout

    t0 = _time.monotonic()
    assert lc.run_case(Short) == "TIMEOUT"
    assert _time.monotonic() - t0 < 5  # bounded by the knob, not 30s


def test_state_dir_uri_scheme_rejected(tmp_path):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="URI scheme"):
        LiveCheck("lc", "hdfs://nn/ckpt/livecheck")


def test_case_stats_rollup_semantics(spark):
    """Suite rollup: verdict counts, trailing-failure run (reset by the
    last PASS in execution-time order), max inter-execution gap with
    the stall threshold, and exact runtime accumulation."""
    import datetime as dt

    from faust_spark.livecheck import case_stats

    T = dt.datetime
    rep = spark.createDataFrame(
        [
            ("t1", "flow", "PASS", T(2024, 1, 1, 0), 10.0),
            ("t2", "flow", "FAIL", T(2024, 1, 1, 1), 12.0),
            ("t3", "flow", "TIMEOUT", T(2024, 1, 1, 2), None),
            ("t4", "flow", "PASS", T(2024, 1, 1, 3), 8.5),
            ("t5", "flow", "FAIL", T(2024, 1, 1, 10), 11.0),
            ("t6", "flow", "TIMEOUT", T(2024, 1, 1, 11), None),
            ("a1", "eng", "FAIL", T(2024, 1, 1, 0), 1.0),
            ("a2", "eng", "FAIL", T(2024, 1, 1, 1), 2.0),
        ],
        "test_id string, case_name string, state string, "
        "ts timestamp, runtime_secs double",
    )
    out = {
        r.case_name: r
        for r in case_stats(rep, warn_stalled_after=5 * 3600).collect()
    }
    f = out["flow"]
    assert (f.n_total, f.n_pass, f.n_fail, f.n_timeout) == (6, 2, 2, 2)
    assert f.pass_rate == 2 / 6
    assert f.consecutive_failures == 2  # t5, t6 after the t4 PASS
    assert f.max_gap_secs == 25200.0  # 03:00 -> 10:00
    assert f.stalled  # 7h > 5h threshold
    assert f.sum_runtime == 41.5
    e = out["eng"]
    assert e.consecutive_failures == 2  # never passed
    assert not e.stalled
