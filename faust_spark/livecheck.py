"""LiveCheck analogue: end-to-end canary checks for running pipelines.

The reference ships LiveCheck (``faust/livecheck/`` — app.py:73-385,
case.py:55-350, signals.py:25-150), its largest subsystem with no
counterpart here until now: production pipelines register test *cases*
that continuously verify the system end-to-end — either by piggybacking
on live traffic with some probability or by injecting *fake requests*
on a schedule — and synchronize on named *signals* that pipeline stages
resolve as the tracked order passes through. A case that stops seeing
traffic goes STALLED; repeated failures fail the suite.

Spark-shaped mapping (micro-batch world, no asyncio):

- **Signal transport**: the reference uses a Kafka bus topic
  (``signals.py:91-150``); here a signal is resolved by appending an
  atomic one-event JSON file under the LiveCheck state directory via
  ordinary file I/O. That is sufficient for the canary runner because
  both ends execute ON THE DRIVER: ``Signal.send`` is typically called
  from a ``foreachBatch`` sink (driver-side by contract) and
  ``Signal.wait`` from the case body. Point ``state_dir`` at a local
  or mounted path; URI-scheme paths (``hdfs://``, ``s3a://``) are
  REJECTED at construction — ``os.makedirs`` would silently create a
  literal local ``hdfs:`` directory. Cluster-wide, many-machine signal
  reconciliation is not this polling loop's job: that is the batch /
  streaming audit below (``evaluate_executions`` /
  ``streaming/livecheck_audit.py``), which reads execution/signal LOGS
  as DataFrames from any DFS.
- **Cases** subclass :class:`Case`, declare signals as class attributes
  (``__set_name__`` binds names, as in the reference), implement
  ``run(test)`` with ordinary assertions, and optionally
  ``make_fake_request()`` to inject a canary when no live traffic
  arrives (reference ``case.py:features frequency/probability``).
- **Execution**: :meth:`LiveCheck.run_once` drives every active case
  once (probability-gated when marked live), records
  PASS/FAIL/TIMEOUT/ERROR, tracks consecutive failures against
  ``max_consecutive_failures`` (→ :class:`SuiteFailed`), and flags
  cases whose last traffic predates ``warn_stalled_after`` as STALL
  (reference ``case.py:State`` machine). :meth:`LiveCheck.report_df`
  returns the suite state as a DataFrame for dashboards /
  ``@app.page`` handlers.

Divergence, documented: the reference interleaves cases with live
consumer traffic via header propagation; Spark's exactly-once batch
boundaries make "ride a live record" equivalent to "inject a canary
row tagged with the test id" — the canary traverses the SAME pipeline
(source → stages → sink), so the end-to-end property checked is the
same. Header propagation over Kafka is covered by the EOS contract
tests instead.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Type

__all__ = [
    "Case",
    "LiveCheck",
    "Signal",
    "SuiteFailed",
    "TestExecution",
    "TestTimeout",
]


class TestTimeout(AssertionError):
    """Signal did not resolve within the deadline (reference
    ``livecheck/exceptions.py:TestTimeout``)."""

    __test__ = False  # reference-parity name; not a pytest class


class SuiteFailed(Exception):
    """A case exceeded ``max_consecutive_failures`` (reference
    ``livecheck/exceptions.py:SuiteFailed``)."""


@dataclass
class TestExecution:
    """One tracked test order (reference ``models.py:TestExecution``):
    the id travels with the canary so stages can resolve signals
    against it."""

    __test__ = False  # reference-parity name; not a pytest class

    id: str
    case_name: str
    timestamp: float

    @classmethod
    def new(cls, case_name: str) -> "TestExecution":
        return cls(
            id=uuid.uuid4().hex, case_name=case_name, timestamp=time.time()
        )


class Signal:
    """Named synchronization point (reference ``signals.py:Signal``).

    Pipeline code calls ``send(test_id, value)`` when the tracked order
    passes the stage; the case's ``run`` calls ``wait(test_id,
    timeout=...)``. Events are one-file-per-event JSON with atomic
    rename — safe under concurrent senders and driver restarts, no
    broker needed.
    """

    def __init__(self, name: str = "") -> None:
        self.name = name
        self.case: Optional["Case"] = None

    def __set_name__(self, owner: Type, name: str) -> None:
        if not self.name:
            self.name = name

    # bound onto the case instance by Case.__init__ (the reference
    # clones class-level signals per case, signals.py:79-84)
    def _bind(self, case: "Case") -> "Signal":
        s = Signal(self.name)
        s.case = case
        return s

    def _dir(self) -> str:
        assert self.case is not None, "signal not bound to a case"
        return os.path.join(
            self.case.app.state_dir, self.case.name, self.name
        )

    def send(self, key: str, value: Any = None) -> None:
        """Resolve this signal for test ``key``."""
        d = self._dir()
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".{key}.json.tmp")
        with open(tmp, "w") as f:
            json.dump({"key": key, "value": value, "ts": time.time()}, f)
        os.replace(tmp, os.path.join(d, f"{key}.json"))

    def wait(
        self,
        key: str,
        timeout: Optional[float] = None,
        poll: float = 0.05,
    ):
        """Block until the signal resolves for ``key``; returns the sent
        value. Raises :class:`TestTimeout` past the deadline. The
        default deadline is the owning case's ``test_timeout`` knob —
        this is what makes ``@lc.case(test_timeout=...)`` effective for
        wait-based cases (an explicit ``timeout=`` still overrides)."""
        if timeout is None:
            timeout = (
                self.case.test_timeout if self.case is not None else 30.0
            )
        path = os.path.join(self._dir(), f"{key}.json")
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            if os.path.exists(path):
                with open(path) as f:
                    return json.load(f)["value"]
            time.sleep(poll)
        raise TestTimeout(
            f"signal {self.name!r} for test {key!r} not resolved "
            f"within {timeout}s"
        )


@dataclass
class _CaseState:
    status: str = "INIT"  # INIT/PASS/FAIL/ERROR/TIMEOUT/STALL
    last_test_received: Optional[float] = None
    # registration time: the stall clock starts HERE for a case that
    # has never run (reference case.py measures from timer start, not
    # from epoch — a just-registered case must get the full
    # warn_stalled_after grace, not an instant STALL)
    registered_at: float = field(default_factory=time.time)
    consecutive_failures: int = 0
    total_failures: int = 0
    runs: int = 0
    # live-traffic ticks SEEN (run or skipped) — the probability draw
    # hashes this, so it advances every tick; hashing `runs` would
    # freeze the draw after the first skip
    ticks: int = 0
    last_error: Optional[str] = None


class Case:
    """A LiveCheck test case (reference ``case.py:Case``).

    Subclass, declare :class:`Signal` class attributes, implement
    ``run(test)``; optionally ``make_fake_request()`` to inject the
    canary (called before ``run`` on scheduled executions). Class-level
    knobs mirror the reference: ``active``, ``probability`` (chance of
    running against a live-traffic tick), ``warn_stalled_after``
    (seconds without any test → STALL), ``max_consecutive_failures``.
    """

    name: str = ""
    active: bool = True
    probability: float = 0.5
    warn_stalled_after: float = 1800.0
    max_consecutive_failures: int = 30
    test_timeout: float = 30.0

    def __init__(self, app: "LiveCheck") -> None:
        self.app = app
        if not self.name:
            self.name = type(self).__name__
        # bind class-level signals to this instance
        for attr in dir(type(self)):
            v = getattr(type(self), attr, None)
            if isinstance(v, Signal):
                setattr(self, attr, v._bind(self))

    # -- overridables --------------------------------------------------
    def make_fake_request(self, test: TestExecution) -> None:
        """Inject the canary for ``test`` into the pipeline (reference
        ``case.py:make_fake_request``). Default: nothing — the case is
        then only meaningful under ``on_test_received``-style wiring."""

    def run(self, test: TestExecution) -> None:  # pragma: no cover
        """The assertions. Raise (or let ``Signal.wait`` time out) to
        fail."""
        raise NotImplementedError


class LiveCheck:
    """Registry + executor for :class:`Case` (reference ``app.py:73``).

    ``state_dir`` holds signal events and should live next to the
    pipeline checkpoints (same durability domain).
    """

    def __init__(self, name: str, state_dir: str) -> None:
        import re

        if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", state_dir):
            raise ValueError(
                f"state_dir {state_dir!r} has a URI scheme: signal "
                "transport uses ordinary file I/O (driver-local "
                "rendezvous — see module docstring). Use a local or "
                "mounted path; for cluster-wide reconciliation use "
                "evaluate_executions / streaming.livecheck_audit over "
                "signal logs instead."
            )
        self.name = name
        self.state_dir = state_dir
        self.cases: Dict[str, Case] = {}
        self._state: Dict[str, _CaseState] = {}

    def case(
        self,
        *,
        name: Optional[str] = None,
        probability: Optional[float] = None,
        warn_stalled_after: Optional[float] = None,
        max_consecutive_failures: Optional[int] = None,
        test_timeout: Optional[float] = None,
    ) -> Callable[[Type[Case]], Case]:
        """Class decorator registering a case (reference
        ``app.py:208-271``); returns the INSTANCE, as the reference
        does."""

        def deco(cls: Type[Case]) -> Case:
            if name:
                cls.name = name
            if probability is not None:
                cls.probability = probability
            if warn_stalled_after is not None:
                cls.warn_stalled_after = warn_stalled_after
            if max_consecutive_failures is not None:
                cls.max_consecutive_failures = max_consecutive_failures
            if test_timeout is not None:
                cls.test_timeout = test_timeout
            inst = cls(self)
            self.cases[inst.name] = inst
            self._state[inst.name] = _CaseState()
            return inst

        return deco

    # -- execution -----------------------------------------------------
    def run_case(self, case: Case) -> str:
        """Execute one case now (fake request + run + bookkeeping).
        Returns the resulting status. Raises :class:`SuiteFailed` when
        the consecutive-failure budget is exhausted."""
        st = self._state[case.name]
        test = TestExecution.new(case.name)
        st.runs += 1
        st.last_test_received = time.time()
        try:
            case.make_fake_request(test)
            case.run(test)
        except TestTimeout as e:
            self._record_failure(case, st, "TIMEOUT", e)
        except Exception as e:  # noqa: BLE001 — any assertion = FAIL
            self._record_failure(case, st, "FAIL", e)
        else:
            st.status = "PASS"
            st.consecutive_failures = 0
            st.last_error = None
        return st.status

    def _record_failure(
        self, case: Case, st: _CaseState, status: str, err: Exception
    ) -> None:
        st.status = status
        st.consecutive_failures += 1
        st.total_failures += 1
        st.last_error = f"{type(err).__name__}: {err}"
        if st.consecutive_failures >= case.max_consecutive_failures:
            raise SuiteFailed(
                f"case {case.name!r}: {st.consecutive_failures} "
                f"consecutive failures (last: {st.last_error})"
            )

    def run_once(self, live_traffic: bool = False) -> Dict[str, str]:
        """Drive every active case once (reference ``_execute_tests``).

        ``live_traffic=True`` applies the per-case ``probability`` gate
        using a DETERMINISTIC hash of (case name, run count) — no RNG,
        reproducible schedules (md5-derived like every other
        deterministic draw in this repo)."""
        import hashlib

        results: Dict[str, str] = {}
        for case in self.cases.values():
            if not case.active:
                continue
            if live_traffic:
                st = self._state[case.name]
                tick = st.ticks
                st.ticks += 1
                h = hashlib.md5(
                    f"{case.name}:{tick}".encode()
                ).digest()
                if (int.from_bytes(h[:6], "big") / float(1 << 48)
                        >= case.probability):
                    continue
            results[case.name] = self.run_case(case)
        self._update_stalled()
        return results

    def _update_stalled(self) -> None:
        now = time.time()
        for case in self.cases.values():
            st = self._state[case.name]
            # never-run cases measure the stall clock from registration
            # — full warn_stalled_after grace, not an instant STALL
            last = st.last_test_received or st.registered_at
            if now - last > case.warn_stalled_after:
                if st.status in ("INIT", "PASS"):
                    st.status = "STALL"

    # -- reporting -----------------------------------------------------
    def report_rows(self) -> List[tuple]:
        return [
            (
                n,
                s.status,
                s.runs,
                s.total_failures,
                s.consecutive_failures,
                s.last_error,
            )
            for n, s in sorted(self._state.items())
        ]

    def report_df(self, spark):
        """Suite state as a DataFrame (feed ``Table.show`` /
        ``@app.page`` — the reference posts TestReport models to a
        reports topic, ``app.py:380-385``)."""
        from faust_spark.operators.mat import local_rows

        return local_rows(
            spark,
            self.report_rows(),
            "case string, status string, runs long, total_failures long, "
            "consecutive_failures long, last_error string",
        )

# ---------------------------------------------------------------------
# Batch audit: the scale path
# ---------------------------------------------------------------------
#
# The driver-loop runner above is the reference-parity CONTROL PLANE:
# one canary at a time, wall-clock waits (reference runners.py:77-108,
# one asyncio task per in-flight test). At 100 TB the interesting
# question flips from "does one canary pass right now" to "did EVERY
# tracked order of the last N hours see all its signals in time" —
# millions of executions, which no polling loop can audit. That is a
# set-reconciliation JOIN, so it is expressed declaratively below and
# Catalyst gets to pick the physical plan:
#
#   executions  (test_id, case_name, ts, expires)   — TestExecution log
#   signals     (test_id, case_name, signal_name, ts) — SignalEvent log
#   case_specs  (case_name, signal_name, sig_index) — declaration order
#
# Shuffle budget: case_specs is model-sized (cases x signals) and is
# broadcast; signals pre-aggregate to first-arrival per
# (test_id, case_name, signal_name) with map-side partial aggs, then
# ONE hash shuffle on (test_id, case_name) shared by the group-by and
# the executions join (AQE coalesces the co-partitioned sides). No
# window functions, no per-row Python.


def case_specs_df(spark, cases):
    """Expected-signal table for :func:`evaluate_executions` from
    registered :class:`Case` instances — declaration order of the
    ``Signal`` class attributes is the await order of ``run()``
    (reference case.py binds signals in class-body order)."""
    rows = []
    for case in cases:
        # walk the MRO base-first so signals INHERITED from a shared
        # base Case keep their position before the subclass's own
        # (vars() alone reads only the leaf class dict and would
        # undercount n_expected); an override re-declares the name in
        # place — first occurrence wins the index
        names: list[str] = []
        for klass in reversed(type(case).__mro__):
            for attr, v in vars(klass).items():
                if isinstance(v, Signal) and attr not in names:
                    names.append(attr)
        for idx, attr in enumerate(names):
            v = getattr(case, attr)  # the instance-bound signal
            rows.append((case.name, v.name, idx))
    from faust_spark.operators.mat import local_rows

    # local_rows (guide §4): LocalTableScan, no Python re-eval per action
    return local_rows(
        spark, rows, "case_name string, signal_name string, sig_index int"
    )


def evaluate_executions(
    executions,
    signals,
    case_specs,
    as_of=None,
    require_order: bool = False,
):
    """Audit every tracked execution against the resolved-signal log.

    Verdict per execution, mirroring the runner state machine
    (reference runners.py:77-108 + signals.py:120-143):

    - a signal counts iff it resolved by the execution's ``expires``
      deadline (``Signal.wait`` past the deadline raises TestTimeout →
      State.TIMEOUT); duplicate resolutions keep the FIRST arrival
      (``wait`` returns as soon as the key is present);
    - ``PASS``    — every expected signal of the case resolved in time;
    - ``TIMEOUT`` — at least one expected signal missing or late, and
      the deadline has passed (relative to ``as_of``);
    - ``INIT``    — incomplete but ``expires`` is still in the future
      at ``as_of`` (audit ran before the deadline — still pending);
    - ``FAIL``    — only with ``require_order=True``: all signals in
      time but arrival order contradicts declaration order. The
      reference runner itself tolerates early arrivals (an
      already-resolved ``wait`` returns immediately); order assertions
      live in ``run()`` bodies, so ordering is opt-in here.

    ``runtime_secs`` is last-in-time-signal minus execution timestamp
    (runner.runtime analogue) for complete executions, else NULL.
    Executions whose ``case_name`` has no row in ``case_specs`` are
    dropped (unregistered case — the reference ignores traffic for
    cases it doesn't know). Returns (test_id, case_name, state,
    n_expected, n_seen, runtime_secs).
    """
    from pyspark.sql import functions as F

    if as_of is None:
        raise ValueError("pass as_of (audit horizon) explicitly")
    as_of = F.lit(as_of).cast("timestamp")

    n_expected = case_specs.groupBy("case_name").agg(
        F.count("*").alias("n_expected")
    )

    # first arrival per expected signal; unknown signal names drop out
    # (the reference ignores SignalEvents for unregistered signals)
    first_sig = (
        signals.join(
            F.broadcast(case_specs), ["case_name", "signal_name"]
        )
        .groupBy("test_id", "case_name", "signal_name", "sig_index")
        .agg(F.min("ts").alias("sig_ts"))
    )
    per_test = first_sig.groupBy("test_id", "case_name").agg(
        F.sort_array(
            F.collect_list(F.struct("sig_index", "sig_ts"))
        ).alias("sigs")
    )

    e = (
        executions.join(per_test, ["test_id", "case_name"], "left")
        .join(F.broadcast(n_expected), "case_name")
        .withColumn(
            "in_time",
            F.coalesce(
                F.filter(
                    "sigs", lambda s: s["sig_ts"] <= F.col("expires")
                ),
                F.array().cast(
                    "array<struct<sig_index:int,sig_ts:timestamp>>"
                ),
            ),
        )
        .withColumn("n_seen", F.size("in_time"))
        .withColumn("complete", F.col("n_seen") == F.col("n_expected"))
    )
    if require_order:
        # sigs is sorted by sig_index; monotone sig_ts == arrival order
        # matches declaration order
        order_ok = F.aggregate(
            F.expr(
                "zip_with(slice(in_time, 1, size(in_time) - 1),"
                "         slice(in_time, 2, size(in_time) - 1),"
                "         (a, b) -> a.sig_ts <= b.sig_ts)"
            ),
            F.lit(True),
            lambda acc, x: acc & x,
        )
        state = (
            F.when(F.col("complete") & order_ok, "PASS")
            .when(F.col("complete"), "FAIL")
            .when(F.col("expires") <= as_of, "TIMEOUT")
            .otherwise("INIT")
        )
    else:
        state = (
            F.when(F.col("complete"), "PASS")
            .when(F.col("expires") <= as_of, "TIMEOUT")
            .otherwise("INIT")
        )
    return e.select(
        "test_id",
        "case_name",
        state.alias("state"),
        "n_expected",
        "n_seen",
        # exact integer-microsecond difference, ONE correctly-rounded
        # division — bit-identical across engines (casting each
        # timestamp to double first would round twice at epoch
        # magnitude, where a double is down to ~0.1 µs of precision)
        F.when(
            F.col("complete"),
            (
                F.unix_micros(
                    F.array_max(
                        F.transform("in_time", lambda s: s["sig_ts"])
                    )
                )
                - F.unix_micros("ts")
            )
            / F.lit(1000000.0),
        ).alias("runtime_secs"),
    )


def signal_latencies(executions, signals, case_specs):
    """Per-signal latency rows (reference TestReport.signal_latency,
    models.py:141): first arrival of each expected signal minus the
    execution timestamp, late arrivals included (latency > TTL is
    exactly what you want on the dashboard). Returns (test_id,
    case_name, signal_name, sig_index, latency_secs). Same one-shuffle
    shape as :func:`evaluate_executions`."""
    from pyspark.sql import functions as F

    first_sig = (
        signals.join(
            F.broadcast(case_specs), ["case_name", "signal_name"]
        )
        .groupBy("test_id", "case_name", "signal_name", "sig_index")
        .agg(F.min("ts").alias("sig_ts"))
    )
    return first_sig.join(
        executions.select("test_id", "case_name", "ts"),
        ["test_id", "case_name"],
    ).select(
        "test_id",
        "case_name",
        "signal_name",
        "sig_index",
        # exact µs difference, one rounding (see evaluate_executions)
        (
            (F.unix_micros("sig_ts") - F.unix_micros("ts"))
            / F.lit(1000000.0)
        ).alias("latency_secs"),
    )


def case_stats(reports, warn_stalled_after: float = 1800.0):
    """Suite-level health rollup over an audited-reports log — the
    batch analogue of the reference Case state machine's counters
    (``case.py``: ``total_by_state``, ``consecutive_failures``,
    ``warn_stalled_after`` stall detection, runtime history).

    ``reports`` carries one decided row per execution with its
    execution timestamp: (test_id, case_name, state, ts,
    runtime_secs) — the :func:`evaluate_executions` output joined back
    to the execution log's ``ts``. Per case:

    - verdict counts (``n_pass``/``n_fail``/``n_timeout``/``n_total``)
      and exact ``pass_rate`` (decimal division, one cast to double);
    - ``consecutive_failures`` = the trailing run of non-PASS verdicts
      in execution-time order (the reference's counter at
      suite-evaluation time; a PASS resets it, case.py:305-310);
    - ``max_gap_secs`` = the largest gap between consecutive
      executions (exact integer-µs difference, one division) and
      ``stalled`` = that gap exceeded ``warn_stalled_after``
      (case.py:337-358's SuiteStalled, evaluated over the log);
    - runtime rollup over complete executions: min/max and a
      DECIMAL(18,6)-accumulated sum (runtimes are exact multiples of
      1 µs, so the decimal cast is lossless).

    One shuffle on case_name (the window and the final group-by share
    it); ties in execution time order deterministically by test_id.
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    w = W.partitionBy("case_name").orderBy("ts", "test_id")
    r = reports.select(
        "case_name",
        "test_id",
        "state",
        "ts",
        "runtime_secs",
    ).withColumn(
        "gap_secs",
        (
            F.unix_micros("ts")
            - F.unix_micros(F.lag("ts").over(w))
        )
        / F.lit(1000000.0),
    )
    # trailing non-PASS run = rows strictly after the case's last PASS
    # (no PASS at all → every row); the last-PASS position comes from an
    # unordered window max over the same case partition (shares the one
    # case_name shuffle with the final group-by)
    wpc = W.partitionBy("case_name")
    r = r.withColumn(
        "__last_pass",
        F.max(
            F.when(
                F.col("state") == "PASS", F.struct("ts", "test_id")
            )
        ).over(wpc),
    )
    return r.groupBy("case_name").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(F.col("state") == "PASS", 1)).alias("n_pass"),
        F.count(F.when(F.col("state") == "FAIL", 1)).alias("n_fail"),
        F.count(F.when(F.col("state") == "TIMEOUT", 1)).alias(
            "n_timeout"
        ),
        # exact integer operands, ONE correctly-rounded double division
        # (decimal division would hit engine-specific scale rules)
        (
            F.count(F.when(F.col("state") == "PASS", 1)).cast("double")
            / F.count(F.lit(1))
        ).alias("pass_rate"),
        F.count(
            F.when(
                F.col("__last_pass").isNull()
                | (F.struct("ts", "test_id") > F.col("__last_pass")),
                1,
            )
        ).alias("consecutive_failures"),
        F.max("gap_secs").alias("max_gap_secs"),
        (F.max("gap_secs") > F.lit(warn_stalled_after)).alias(
            "stalled"
        ),
        F.min("runtime_secs").alias("min_runtime"),
        F.max("runtime_secs").alias("max_runtime"),
        F.sum(F.col("runtime_secs").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_runtime"),
    )
