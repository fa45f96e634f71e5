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

    def onQueryTerminated(self, event) -> None:
        pass

    def onQueryIdle(self, event) -> None:
        pass


__all__ = ["Monitor", "QueryStats"]
