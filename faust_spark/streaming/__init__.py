"""Structured Streaming layer: sources, stateful ops, run helpers.

The reference's entire worker/recovery/changelog machinery (SURVEY §3.1-3.2)
collapses into Structured Streaming primitives here: checkpointing replaces
the changelog topic + RocksDB replay, watermarks replace the cleanup timer,
and append-mode emission replaces ``on_window_close`` callbacks.
"""

from faust_spark.streaming.runner import run_to_memory  # noqa: F401
from faust_spark.streaming.state import stateful_counter  # noqa: F401
