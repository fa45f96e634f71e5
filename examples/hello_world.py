"""Hello-world: a greetings topic, an agent consuming it, a timer
producing into it — the reference's first-contact example
(``/root/reference/examples/hello_world.py``: ``app.topic('greetings')``
+ printing agent + ``@app.timer(5)`` producer), re-expressed Spark-first.

The faust timer is an asyncio coroutine firing every N seconds; here the
timer IS the micro-batch cadence — ``app.timer(5)`` returns the
``processingTime`` trigger kwargs a streaming writer would use, and the
produce step is a batch write into the topic path the agent reads.

Run::

    python examples/hello_world.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from faust_spark import App  # noqa: E402


def build(spark=None, workdir: str | None = None):
    app = App("hello-world", spark=spark)
    workdir = workdir or tempfile.mkdtemp(prefix="hello_world_")
    greetings = app.topic("greetings", path=os.path.join(workdir, "greetings"))

    @app.agent("print_greetings")
    def print_greetings(app_, df):
        # the reference agent prints each greeting; the engine-side
        # equivalent is a pass-through projection — the caller decides
        # whether to print, sink, or assert
        return df.select("value")

    def produce(n: int = 100) -> None:
        # reference: @app.timer(5) sending 100 greetings per tick; the
        # trigger kwargs app.timer(5) returns drive the same cadence on
        # a streaming writer
        batch = app.spark.range(n).select(
            F.concat(F.lit("hello "), F.col("id")).alias("value")
        )
        greetings.write_batch(batch)

    return app, greetings, print_greetings, produce


if __name__ == "__main__":
    app, greetings, agent, produce = build()
    produce(100)
    out = agent(greetings.batch_df())
    print(f"trigger cadence: {App.timer(5)}")
    for row in out.limit(5).collect():
        print(row.value)
    print(f"... {out.count()} greetings total")
