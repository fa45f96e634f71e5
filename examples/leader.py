"""Leader election — the reference's ``examples/leader.py``
(``@app.timer(2.0, on_leader=True)`` publishing greetings only on the
elected leader, every worker's agent consuming them), re-expressed
Spark-first.

faust elects a leader among workers via a leader topic; on Spark the
driver IS the coordinator, so ``on_leader`` hooks always run exactly
once per app (the documented divergence at ``App.task``). The timer
cadence maps to trigger kwargs as in ``hello_world.py``.

Run::

    python examples/leader.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from faust_spark import App  # noqa: E402


def build(spark=None, workdir: str | None = None):
    app = App("leader-example", spark=spark)
    workdir = workdir or tempfile.mkdtemp(prefix="leader_")
    greetings = app.topic("greetings", path=os.path.join(workdir, "greetings"))
    published: list[str] = []

    @app.task(on_leader=True)
    def publish_greetings(app_) -> str:
        # deterministic stand-in for the reference's random payload —
        # the POINT is the leader-only execution, not the value
        batch = app_.spark.range(1).select(
            F.concat(F.lit("leader says "), F.col("id")).alias("value")
        )
        greetings.write_batch(batch)
        published.append("published")
        return "PUBLISHING ON LEADER!"

    @app.agent("say")
    def say(app_, df):
        return df.select("value")

    return app, greetings, say, published


if __name__ == "__main__":
    app, greetings, say, published = build()
    app.start()  # runs the on_leader task exactly once
    print(f"leader publishes: {published}")
    print(f"timer cadence: {App.timer(2.0)}")
    for row in say(greetings.batch_df()).collect():
        print(row.value)
