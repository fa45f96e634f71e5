"""Celery-like task queue — the reference's ``examples/task_queue.py``
(a ``Request(id, name, arguments, keyword_arguments)`` record sent to a
topic, a task registry mapping names to callables, an agent executing
each request), re-expressed Spark-first.

The reference's ``@task`` decorator registers a coroutine and ``.delay``
sends a Request into the queue topic; here the registry maps task names
to COLUMN-level functions and the agent applies them per-row in one
declarative pass — no per-row Python in the hot path. ``Agent.map``
plays the ask/reply contract (replies in send order,
``faust/agents/agent.py:740-961`` analogue).

Run::

    python examples/task_queue.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from faust_spark import App  # noqa: E402
from faust_spark.models import Record  # noqa: E402


class Request(Record):
    """How tasks serialize onto the queue topic (reference Request)."""

    id: str
    name: str
    arg: float


#: name -> Column fn: the task registry (reference task_registry), but
#: each task is a vectorized column expression, not a coroutine
TASKS = {
    "add": lambda c: c + F.lit(1.0),
    "square": lambda c: c * c,
    "negate": lambda c: -c,
}


def build(spark=None, workdir: str | None = None):
    app = App("task-queue", spark=spark)
    workdir = workdir or tempfile.mkdtemp(prefix="task_queue_")
    requests = app.topic(
        "task-requests", value_type=Request,
        path=os.path.join(workdir, "requests"),
    )

    @app.agent("process_task")
    def process_task(app_, df):
        # one CASE expression dispatches the whole registry — every
        # queued task executes in a single declarative pass
        result = F.lit(None).cast("double")
        for name, fn in TASKS.items():
            result = F.when(F.col("name") == name, fn(F.col("arg"))).otherwise(
                result
            )
        return df.withColumn("result", result)

    def delay(name: str, arg: float) -> str:
        """Reference ``task.delay(...)``: enqueue one Request."""
        if name not in TASKS:
            raise KeyError(f"unknown task {name!r}")
        rid = str(uuid.uuid4())
        requests.write_batch(
            app.spark.createDataFrame(
                [(rid, name, float(arg))], Request.spark_schema()
            )
        )
        return rid

    return app, requests, process_task, delay


if __name__ == "__main__":
    app, requests, agent, delay = build()
    for name, arg in (("add", 41.0), ("square", 12.0), ("negate", 7.5)):
        delay(name, arg)
    out = agent(requests.batch_df())
    for row in out.orderBy("name").collect():
        print(f"{row.name}({row.arg}) = {row.result}")
