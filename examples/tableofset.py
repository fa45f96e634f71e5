"""Table-of-sets: who is currently in each group, maintained from
join/leave streams — the reference's ``examples/tableofset.py``
(``app.SetTable('people')`` with one agent adding on ``people_joining2``
and one discarding on ``people_leaving2``), re-expressed Spark-first.

faust mutates ``table[key].add/discard(name)`` per event; the Spark
SetTable is the same state expressed declaratively — ``collect_set`` per
key on each side, then set difference. The difference/intersection
column algebra mirrors the reference SetTable operations
(``faust/tables/sets.py``).

Run::

    python examples/tableofset.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from faust_spark import App  # noqa: E402
from faust_spark.tables import SetTable  # noqa: E402


def build(spark=None, workdir: str | None = None):
    app = App("table-of-sets-windowed", spark=spark)
    workdir = workdir or tempfile.mkdtemp(prefix="tableofset_")
    joining = app.topic(
        "people_joining2", path=os.path.join(workdir, "joining")
    )
    leaving = app.topic(
        "people_leaving2", path=os.path.join(workdir, "leaving")
    )

    def members(app_) -> "F.DataFrame":
        """Current membership per group: joined minus left."""
        tbl = app_.SetTable("people")
        joined = tbl.collect(
            app_.stream(joining).group_by("key"), "name", alias="joined"
        )
        left = tbl.collect(
            app_.stream(leaving).group_by("key"), "name", alias="left"
        )
        return (
            joined.join(left, "key", "left")
            .select(
                "key",
                F.array_sort(
                    SetTable.difference(
                        F.col("joined"),
                        F.coalesce(F.col("left"), F.array()),
                    )
                ).alias("members"),
            )
        )

    return app, joining, leaving, members


if __name__ == "__main__":
    app, joining, leaving, members = build()
    spark = app.spark
    joining.write_batch(
        spark.createDataFrame(
            [("devs", "alice"), ("devs", "bob"), ("ops", "carol")],
            "key string, name string",
        )
    )
    leaving.write_batch(
        spark.createDataFrame([("devs", "bob")], "key string, name string")
    )
    for row in members(app).orderBy("key").collect():
        print(f"{row.key}: {sorted(row.members)}")
