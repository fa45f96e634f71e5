"""Bank-transfer demo: the reference README's flagship example shape
(a ``Withdrawal`` model consumed by an agent into a per-user table),
re-expressed Spark-first.

Reference parity: model declaration (faust README.rst model example /
``faust/models/record.py``), ``@app.agent`` + ``app.Table`` wiring.
Run-once startup hooks (``@app.task``) are exercised too.
"""

from __future__ import annotations

import datetime

from faust_spark.app import App
from faust_spark.models import Record


class Withdrawal(Record):
    user: str
    country: str
    amount: float
    date: datetime.datetime


def build_app(spark=None) -> App:
    app = App("bank", spark=spark)

    started: list[str] = []

    @app.task
    def on_startup(a: App) -> str:
        started.append(a.id)
        return f"started:{a.id}"

    @app.agent("track_user_withdrawals")
    def track(app_, df):
        # per-user running spend; the table IS the streaming aggregation
        import pyspark.sql.functions as F

        return df.groupBy("user").agg(F.sum("amount").alias("total"))

    app._bank_started = started  # test hook
    return app


if __name__ == "__main__":
    print(Withdrawal.spark_schema().simpleString())
