"""LiveCheck: end-to-end production monitoring of an order pipeline —
the reference's ``examples/livecheck.py`` (an orders app whose
``test_order`` case sends a fake order through the REAL pipeline and
awaits ``order_sent_to_db`` / ``order_sent_to_kafka`` signals in order),
re-expressed Spark-first.

Same contract as ``faust/livecheck``: cases declare Signals in await
order, ``make_fake_request`` injects a canary that rides the production
code path, each stage resolves its signal, and the case PASSes only if
every signal arrives within ``test_timeout``. The streaming-scale twin
(signals as relations, verdicts via ``applyInPandasWithState``) is the
``stream_livecheck_audit`` gate.

Run::

    python examples/livecheck_orders.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from faust_spark import App  # noqa: E402
from faust_spark.livecheck import Case, LiveCheck, Signal  # noqa: E402
from faust_spark.models import Record  # noqa: E402


class Order(Record):
    id: str
    user_id: str
    side: str
    quantity: float
    price: float


def build(spark=None, workdir: str | None = None):
    app = App("orders", spark=spark)
    workdir = workdir or tempfile.mkdtemp(prefix="livecheck_orders_")
    orders = app.topic(
        "orders", value_type=Order, path=os.path.join(workdir, "orders")
    )
    db = app.topic("execution", path=os.path.join(workdir, "execution"))
    lc = LiveCheck("orders-livecheck", os.path.join(workdir, "lc_state"))

    @app.agent("create_order")
    def create_order(app_, df):
        # the production pipeline: validate + forward to the db topic
        valid = df.filter(df.quantity > 0).filter(df.price > 0)
        db.write_batch(valid)
        return valid

    @lc.case(name="test_order", test_timeout=5.0)
    class TestOrder(Case):
        order_sent_to_db = Signal()
        order_sent_to_kafka = Signal()

        def make_fake_request(self, test):
            canary = app.spark.createDataFrame(
                [(test.id, "u-livecheck", "sell", 1.0, 30.3)],
                Order.spark_schema(),
            )
            orders.write_batch(canary)
            # the canary rides the REAL agent; each stage below
            # resolves its signal exactly as the reference pipeline does
            all_orders = orders.batch_df()
            out = create_order(all_orders.filter(all_orders.id == test.id))
            n = out.count()
            if n == 1:
                self.order_sent_to_db.send(test.id, {"rows": n})
                self.order_sent_to_kafka.send(test.id, {"rows": n})

        def run(self, test):
            assert self.order_sent_to_db.wait(test.id, timeout=5.0)[
                "rows"
            ] == 1
            assert self.order_sent_to_kafka.wait(test.id, timeout=5.0)[
                "rows"
            ] == 1

    return app, lc, TestOrder, orders, db


if __name__ == "__main__":
    app, lc, case, orders, db = build()
    print(f"test_order: {lc.run_case(case)}")
    for name, state in ((r[0], r[1]) for r in lc.report_rows()):
        print(f"  {name}: {state}")
