"""Codec helpers + polymorphic decode (reference serializer surface)."""

import decimal

from pyspark.sql import functions as F

from faust_spark import Record
from faust_spark.functions import (
    b64decode,
    b64encode,
    decimal_str,
    iso8601_parse,
)


class Add(Record):
    op: str
    amount: float


class Remove(Record):
    op: str
    reason: str


def test_base64_roundtrip(spark):
    out = (
        spark.createDataFrame([(b"hello \x00 world",)], ["b"])
        .select(b64decode(b64encode("b")).alias("rt"))
        .collect()
    )
    assert bytes(out[0].rt) == b"hello \x00 world"


def test_iso8601_and_decimal(spark):
    row = (
        spark.createDataFrame(
            [("2024-03-01T12:30:00", "1.500000000000000001")], ["t", "d"]
        )
        .select(
            iso8601_parse("t").alias("ts"),
            decimal_str("d").alias("dec"),
        )
        .collect()[0]
    )
    assert row.ts.hour == 12
    assert row.dec == decimal.Decimal("1.500000000000000001")


def test_polymorphic_decode_routes_by_discriminator(spark):
    df = spark.createDataFrame(
        [
            ('{"__type": "add", "op": "a", "amount": 5.0}',),
            ('{"__type": "remove", "op": "r", "reason": "dup"}',),
        ],
        ["value"],
    )
    out = [
        r.asDict()
        for r in Record.decode_polymorphic(
            df, {"add": Add, "remove": Remove}
        ).collect()
    ]
    by_ns = {r["__ns"]: r for r in out}
    assert by_ns["add"]["__rec_add"].amount == 5.0
    assert by_ns["add"]["__rec_remove"] is None
    assert by_ns["remove"]["__rec_remove"].reason == "dup"
