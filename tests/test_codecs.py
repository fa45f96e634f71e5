"""Codec helpers + polymorphic decode (reference serializer surface)."""

import decimal

import pytest

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


def test_validate_split_side_output(spark):
    from pyspark.sql import functions as F

    from faust_spark.functions import validate_split

    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, -5.0, "b"), (3, 200.0, None)],
        "id long, amount double, tag string",
    )
    valid, invalid = validate_split(
        df,
        ("amount_nonneg", F.col("amount") >= 0),
        ("amount_max", F.col("amount") <= 100),
        ("tag_present", F.col("tag").isNotNull()),
    )
    assert [r.id for r in valid.collect()] == [1]
    bad = {r.id: sorted(r.failed_checks) for r in invalid.collect()}
    assert bad == {2: ["amount_nonneg"], 3: ["amount_max", "tag_present"]}


def test_apply_in_pandas_udaf(spark):
    """Batch pandas UDAF surface (§2.9): per-group arbitrary pandas
    computation via groupBy().applyInPandas."""
    import pandas as pd

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0)], "k string, v double"
    )

    def spread(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            [{"k": pdf["k"].iloc[0], "spread": float(pdf.v.max() - pdf.v.min())}]
        )

    out = {
        r.k: r.spread
        for r in df.groupBy("k")
        .applyInPandas(spread, "k string, spread double")
        .collect()
    }
    assert out == {"a": 2.0, "b": 0.0}


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


def test_pickle_codec_shim_roundtrip(spark):
    """pickle → json Arrow shim → typed Record columns (reference pickle
    codec, faust/serializers/codecs.py:254-268)."""
    import pickle

    from faust_spark.functions import pickle_decode
    from faust_spark.models import Record

    class Evt(Record):
        user: str
        amount: float

    payloads = [
        (1, pickle.dumps({"user": "alice", "amount": 2.5})),
        (2, pickle.dumps({"user": "bob", "amount": 1.0})),
        (3, None),
    ]
    df = spark.createDataFrame(payloads, "offset long, value binary")
    out = {r.offset: r for r in pickle_decode(df, "value", Evt).collect()}
    assert out[1].user == "alice" and out[1].amount == 2.5
    assert out[2].user == "bob"
    assert out[3].user is None  # null payload → null fields


def test_yaml_codec_shim(spark):
    """yaml → json shim, gated on PyYAML availability."""
    pytest.importorskip("yaml")
    from faust_spark.functions import yaml_to_json

    df = spark.createDataFrame(
        [("user: alice\namount: 2.5",), (None,)], "value string"
    )
    rows = df.select(yaml_to_json("value").alias("j")).collect()
    import json as _json

    assert _json.loads(rows[0].j) == {"user": "alice", "amount": 2.5}
    assert rows[1].j is None


def test_pii_counts_and_redaction(spark):
    """PII audit + redaction stay in codegen and catch the classic kinds."""
    from faust_spark.functions import pii_counts, redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@corp.example.com or call +1 (415) 555-0199"),
            (2, "ssn 123-45-6789 from host 10.0.0.7"),
            (3, "card 4111 1111 1111 1111 paid"),
            (4, "nothing sensitive here"),
        ],
        "id int, text string",
    )
    out = df.select(
        "id",
        pii_counts("text").alias("pii"),
        redact_pii("text").alias("clean"),
    )
    rows = {r.id: r for r in out.collect()}
    assert rows[1].pii.email == 1 and rows[1].pii.phone == 1
    assert rows[2].pii.ssn == 1 and rows[2].pii.ipv4 == 1
    assert rows[3].pii.credit_card == 1
    assert all(v == 0 for v in rows[4].pii.asDict().values())
    assert "[email]" in rows[1].clean and "@" not in rows[1].clean
    assert "[ssn]" in rows[2].clean and "6789" not in rows[2].clean
    assert "[credit_card]" in rows[3].clean and "4111" not in rows[3].clean
    assert rows[4].clean == "nothing sensitive here"
    # no Python in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_normalize_text_folds_and_strips(spark):
    """Smart quotes/dashes fold to ASCII; zero-width + control chars drop;
    whitespace collapses; lowercase is opt-in."""
    from faust_spark.functions import normalize_text

    raw = "  ‘Hi’—there friend… \x07ok​  "
    df = spark.createDataFrame([(raw,)], ["t"])
    got = df.select(
        normalize_text("t").alias("n"),
        normalize_text("t", lowercase=True).alias("l"),
    ).first()
    assert got.n == "'Hi'-there friend... ok"
    assert got.l == "'hi'-there friend... ok"
    # null-safe
    df2 = spark.createDataFrame([(None,)], "t string")
    assert df2.select(normalize_text("t").alias("n")).first().n is None
