"""Record → StructType compiler (reference behavior spec:
faust/models/record.py, faust/models/typing.py — type table SURVEY §1.3)."""

import datetime
import decimal
import typing

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DecimalType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructType,
    TimestampType,
)

from faust_spark import Personal, Record, Secret, Sensitive


class Point(Record):
    x: float
    y: float


class Everything(Record):
    flag: bool
    n: int
    amount: float
    name: str
    blob: bytes
    when: datetime.datetime
    exact: decimal.Decimal
    maybe: typing.Optional[str]
    tags: list[str]
    attrs: dict[str, float]
    nested: Point
    with_default: str = "dflt"


def test_scalar_types():
    s = Everything.spark_schema()
    assert isinstance(s["flag"].dataType, BooleanType)
    assert isinstance(s["n"].dataType, LongType)
    assert isinstance(s["amount"].dataType, DoubleType)
    assert isinstance(s["name"].dataType, StringType)
    assert isinstance(s["when"].dataType, TimestampType)
    assert isinstance(s["exact"].dataType, DecimalType)


def test_containers_and_nesting():
    s = Everything.spark_schema()
    assert isinstance(s["tags"].dataType, ArrayType)
    assert isinstance(s["attrs"].dataType, MapType)
    assert isinstance(s["nested"].dataType, StructType)
    assert s["nested"].dataType["x"].dataType == DoubleType()


def test_optional_and_default_nullability():
    s = Everything.spark_schema()
    assert s["maybe"].nullable
    assert s["with_default"].nullable
    assert not s["n"].nullable


def test_field_order_follows_annotations():
    names = [f.name for f in Everything.spark_schema().fields]
    assert names[:4] == ["flag", "n", "amount", "name"]
    assert names[-1] == "with_default"


def test_instance_defaults_and_missing():
    p = Point(x=1.0, y=2.0)
    assert p.asdict() == {"x": 1.0, "y": 2.0}
    e = Everything(
        flag=True, n=1, amount=0.5, name="a", blob=b"z",
        when=datetime.datetime(2024, 1, 1), exact=decimal.Decimal("1"),
        tags=[], attrs={}, nested=None,
    )
    assert e.with_default == "dflt"
    assert e.maybe is None
    with pytest.raises(TypeError):
        Point(x=1.0)  # y required
    with pytest.raises(TypeError):
        Point(x=1.0, y=2.0, zzz=3)


def test_from_json_roundtrip(spark):
    df = spark.createDataFrame(
        [('{"x": 1.5, "y": -2.0}',)], ["value"]
    ).select(Point.from_json("value").alias("p"))
    row = df.select("p.*").collect()[0]
    assert (row.x, row.y) == (1.5, -2.0)


def test_decode_flattens_kafka_style(spark):
    df = spark.createDataFrame(
        [(b"k1", b'{"x": 3.0, "y": 4.0}')], ["key", "value"]
    )
    out = Point.decode(df)
    assert set(out.columns) == {"key", "x", "y"}
    assert out.collect()[0].y == 4.0


def test_field_descriptor_group_by_reference():
    # class-level attribute acts as a key descriptor (faust idiom)
    assert Point.x.name == "x"
    assert Point.x.col() is not None


def test_per_field_validators_python_side():
    from typing import Optional

    from faust_spark.models import Field, Record, ValidationError

    class Order(Record):
        amount: float = Field(min_value=0.0, max_value=1000.0)
        currency: str = Field(choices=["USD", "EUR"])
        code: str = Field(pattern=r"[A-Z]{3}")
        note: Optional[str] = Field(default=None)
        price: float = Field(default=0.0, max_decimal_places=2)

    ok = Order(amount=10.0, currency="USD", code="ABC")
    assert ok.is_valid() and ok.validate() == []
    ok.validate_or_raise()  # no-op

    bad = Order(amount=-5.0, currency="GBP", code="abc", price=1.234)
    errs = bad.validate()
    fields = {e.field for e in errs}
    assert fields == {"amount", "currency", "code", "price"}
    assert bad.validation_errors == errs  # cached
    try:
        bad.validate_or_raise()
        raise AssertionError("should have raised")
    except ValidationError as e:
        assert e.field in fields

    # required (non-nullable) field set to None
    class Req(Record):
        name: str

    r = Req(name="x")
    object.__setattr__(r, "name", None)
    assert [e.field for e in r.validate()] == ["name"]


def test_per_field_validators_spark_side(spark):
    """The same constraints compile to Catalyst predicates and split a
    DataFrame in one scan via validate_split."""
    from faust_spark.functions import validate_split
    from faust_spark.models import Field, Record

    class Order2(Record):
        amount: float = Field(min_value=0.0, max_value=1000.0)
        currency: str = Field(choices=["USD", "EUR"])
        code: str = Field(pattern=r"[A-Z]{3}")

    checks = Order2.validation_checks()
    assert {name for name, _ in checks} == {"amount", "currency", "code"}
    df = spark.createDataFrame(
        [
            (10.0, "USD", "ABC"),   # valid
            (-1.0, "USD", "ABC"),   # amount
            (5.0, "GBP", "abc"),    # currency + code
            (None, "EUR", "XYZ"),   # amount null → required violation
        ],
        "amount double, currency string, code string",
    )
    valid, invalid = validate_split(df, *checks)
    assert valid.count() == 1
    bad = {
        tuple(sorted(r.failed_checks)) for r in invalid.collect()
    }
    assert bad == {("amount",), ("code", "currency")}
    # custom Python validator stays Python-only
    class WithPy(Record):
        v: int = Field(
            default=0, validator=lambda x: "odd" if x % 2 else None
        )

    assert not WithPy(v=2).validate()
    assert [e.reason for e in WithPy(v=3).validate()] == ["odd"]
    assert WithPy.validation_checks() == []  # nothing compilable


class Credentials(Record):
    user: str
    password: Secret[str]
    ssn: Sensitive[str]
    email: Personal[str]
    note: typing.Optional[str] = None


class Wrapper(Record):
    request_id: str
    creds: Credentials


def test_tag_indices_and_schema_metadata():
    """Reference faust/models/record.py:206-243: per-kind tagged-field
    indices; tags also ride in StructField metadata so they survive
    schema round-trips."""
    assert Credentials.secret_fields() == {"password"}
    assert Credentials.sensitive_fields() == {"ssn"}
    assert Credentials.personal_fields() == {"email"}
    assert Credentials.has_tagged_fields()
    schema = Credentials.spark_schema()
    assert schema["password"].metadata == {"tags": ["secret"]}
    assert schema["user"].metadata == {}
    # nested tagged model marks the outer field (add_related_to_tagged_indices)
    assert Wrapper.tagged_fields()["creds"] == frozenset(
        {"secret", "sensitive", "personal"}
    )
    assert not Wrapper.secret_fields() - {"creds"} - set()


def test_personal_rejects_non_string_payload():
    import pytest as _pytest

    from faust_spark.tags import Personal as P, Sensitive as S

    with _pytest.raises(TypeError):
        P[int]
    with _pytest.raises(TypeError):
        S[float]
    P[str], S[bytes]  # allowed


def test_masked_rendering(spark):
    df = spark.createDataFrame(
        [("alice", "hunter2", "123-45-6789", "a@example.com", None)],
        Credentials.spark_schema(),
    )
    masked = Credentials.masked(df)
    assert set(masked.columns) == {"user", "password", "note"}
    row = masked.collect()[0]
    assert row.password == "***********" and row.user == "alice"
    full = Credentials.masked(df, policy="mask").collect()[0]
    assert full.ssn == "***********" and full.email == "***********"
