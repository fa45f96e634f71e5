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

from faust_spark import Record


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
