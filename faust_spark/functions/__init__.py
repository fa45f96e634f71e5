"""Codec/scalar helpers mirroring the reference's serializer registry.

The reference ships ``{json, pickle, yaml, binary (base64), raw}`` codecs
with ``A | B`` chaining (``faust/serializers/codecs.py:191-317``). The
Spark-native subset: json via ``from_json``/``to_json`` (on the Record
class), base64 binary here, raw = no-op. pickle/yaml are deliberately out
of scope (arbitrary Python object payloads don't belong in a columnar
engine; a pandas-UDF shim is possible if ever needed).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def b64encode(col: Column | str) -> Column:
    """bytes → base64 text (reference 'binary' codec dumps)."""
    return F.base64(F.col(col) if isinstance(col, str) else col)


def b64decode(col: Column | str) -> Column:
    """base64 text → bytes (reference 'binary' codec loads)."""
    return F.unbase64(F.col(col) if isinstance(col, str) else col)


def iso8601_parse(col: Column | str) -> Column:
    """ISO-8601 text → timestamp (reference DatetimeField, isodates=True)."""
    return F.to_timestamp(col)


def decimal_str(col: Column | str, precision: int = 38, scale: int = 18) -> Column:
    """String-serialized Decimal → DecimalType (reference DecimalField:
    Decimals travel as strings to preserve precision)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def decimal_to_str(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("string")


def validate_split(df, *checks: "tuple[str, Column]"):
    """Validation with an error side-output (reference ValidationError →
    CHECK-filter + error sink, SURVEY §2.7).

    ``checks`` are (name, predicate) pairs; returns (valid_df,
    invalid_df) where invalid rows carry a ``failed_checks`` array naming
    every violated predicate. Both outputs derive from one scan — Catalyst
    shares the upstream plan."""
    from pyspark.sql import functions as FF

    failed = FF.filter(
        FF.array(
            *[FF.when(~pred, FF.lit(name)) for name, pred in checks]
        ),
        lambda x: x.isNotNull(),
    )
    tagged = df.withColumn("failed_checks", failed)
    valid = tagged.filter(FF.size("failed_checks") == 0).drop("failed_checks")
    invalid = tagged.filter(FF.size("failed_checks") > 0)
    return valid, invalid


__all__ = [
    "b64encode",
    "b64decode",
    "iso8601_parse",
    "decimal_str",
    "decimal_to_str",
    "validate_split",
]
