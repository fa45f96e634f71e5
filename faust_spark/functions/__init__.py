"""Codec/scalar helpers mirroring the reference's serializer registry.

The reference ships ``{json, pickle, yaml, binary (base64), raw}`` codecs
with ``A | B`` chaining (``faust/serializers/codecs.py:191-317``). The
Spark-native subset: json via ``from_json``/``to_json`` (on the Record
class), base64 binary here, raw = no-op. pickle/yaml decode through
Arrow-batched shims (:func:`pickle_to_json` / :func:`yaml_to_json`) that
normalize the payload to JSON once at ingest, after which Catalyst owns
the columns — arbitrary Python object payloads never travel further than
the decode boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


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


def pickle_to_json(col: Column | str) -> Column:
    """Pickled payload (binary) → JSON string, one Arrow batch at a time
    (reference pickle codec, ``faust/serializers/codecs.py:254-268``).

    SECURITY: ``pickle.loads`` executes code from the payload — exactly the
    reference codec's trust model. Only point this at topics you produce.
    Decode to JSON happens once at the ingest boundary; chain with
    ``Record.from_json`` for typed columns.

    (The UDF is built lazily — ``pandas_udf`` needs an active session.)
    """

    @pandas_udf("string")
    def _shim(s):
        import json
        import pickle

        return s.map(
            lambda b: None if b is None else json.dumps(pickle.loads(bytes(b)))
        )

    return _shim(F.col(col) if isinstance(col, str) else col)


def yaml_to_json(col: Column | str) -> Column:
    """YAML payload (string) → JSON string per Arrow batch (reference yaml
    codec, ``faust/serializers/codecs.py:269-280``). Gated on PyYAML being
    importable — raises a clear error otherwise."""

    @pandas_udf("string")
    def _shim(s):
        import json

        try:
            import yaml
        except ImportError as e:  # pragma: no cover - environment-dependent
            raise RuntimeError(
                "yaml codec requires PyYAML (pip install pyyaml)"
            ) from e

        return s.map(
            lambda v: None if v is None else json.dumps(yaml.safe_load(v))
        )

    return _shim(F.col(col) if isinstance(col, str) else col)


def pickle_decode(df, value_col: str, record_cls) -> "Column | object":
    """Decode a pickled-dict value column into typed top-level columns:
    pickle → json (Arrow shim) → ``Record.from_json`` → flatten."""
    parsed = df.withColumn("__json", pickle_to_json(F.col(value_col)))
    out = parsed.withColumn("__rec", record_cls.from_json(F.col("__json")))
    keep = [c for c in df.columns if c != value_col]
    return out.select(*keep, "__rec.*")


# --- PII scrubbing (training-data prep; pairs with the Secret/Sensitive/
# Personal field tags in faust_spark/tags.py) ---------------------------
# Patterns use syntax valid in both Java regex (Spark) and RE2 (DuckDB):
# no backreferences, no lookarounds.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?\d[\d\s().-]{7,14}\d",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "credit_card": r"\b(?:\d[ -]?){13,16}\b",
}


def pii_counts(col: Column | str, kinds: "tuple[str, ...] | None" = None) -> Column:
    """Struct of per-kind PII match counts — entirely in codegen
    (``regexp_count``), so a corpus-wide PII audit is one scan."""
    c = F.col(col) if isinstance(col, str) else col
    kinds = kinds or tuple(PII_PATTERNS)
    return F.struct(
        *[
            F.regexp_count(c, F.lit(PII_PATTERNS[k])).alias(k)
            for k in kinds
        ]
    )


def redact_pii(
    col: Column | str,
    kinds: "tuple[str, ...] | None" = None,
    token: str = "[{kind}]",
) -> Column:
    """Replace every PII match with a typed placeholder (``[email]``,
    ``[phone]``, ...): chained ``regexp_replace`` — one codegen stage, no
    UDF.  Kind order matters (e.g. SSN before phone) and follows
    ``PII_PATTERNS`` insertion order unless overridden."""
    c = F.col(col) if isinstance(col, str) else col
    kinds = kinds or ("email", "ssn", "credit_card", "ipv4", "phone")
    for k in kinds:
        c = F.regexp_replace(c, PII_PATTERNS[k], token.format(kind=k))
    return c


# 1:1 foldings handled by a single translate() pass (curly quotes,
# en/em dashes, NBSP); multi-char foldings (ellipsis) and zero-width
# removals take one regexp each.  All of it is one codegen stage.
_FOLD_SRC = (
    "\u2018\u2019\u201a"  # curly/low single quotes -> '
    "\u201c\u201d\u201e"  # curly/low double quotes -> "
    "\u2013\u2014"          # en/em dash -> -
    "\u00a0"                  # NBSP -> space
)
_FOLD_DST = "'''\"\"\"-- "


def normalize_text(col: Column | str, lowercase: bool = False) -> Column:
    """Corpus text normalization: fold smart quotes/dashes/NBSP to ASCII,
    drop zero-width and C0/C1 control characters, collapse whitespace
    runs, trim — the canonical cleanup pass before hashing, dedup, or
    tokenization.  Chained ``translate``/``regexp_replace`` only: one
    whole-stage-codegen pass over the scan, no UDF, deterministic on
    every engine.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.translate(c, _FOLD_SRC, _FOLD_DST)
    c = F.regexp_replace(c, "\u2026", "...")
    # zero-width space/joiners, BOM, soft hyphen
    c = F.regexp_replace(c, "[\u200b\u200c\u200d\ufeff\u00ad]", "")
    # control chars except tab/newline (folded into whitespace next)
    c = F.regexp_replace(c, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "")
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return F.lower(c) if lowercase else c


__all__ = [
    "b64encode",
    "b64decode",
    "iso8601_parse",
    "decimal_str",
    "decimal_to_str",
    "validate_split",
    "pickle_to_json",
    "yaml_to_json",
    "pickle_decode",
    "PII_PATTERNS",
    "pii_counts",
    "redact_pii",
    "normalize_text",
]
