"""``Record`` → ``StructType`` schema compiler.

The reference's typed model layer (``faust/models/record.py:62-95``,
type-expression compiler ``faust/models/typing.py``) turns annotated Python
classes into codegen'd serializers. Here the same declaration compiles to a
Spark ``StructType`` plus ``from_json`` / ``to_json`` expressions — Catalyst
then owns (de)serialization, which is the Spark-native equivalent of faust's
generated ``__init__``/``asdict``.

Type mapping (SURVEY.md §1.3):
bool→Boolean, int→Long, float→Double, Decimal→Decimal(38,18), str→String,
bytes→Binary, datetime→Timestamp, date→Date, nested Record→Struct,
List/Tuple/Set→Array, Dict/Mapping→Map, Optional[X]→nullable.
"""

from __future__ import annotations

import datetime
import decimal
import typing
from typing import (
    Annotated,
    Any,
    Callable,
    Mapping,
    Optional,
    Sequence,
    get_args,
    get_origin,
    get_type_hints,
)

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_SCALARS: dict[type, DataType] = {
    bool: BooleanType(),
    int: LongType(),
    float: DoubleType(),
    str: StringType(),
    bytes: BinaryType(),
    datetime.datetime: TimestampType(),
    datetime.date: DateType(),
    decimal.Decimal: DecimalType(38, 18),
}

_MISSING = object()


def _compile_type(tp: Any) -> tuple[DataType, bool, frozenset]:
    """Compile one annotation → (spark type, nullable, tag names).

    Tags (``Secret[str]`` = ``Annotated[str, Secret]``) surface from the
    top level of the annotation and through ``Optional[...]``; a nested
    tagged ``Record`` marks the outer field with its aggregate tags
    (reference: ``add_related_to_tagged_indices``,
    faust/models/record.py:224-243).
    """
    import types as _types

    from faust_spark.tags import Tag

    origin = get_origin(tp)
    if origin is Annotated:
        inner, null, tags = _compile_type(get_args(tp)[0])
        extra = {
            m.tag_name
            for m in get_args(tp)[1:]
            if isinstance(m, type) and issubclass(m, Tag)
        }
        return inner, null, tags | frozenset(extra)
    if origin is typing.Union or origin is getattr(_types, "UnionType", object()):
        args = [a for a in get_args(tp) if a is not type(None)]
        nullable = len(args) != len(get_args(tp))
        if len(args) != 1:
            raise TypeError(f"unsupported union: {tp}")
        inner, inner_null, tags = _compile_type(args[0])
        return inner, nullable or inner_null, tags
    if origin in (list, tuple, set, frozenset):
        args = get_args(tp) or (str,)
        elem, elem_null, _ = _compile_type(args[0])
        return ArrayType(elem, containsNull=elem_null), False, frozenset()
    if origin in (dict, Mapping) or origin is typing.Mapping:
        args = get_args(tp) or (str, str)
        kt, _, _ = _compile_type(args[0])
        vt, v_null, _ = _compile_type(args[1])
        return MapType(kt, vt, valueContainsNull=v_null), False, frozenset()
    if isinstance(tp, type) and issubclass(tp, Record):
        nested_tags = frozenset().union(
            *tp.tagged_fields().values()
        ) if tp.tagged_fields() else frozenset()
        return tp.spark_schema(), False, nested_tags
    if tp in _SCALARS:
        return _SCALARS[tp], False, frozenset()
    raise TypeError(f"unsupported field type: {tp!r}")


class ValidationError(Exception):
    """A per-field constraint violation (reference
    ``faust/exceptions.py`` ValidationError carrying its field,
    ``faust/models/fields.py:282-283`` ``validation_error``)."""

    def __init__(self, reason: str, field: Optional[str] = None):
        super().__init__(reason)
        self.reason = reason
        self.field = field

    def __repr__(self) -> str:
        return f"<ValidationError field={self.field!r}: {self.reason}>"


class Field:
    """Declarative per-field constraints, assigned as the annotation's
    default (reference: ``NumberField(min_value=..., max_value=...)``,
    ``DecimalField(max_digits=..., max_decimal_places=...)`` —
    ``faust/models/fields.py:330-430``)::

        class Order(Record):
            amount: float = Field(min_value=0.0)
            code: str = Field(pattern=r"[A-Z]{3}", choices=None)
            note: Optional[str] = Field(default=None)

    Constraints validate Python-side through ``instance.validate()`` and
    compile to Catalyst predicates through ``Model.validation_checks()``
    (the distributed path — feed to ``functions.validate_split``).
    """

    def __init__(
        self,
        default: Any = _MISSING,
        *,
        min_value: Any = None,
        max_value: Any = None,
        max_digits: Optional[int] = None,
        max_decimal_places: Optional[int] = None,
        pattern: Optional[str] = None,
        choices: Optional[Sequence] = None,
        validator: Optional[Callable[[Any], Optional[str]]] = None,
    ):
        self.default = default
        self.min_value = min_value
        self.max_value = max_value
        self.max_digits = max_digits
        self.max_decimal_places = max_decimal_places
        self.pattern = pattern
        self.choices = list(choices) if choices is not None else None
        self.validator = validator


class FieldDescriptor:
    """Descriptor for a Record field; usable as a grouping key reference.

    Mirrors the reference's field-descriptor idiom
    (``stream.group_by(Withdrawal.user)``): at class level, attribute access
    returns the descriptor, whose ``col()`` yields the Spark Column.
    """

    def __init__(
        self,
        name: str,
        dtype: DataType,
        nullable: bool,
        default: Any,
        tags: frozenset = frozenset(),
        spec: Optional[Field] = None,
    ):
        self.name = name
        self.dtype = dtype
        self.nullable = nullable
        self.default = default
        self.tags = tags
        self.spec = spec

    def col(self) -> Column:
        return F.col(self.name)

    # --- per-field validation (reference faust/models/fields.py:249-430) --
    def validate(self, value: Any) -> "list[ValidationError]":
        """Python-side constraint check for one value; mirrors the
        reference's ``FieldDescriptor.validate`` generator surface."""
        errs: list[ValidationError] = []

        def err(reason: str) -> None:
            errs.append(ValidationError(reason, field=self.name))

        if value is None:
            if not self.nullable:
                err(f"{self.name} is required")
            return errs
        s = self.spec
        if s is None:
            return errs
        if s.min_value is not None and value < s.min_value:
            err(f"{self.name} must be at least {s.min_value}")
        if s.max_value is not None and value > s.max_value:
            err(f"{self.name} cannot be more than {s.max_value}")
        if s.pattern is not None:
            import re as _re

            if not _re.fullmatch(s.pattern, str(value)):
                err(f"{self.name} does not match pattern {s.pattern!r}")
        if s.choices is not None and value not in s.choices:
            err(f"{self.name} must be one of {s.choices}")
        if s.max_decimal_places is not None or s.max_digits is not None:
            import decimal as _dec

            try:
                t = _dec.Decimal(str(value)).as_tuple()
            except _dec.InvalidOperation:
                t = None
            if t is not None:
                if (
                    s.max_decimal_places is not None
                    and t.exponent < -s.max_decimal_places
                ):
                    err(
                        f"{self.name} must have at most "
                        f"{s.max_decimal_places} decimal places"
                    )
                if (
                    s.max_digits is not None
                    and len(t.digits) + min(t.exponent, 0) > s.max_digits
                ):
                    err(
                        f"{self.name} must have at most {s.max_digits} "
                        "integral digits"
                    )
        if s.validator is not None:
            reason = s.validator(value)
            if reason:
                err(reason)
        return errs

    def validation_check(self) -> "Optional[tuple[str, Column]]":
        """The same constraints as ONE Catalyst predicate (codegen, no
        UDF) — ``None`` when the field has nothing to check.  Custom
        ``validator`` callables are Python-only and intentionally NOT
        compiled (no row-at-a-time Python in the distributed path)."""
        c = F.col(self.name)
        preds: list[Column] = []
        if not self.nullable:
            preds.append(c.isNotNull())
        s = self.spec
        if s is not None:
            nn = []  # constraints below only apply to non-null values
            if s.min_value is not None:
                nn.append(c >= F.lit(s.min_value))
            if s.max_value is not None:
                nn.append(c <= F.lit(s.max_value))
            if s.pattern is not None:
                nn.append(c.cast("string").rlike(f"^(?:{s.pattern})$"))
            if s.choices is not None:
                nn.append(c.isin(*s.choices))
            if s.max_decimal_places is not None:
                nn.append(
                    F.round(c, s.max_decimal_places).cast("double")
                    == c.cast("double")
                )
            if s.max_digits is not None:
                nn.append(
                    F.abs(c.cast("double")) < F.lit(10.0**s.max_digits)
                )
            for p in nn:
                preds.append(c.isNull() | p)
        if not preds:
            return None
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        return (self.name, out)

    def __repr__(self) -> str:
        return f"<field {self.name}: {self.dtype.simpleString()}>"


class Record:
    """Typed schema declaration compiled once to a ``StructType``.

    Example::

        class Withdrawal(Record):
            user: str
            country: str
            amount: float
            date: datetime.datetime

        Withdrawal.spark_schema()   # StructType(...)
        Withdrawal.from_json(col)   # Column parsing a JSON string
    """

    _schema_cache: typing.ClassVar[Optional[StructType]] = None
    #: name → class for every Record subclass ever defined — the model
    #: registry behind the ``models`` CLI subcommand (reference:
    #: ``faust models`` lists/prints registered models). Latest
    #: definition wins on name collision.
    _registry: typing.ClassVar[dict] = {}

    def __init_subclass__(cls, **kw: Any) -> None:
        super().__init_subclass__(**kw)
        cls._schema_cache = None
        Record._registry[cls.__name__] = cls
        # attach descriptors for field references at class level;
        # include_extras keeps Annotated metadata (field tags) visible
        hints = {}
        try:
            hints = get_type_hints(cls, include_extras=True)
        except Exception:
            pass
        order: list[str] = []
        for name, tp in hints.items():
            if name.startswith("_"):
                continue
            dtype, nullable, tags = _compile_type(tp)
            default = getattr(cls, name, _MISSING)
            spec: Optional[Field] = None
            if isinstance(default, Field):  # constraint spec as default
                spec = default
                default = spec.default
            elif isinstance(default, FieldDescriptor):  # inherited descriptor
                spec = default.spec
                default = default.default
            if default is not _MISSING:
                nullable = True
            setattr(
                cls,
                name,
                FieldDescriptor(name, dtype, nullable, default, tags, spec),
            )
            order.append(name)
        cls._field_order = order

    def __init__(self, **kwargs: Any) -> None:
        schema = type(self).spark_schema()
        for f in schema.fields:
            desc = getattr(type(self), f.name)
            if f.name in kwargs:
                v = kwargs.pop(f.name)
            elif isinstance(desc, FieldDescriptor) and desc.default is not _MISSING:
                v = desc.default
            elif f.nullable:
                v = None
            else:
                raise TypeError(f"missing required field {f.name!r}")
            object.__setattr__(self, f.name, v)
        if kwargs:
            raise TypeError(f"unknown fields: {sorted(kwargs)}")

    @classmethod
    def fields(cls) -> dict[str, FieldDescriptor]:
        cls.spark_schema()
        return {
            f.name: getattr(cls, f.name) for f in cls.spark_schema().fields
        }

    @classmethod
    def spark_schema(cls) -> StructType:
        if cls._schema_cache is None:
            struct_fields = []
            for name in getattr(cls, "_field_order", ()):
                desc = getattr(cls, name)
                if isinstance(desc, FieldDescriptor):
                    meta = {"tags": sorted(desc.tags)} if desc.tags else {}
                    struct_fields.append(
                        StructField(
                            desc.name, desc.dtype, desc.nullable, metadata=meta
                        )
                    )
            cls._schema_cache = StructType(struct_fields)
        return cls._schema_cache

    # --- field tags (reference: faust/models/record.py:206-243) -----------
    @classmethod
    def tagged_fields(cls) -> dict[str, frozenset]:
        """field → tag names, for fields carrying any tag."""
        return {
            name: desc.tags
            for name, desc in cls.fields().items()
            if desc.tags
        }

    @classmethod
    def secret_fields(cls) -> set[str]:
        return {n for n, t in cls.tagged_fields().items() if "secret" in t}

    @classmethod
    def sensitive_fields(cls) -> set[str]:
        return {n for n, t in cls.tagged_fields().items() if "sensitive" in t}

    @classmethod
    def personal_fields(cls) -> set[str]:
        return {n for n, t in cls.tagged_fields().items() if "personal" in t}

    @classmethod
    def has_tagged_fields(cls) -> bool:
        return bool(cls.tagged_fields())

    @classmethod
    def masked(cls, df, policy: str = "drop"):
        """Render-safe view of ``df`` under this model's tag policy.

        ``Secret`` columns always render as the mask string (the
        reference's transparent-mask behavior). Opaque columns
        (``Sensitive``/``Personal``) follow ``policy``: ``"drop"``
        (default — they are not renderable at all in the reference, where
        string use raises SecurityError) or ``"mask"``.
        """
        from faust_spark.tags import Secret, Tag

        if policy not in ("drop", "mask"):
            raise ValueError(f"unknown mask policy {policy!r}")
        secret, opaque = cls.secret_fields(), (
            cls.sensitive_fields() | cls.personal_fields()
        )
        cols = []
        for c in df.columns:
            if c in secret:
                cols.append(F.lit(Secret.mask).alias(c))
            elif c in opaque:
                if policy == "mask":
                    cols.append(F.lit(Tag.mask).alias(c))
                # drop: omit the column entirely
            else:
                cols.append(F.col(c))
        return df.select(*cols)

    def asdict(self) -> dict[str, Any]:
        return {
            f.name: getattr(self, f.name)
            for f in type(self).spark_schema().fields
        }

    # --- per-field validation (reference faust/models/base.py:440-459) ----
    def validate(self) -> "list[ValidationError]":
        """Every field-constraint violation on this instance (cached on
        first call, like the reference's ``__validation_errors__``)."""
        cached = getattr(self, "__validation_errors__", None)
        if cached is None:
            cached = [
                e
                for name, desc in type(self).fields().items()
                for e in desc.validate(getattr(self, name))
            ]
            object.__setattr__(self, "__validation_errors__", cached)
        return cached

    def is_valid(self) -> bool:
        return not self.validate()

    def validate_or_raise(self) -> None:
        errors = self.validate()
        if errors:
            raise errors[0]

    @property
    def validation_errors(self) -> "list[ValidationError]":
        return self.validate()

    @classmethod
    def validation_checks(cls) -> "list[tuple[str, Column]]":
        """Per-field constraints compiled to named Catalyst predicates —
        the distributed validation path.  Feed straight into
        :func:`faust_spark.functions.validate_split`::

            valid, invalid = validate_split(df, *Order.validation_checks())

        One codegen scan for the whole battery; ``invalid`` rows carry
        the violated field names.  (Python ``validator`` callables are
        deliberately not compiled — no per-row Python at 100 TB.)"""
        out = []
        for desc in cls.fields().values():
            chk = desc.validation_check()
            if chk is not None:
                out.append(chk)
        return out

    # --- Catalyst (de)serialization ---------------------------------------
    @classmethod
    def from_json(cls, col: Column | str) -> Column:
        """Parse a JSON string column into a struct of this schema."""
        return F.from_json(col, cls.spark_schema())

    @classmethod
    def to_json(cls, col: Column | str) -> Column:
        return F.to_json(col)

    @classmethod
    def decode_polymorphic(
        cls,
        df,
        subtypes: "dict[str, type[Record]]",
        value_col: str = "value",
        ns_path: str = "$.__type",
    ):
        """Blessed-key-style polymorphic decode (reference behavior:
        serialized payloads carry a namespace key selecting the concrete
        Record subclass, faust/models/base.py:154-206).

        Catalyst has no dynamic dispatch, so the discriminator becomes an
        explicit column and each subtype parses into its own struct column
        (``when/otherwise`` on the discriminator); downstream code routes
        on ``__ns``. Documented semantic difference: the union of subtype
        schemas is materialized, not a dynamic type.
        """
        out = df.withColumn(
            "__ns", F.get_json_object(F.col(value_col).cast("string"), ns_path)
        )
        for ns, sub in subtypes.items():
            out = out.withColumn(
                f"__rec_{ns}",
                F.when(
                    F.col("__ns") == ns, sub.from_json(F.col(value_col).cast("string"))
                ),
            )
        return out

    @classmethod
    def decode(cls, df, value_col: str = "value", flatten: bool = True):
        """Decode a (Kafka-style) DataFrame's JSON value column.

        Returns the DataFrame with the parsed struct flattened into top-level
        columns (one shared decode before fan-out — the analogue of the
        reference conductor's single shared deserialization,
        ``faust/transport/consumer.py:29-30``).
        """
        parsed = df.withColumn("__rec", cls.from_json(F.col(value_col).cast("string")))
        if not flatten:
            return parsed
        keep = [c for c in df.columns if c != value_col]
        return parsed.select(*keep, "__rec.*")


__all__ = ["Record", "FieldDescriptor", "Field", "ValidationError"]
