"""Field tags: ``Secret`` / ``Sensitive`` / ``Personal``.

Parity target: ``faust/models/tags.py`` + the tagged-field indices built by
the record compiler (``faust/models/record.py:206-243``). Semantics there:

- ``Secret[str]`` — transparent tag whose string form is a mask
  (``'***********'``).
- ``Sensitive[str]`` / ``Personal[str]`` — opaque tags: using the value as
  a string raises ``SecurityError``; only ``str``/``bytes`` payloads are
  accepted.
- The model class aggregates per-kind field indices
  (``has_secret_fields``, ``secret_fields`` …), including tags carried by
  nested models.

Spark-native mapping: a tag wraps the *type annotation*
(``password: Secret[str]``) and compiles to ``StructField`` metadata
(``{"tags": ["secret"]}``), so the classification travels with the schema
through selects, writes, and catalog round-trips. Masked rendering happens
at the DataFrame boundary (:meth:`faust_spark.models.Record.masked`):
secret columns render as the mask, opaque (sensitive/personal) columns are
dropped or masked by policy. The reference's frame-local access guard is a
Python-runtime mechanism with no analogue in a declarative plan —
column-level masking at the egress is the engine-appropriate control.
"""

from __future__ import annotations

from typing import Annotated, Any


class SecurityError(Exception):
    """Tagged value used where its policy forbids it."""


class Tag:
    """Base annotation tag. ``Tag[X]`` → ``Annotated[X, tag_class]``."""

    tag_name: str = "tagged"
    is_secret: bool = False
    is_sensitive: bool = False
    is_personal: bool = False
    #: opaque tags refuse string rendering instead of masking
    opaque: bool = False
    #: tags restricted to str/bytes payloads (reference behavior for
    #: Personal/Sensitive)
    str_bytes_only: bool = False
    mask: str = "***********"

    def __class_getitem__(cls, item: Any) -> Any:
        if cls.str_bytes_only and not (
            isinstance(item, type) and issubclass(item, (str, bytes))
        ):
            raise TypeError(
                f"{cls.__name__} only supports str/bytes not {item!r}"
            )
        return Annotated[item, cls]


class Secret(Tag):
    """Transparent tag: renders as the mask string."""

    tag_name = "secret"
    is_secret = True


class Sensitive(Tag):
    """Opaque tag: must not be rendered; str/bytes payloads only."""

    tag_name = "sensitive"
    is_sensitive = True
    opaque = True
    str_bytes_only = True


class Personal(Tag):
    """Opaque tag (PII): must not be rendered; str/bytes payloads only."""

    tag_name = "personal"
    is_personal = True
    opaque = True
    str_bytes_only = True


__all__ = ["Tag", "Secret", "Sensitive", "Personal", "SecurityError"]
