"""Source type-mapping edge rules.

The reference's type system is source-owned (SURVEY.md §1.2); Spark has
1:1 equivalents for everything except four deliberate edge rules, which
are re-expressed here (reference: crates/deltaforge-core/src/encoding/
arrow_types.rs tests :425-480; crates/sources/src/mysql/mysql_object.rs):

- **decimal-as-string on the wire** (mysql_object.rs:33): precision is
  preserved in JSON by stringifying; parsing back targets DecimalType.
- **decimal(p>38) → string** (arrow_types.rs:323): beyond Decimal128.
- **unsigned bigint → string by default** (arrow_types.rs:435-455):
  u64 max overflows signed 64-bit; opt-in to LongType when the column
  is known to stay below 2^63.
- **binary → {"_base64": ...}** (mysql_object.rs:42-46): JSON-safe
  wrapper, round-tripped by ``base64_wrap`` / ``base64_unwrap``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DECIMAL128_MAX_PRECISION = 38
U64_SIGNED_MAX = 9223372036854775807  # 2^63 - 1


def decimal_wire_string(c: Column, scale: int) -> Column:
    """Decimal → wire string with fixed scale (precision-preserving)."""
    return c.cast(f"decimal(38,{scale})").cast("string")


def parse_wire_decimal(c: Column, precision: int, scale: int) -> Column:
    """Wire string → DecimalType(p,s), falling back to the string
    itself when p > 38 (the reference's Decimal128 boundary)."""
    if precision > DECIMAL128_MAX_PRECISION:
        return c.cast("string")
    return c.cast(f"decimal({precision},{scale})")


def unsigned_bigint_column(c: Column, *, as_long: bool = False) -> Column:
    """Unsigned-bigint rule: default STRING (u64 can exceed int64);
    ``as_long`` opts into LongType with a guard that nulls (rather than
    corrupts) values above 2^63-1."""
    if not as_long:
        return c.cast("decimal(20,0)").cast("string")
    dec = c.cast("decimal(20,0)")
    return F.when(dec <= F.lit(U64_SIGNED_MAX).cast("decimal(20,0)"), dec.cast("long"))


def base64_unwrap(json_str: Column) -> Column:
    """Inverse of functions.base64_wrap: {"_base64": "..."} → binary."""
    return F.unbase64(F.get_json_object(json_str, "$._base64"))


# --------------------------------------------------- MySQL JSON column decode


def _json_string_literal(c: Column) -> Column:
    """A string value as a JSON string literal with full escaping:
    to_json of a 1-element array, brackets stripped."""
    arr = F.to_json(F.array(c))
    return F.substring(arr, 2, F.length(arr) - F.lit(2))


def is_valid_json(c: Column) -> Column:
    """True when the string parses as JSON (any value type)."""
    return F.try_parse_json(c).isNotNull() | (F.trim(c) == "null")


def mysql_json_decode(c: Column) -> Column:
    """The reference's JSON-column decode fallback chain
    (mysql_object.rs:54-72 ``handle_json``) over a textual wire value —
    the binary-JSONB parse happened upstream (the Kafka/Debezium front
    hands us text; SURVEY §7.2 boundary):

    - parses as JSON → keep the document as-is,
    - plain text that isn't JSON → a JSON *string* value of it
      (``serde_json::from_str(s).unwrap_or(json!(s))``),
    - NULL → NULL.

    Output is always valid JSON text, so downstream flatten/sensing can
    consume it unconditionally.
    """
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(is_valid_json(c), c).otherwise(_json_string_literal(c))
    )


def mysql_json_decode_binary(c: Column) -> Column:
    """Binary JSON wire value: valid UTF-8 → the textual chain above;
    undecodable bytes → ``{"_base64_json": ...}`` (mysql_object.rs:70-72
    last-resort wrap). The binary→string cast reinterprets bytes without
    validating; ``is_valid_utf8`` then gates the textual path (``decode``
    would throw MALFORMED_CHARACTER_CODING on bad bytes)."""
    txt = c.cast("string")
    valid_utf8 = F.is_valid_utf8(txt)
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(valid_utf8, mysql_json_decode(txt)).otherwise(
            F.to_json(F.struct(F.base64(c).alias("_base64_json")))
        )
    )
