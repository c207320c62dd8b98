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
