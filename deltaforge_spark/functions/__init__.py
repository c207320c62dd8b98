"""Scalar function surface.

The reference has no scalar library of its own (SURVEY.md §2.5) — Spark's
``pyspark.sql.functions`` is a strict superset. The handful of custom
scalars it does define are re-expressed here as column expressions:

- ``uuid7()``            — time-ordered UUID (reference lib.rs:26-67)
- ``base64_wrap(col)``   — ``{"_base64": ...}`` wrapper for non-UTF8 /
                           binary payloads (mysql_object.rs:42-46)
- ``stable_hash64(col)`` — deterministic 64-bit hash via xxhash64 (used
                           for fingerprints, salting, dedup buckets)
- ``md5_prefix_long``    — deterministic cross-engine hash: first 12 hex
                           chars of md5 as a bigint. DuckDB reproduces it
                           as ``CAST(('0x' || substr(md5(x),1,12)) AS BIGINT)``
                           — the primitive under minhash/simhash oracles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def uuid7(ts_ms: Column | None = None) -> Column:
    """RFC 9562 UUIDv7 as pure column algebra (reference lib.rs:26-67):
    48-bit unix-ms timestamp, version nibble ``7``, 12 random bits,
    variant ``10`` (nibble 8..b), 62 random bits. Sortable by creation
    time; random bits harvested from ``md5(uuid())``."""
    ts = ts_ms if ts_ms is not None else F.unix_millis(F.current_timestamp())
    ts_hex = F.lower(F.lpad(F.hex(ts), 12, "0"))
    h = F.md5(F.expr("uuid()"))  # 32 random hex chars per row
    var_nib = F.lower(
        F.hex((F.conv(F.substring(h, 20, 1), 16, 10).cast("int") % 4) + 8)
    )
    return F.concat(
        F.substring(ts_hex, 1, 8),
        F.lit("-"),
        F.substring(ts_hex, 9, 4),
        F.lit("-7"),
        F.substring(h, 1, 3),
        F.lit("-"),
        var_nib,
        F.substring(h, 4, 3),
        F.lit("-"),
        F.substring(h, 7, 12),
    )


def base64_wrap(c: Column) -> Column:
    """JSON-safe wrapper for binary values: ``{"_base64": "<b64>"}``
    (reference mysql_object.rs:42-46)."""
    return F.concat(F.lit('{"_base64": "'), F.base64(c), F.lit('"}'))


def stable_hash64(*cols: Column) -> Column:
    return F.xxhash64(*cols)


def md5_prefix_long(c: Column, seed: str = "") -> Column:
    """First 48 bits of md5(seed || value) as a non-negative bigint.

    Chosen because both Spark and DuckDB compute identical md5 hex and
    identical hex→bigint conversion, making minhash/simhash signatures
    oracle-checkable across engines. 48 bits keeps conv() exact (< 2^63).
    """
    src = F.concat(F.lit(seed), c.cast("string")) if seed else c.cast("string")
    return F.conv(F.substring(F.md5(src), 1, 12), 16, 10).cast("long")
