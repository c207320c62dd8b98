"""TOAST / partial-row-image handling.

PostgreSQL logical replication omits large unchanged (TOASTed) column
values from update row images; the reference surfaces them as a
``{"_unchanged": true}`` placeholder object (reference:
crates/sources/src/postgres/postgres_object.rs:94, tested at :450-462)
and documents that downstream consumers must either pass the marker
through or merge against prior state.

Spark re-expression — three behaviors the reference's consumers need:

- ``is_unchanged_marker``: recognize the placeholder in a JSON-valued
  column (pure column predicate, no parsing of the full document).
- ``changed_with_toast``: the filter processor's ``changed`` semantics
  over partial images — a marker means NOT changed (the value was
  elided precisely because it didn't change), so ``changed`` filters
  must not fire on it.
- ``resolve_toast``: reconcile markers against the most recent real
  value per key — a windowed ``last(…, ignorenulls)`` over the ordered
  change stream. Scale shape: one shuffle on the key (the same
  partitioning the downstream upsert materialization needs, so it
  reuses the exchange), no state beyond the window frame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

UNCHANGED_JSON = '{"_unchanged":true}'


def unchanged_marker() -> Column:
    """The wire form of an elided TOAST value (postgres_object.rs:94)."""
    return F.lit(UNCHANGED_JSON)


def is_unchanged_marker(c: Column) -> Column:
    """True when a JSON-valued column holds the TOAST placeholder."""
    return F.coalesce(
        F.get_json_object(c, "$._unchanged") == F.lit("true"), F.lit(False)
    )


def changed_with_toast(before: Column, after: Column) -> Column:
    """``changed`` predicate over partial row images: an ``_unchanged``
    after-image can never count as a change (filter.rs `changed` +
    the TOAST pass-through contract)."""
    return F.when(is_unchanged_marker(after), F.lit(False)).otherwise(
        ~before.eqNullSafe(after)
    )


def resolve_toast(
    df: DataFrame,
    col: str,
    *,
    key: str,
    order: str,
    out_col: str | None = None,
) -> DataFrame:
    """Replace ``_unchanged`` markers with the most recent real value
    for the same key earlier in the stream (consumer-side merge the
    reference documents for TOASTed columns). A marker with no prior
    real value resolves to NULL (the consumer has no state to merge).

    Adds ``out_col`` (default ``{col}_resolved``) and ``{col}_toasted``.
    """
    out_col = out_col or f"{col}_resolved"
    c = F.col(col)
    marker = is_unchanged_marker(c)
    w = (
        Window.partitionBy(key)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    real = F.when(~marker, c)
    return df.withColumn(
        out_col, F.when(marker, F.last(real, ignorenulls=True).over(w)).otherwise(c)
    ).withColumn(f"{col}_toasted", marker)
