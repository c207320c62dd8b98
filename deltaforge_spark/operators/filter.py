"""Filter processor: op gate, table gate, field predicates.

Re-expresses the reference's filter processor
(reference: crates/processors/src/filter.rs:86-317; config
crates/deltaforge-config/src/filter_cfg.rs:27-156) as a predicate-AST →
``Column`` compiler. Because the output is a plain Catalyst expression,
predicate pushdown / reordering / codegen are free — the reference
hand-orders op → table → field checks (filter.rs:229-243); Catalyst does
that automatically.

Semantics matched to the reference:
- ops gate: keep events whose ``op`` is in the allowed set.
- table gate: include/exclude glob patterns over ``db.table`` with
  ``*`` / ``%`` wildcards (common/src/patterns.rs:47-263).
- field predicates over dot-paths into ``after`` (or ``before.x`` /
  ``source.x`` / top-level ``$.x`` prefixes):
  ``eq ne exists not_exists gt gte lt lte in not_in contains changed
  regex``; ``match: all|any``.
- numeric ``eq`` compares as double (``42 == 42.0``, filter.rs:148).
- ``changed`` compares before vs after at the path; create/delete events
  pass unconditionally (filter.rs:181-199).
- field predicates only gate c/u/r events' payloads; delete events are
  evaluated against ``before`` when ``after`` is null (matches the
  reference's row-image selection).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUMERIC = (int, float)


@dataclass
class FilterSpec:
    """Declarative filter config (mirrors filter_cfg.rs vocabulary)."""

    ops: list[str] | None = None  # e.g. ["c", "u"]
    include_tables: list[str] | None = None  # glob patterns "db.table"
    exclude_tables: list[str] | None = None
    fields: list[dict] = field(default_factory=list)
    # each: {"field": "after.total", "op": "gte", "value": 100}
    match: str = "all"  # all | any


def _glob_to_like(pattern: str) -> str:
    """``*`` / ``%`` glob → SQL LIKE pattern (escape LIKE specials)."""
    out = []
    for ch in pattern:
        if ch in ("*", "%"):
            out.append("%")
        elif ch == "_":
            out.append(r"\_")
        else:
            out.append(ch)
    return "".join(out)


def _path_col(df: DataFrame, path: str) -> Column:
    """Resolve a dot-path. Bare paths root at ``after`` (falling back to
    ``before`` for delete events); explicit ``before.`` / ``after.`` /
    ``source.`` / ``$.`` prefixes address other roots."""
    if path.startswith("$."):
        return F.col(path[2:])
    if path.split(".", 1)[0] in ("before", "after", "source", "transaction", "routing"):
        return F.col(path)
    cols = set(df.columns)
    if "after" in cols and "before" in cols:
        return F.coalesce(F.col(f"after.{path}"), F.col(f"before.{path}"))
    if "after" in cols:
        return F.col(f"after.{path}")
    return F.col(path)


def _compile_field_pred(df: DataFrame, spec: dict) -> Column:
    path, op = spec["field"], spec["op"]
    value = spec.get("value")
    c = _path_col(df, path)

    if op == "exists":
        return c.isNotNull()
    if op == "not_exists":
        return c.isNull()
    if op == "eq":
        if isinstance(value, _NUMERIC) and not isinstance(value, bool):
            # numeric equality via double, reference filter.rs:148
            return c.cast("double") == F.lit(float(value))
        return c == F.lit(value)
    if op == "ne":
        if isinstance(value, _NUMERIC) and not isinstance(value, bool):
            return c.cast("double") != F.lit(float(value))
        return c != F.lit(value)
    if op in ("gt", "gte", "lt", "lte"):
        cc = c.cast("double") if isinstance(value, _NUMERIC) else c
        v = F.lit(float(value)) if isinstance(value, _NUMERIC) else F.lit(value)
        return {"gt": cc > v, "gte": cc >= v, "lt": cc < v, "lte": cc <= v}[op]
    if op == "in":
        return c.isin(list(value))
    if op == "not_in":
        return ~c.isin(list(value))
    if op == "contains":
        # string containment or array membership, matching filter.rs:167-176
        return F.when(c.isNotNull(), c.cast("string").contains(str(value))).otherwise(F.lit(False))
    if op == "regex":
        return c.rlike(value)
    if op == "changed":
        # create/delete pass unconditionally (filter.rs:181-188).
        # Strip an explicit before./after. root so a caller passing
        # "after.x" doesn't resolve to "before.after.x".
        from .toast import is_unchanged_marker

        root = path.split(".", 1)[1] if path.split(".", 1)[0] in ("before", "after") and "." in path else path
        b, a = F.col(f"before.{root}"), F.col(f"after.{root}")
        differs = ~(b.eqNullSafe(a))
        # TOAST partial images: an elided after-value ({"_unchanged":true},
        # postgres_object.rs:94) was omitted precisely because it did NOT
        # change — `changed` must never fire on the marker
        if spec.get("toast_aware", True):
            differs = F.when(
                is_unchanged_marker(a.cast("string")), F.lit(False)
            ).otherwise(differs)
        return F.when(F.col("op").isin("c", "d", "r", "t"), F.lit(True)).otherwise(differs)
    raise ValueError(f"unknown filter op {op!r}")


def compile_filter(df: DataFrame, spec: FilterSpec) -> Column:
    preds: list[Column] = []
    if spec.ops:
        preds.append(F.col("op").isin(list(spec.ops)))
    full_table = F.concat_ws(".", F.col("source.db"), F.col("source.table"))
    if spec.include_tables:
        inc = None
        for p in spec.include_tables:
            c = full_table.like(_glob_to_like(p))
            inc = c if inc is None else (inc | c)
        preds.append(inc)
    if spec.exclude_tables:
        for p in spec.exclude_tables:
            preds.append(~full_table.like(_glob_to_like(p)))
    if spec.fields:
        fps = [_compile_field_pred(df, f) for f in spec.fields]
        combined = fps[0]
        for p in fps[1:]:
            combined = (combined | p) if spec.match == "any" else (combined & p)
        # null predicate result (missing field) = no match, like the reference
        preds.append(F.coalesce(combined, F.lit(False)))
    if not preds:
        return F.lit(True)
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def apply_filter(df: DataFrame, spec: FilterSpec) -> DataFrame:
    return df.filter(compile_filter(df, spec))
