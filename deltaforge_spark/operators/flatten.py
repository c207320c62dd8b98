"""Flatten processor: nested structs in before/after → ``parent__child``
leaf columns.

Re-expresses the reference's flatten processor
(reference: crates/processors/src/flatten.rs:29-203; config
crates/deltaforge-config/src/flatten_cfg.rs:6-115). Policy knobs:

- ``max_depth``: objects at the boundary are kept as leaves.
- lists: ``preserve`` (keep array as a leaf) | ``index`` (expand
  ``tags__0``, ``tags__1`` … up to the static array size when known —
  for typed arrays Spark can't know element count statically, so
  ``index`` expands up to ``index_limit`` positions; missing → null).
- collisions (two paths flattening to the same name): ``last`` wins |
  ``first`` wins | ``error``.

Where the reference walks dynamic JSON per event, we walk the *schema*
once at plan time and emit a single ``select`` — zero per-row Python,
whole-stage codegen applies, and column pruning still reaches the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _flatten_fields(
    dtype: T.StructType,
    prefix: str,
    path: str,
    depth: int,
    max_depth: int,
    sep: str,
    list_policy: str,
    index_limit: int,
) -> list[tuple[str, Column]]:
    out: list[tuple[str, Column]] = []
    for f in dtype.fields:
        name = f"{prefix}{sep}{f.name}" if prefix else f.name
        col_path = f"{path}.{f.name}"
        if isinstance(f.dataType, T.StructType) and depth < max_depth:
            out.extend(
                _flatten_fields(
                    f.dataType, name, col_path, depth + 1, max_depth, sep, list_policy, index_limit
                )
            )
        elif isinstance(f.dataType, T.ArrayType) and list_policy == "index":
            for i in range(index_limit):
                # F.get is null-safe out of range (getItem throws under ANSI)
                out.append((f"{name}{sep}{i}", F.get(F.col(col_path), i)))
        else:
            out.append((name, F.col(col_path)))
    return out


def flatten_struct_cols(
    df: DataFrame,
    *,
    cols: tuple[str, ...] = ("before", "after"),
    sep: str = "__",
    max_depth: int = 32,
    list_policy: str = "preserve",
    index_limit: int = 4,
    collision: str = "error",
) -> DataFrame:
    """Flatten the named struct columns in place; other columns pass
    through unchanged. Returns one flat column per leaf, named
    ``<col>__<nested>__<path>``."""
    assert list_policy in ("preserve", "index")
    assert collision in ("first", "last", "error")
    selected: list[Column] = []
    seen: dict[str, int] = {}

    def add(name: str, col: Column):
        if name in seen:
            if collision == "error":
                raise ValueError(f"flatten collision on column {name!r}")
            if collision == "first":
                return
            selected[seen[name]] = col.alias(name)
            return
        seen[name] = len(selected)
        selected.append(col.alias(name))

    for f in df.schema.fields:
        if f.name in cols and isinstance(f.dataType, T.StructType):
            for name, col in _flatten_fields(
                f.dataType, f.name, f.name, 1, max_depth, sep, list_policy, index_limit
            ):
                add(name, col)
        else:
            add(f.name, F.col(f.name))
    return df.select(*selected)


def flatten_events(df: DataFrame, **kw) -> DataFrame:
    """The processor form: flatten before/after payload structs of a
    change-event DataFrame (reference flatten.rs applies to row images)."""
    return flatten_struct_cols(df, cols=("before", "after"), **kw)
