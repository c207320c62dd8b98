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
    empty_list: str = "preserve",
    empty_object: str = "preserve",
) -> list[tuple[str, Column]]:
    out: list[tuple[str, Column]] = []
    for f in dtype.fields:
        name = f"{prefix}{sep}{f.name}" if prefix else f.name
        col_path = f"{path}.{f.name}"
        if isinstance(f.dataType, T.StructType) and depth < max_depth:
            out.extend(
                _flatten_fields(
                    f.dataType, name, col_path, depth + 1, max_depth, sep,
                    list_policy, index_limit, empty_list, empty_object,
                )
            )
        elif isinstance(f.dataType, T.ArrayType) and list_policy == "index":
            for i in range(index_limit):
                # F.get is null-safe out of range (getItem throws under ANSI)
                out.append((f"{name}{sep}{i}", F.get(F.col(col_path), i)))
        elif isinstance(f.dataType, T.ArrayType) and empty_list == "null":
            # typed projection of EmptyListPolicy::Null: [] → NULL ("drop"
            # is dynamic-only — a static schema can't remove per-row keys;
            # use flatten_json for full flatten_cfg.rs policy semantics)
            c = F.col(col_path)
            out.append((name, F.when(F.size(c) > 0, c)))
        elif isinstance(f.dataType, T.MapType) and empty_object == "null":
            c = F.col(col_path)
            out.append((name, F.when(F.size(c) > 0, c)))
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
    empty_list: str = "preserve",
    empty_object: str = "preserve",
) -> DataFrame:
    """Flatten the named struct columns in place; other columns pass
    through unchanged. Returns one flat column per leaf, named
    ``<col>__<nested>__<path>``. ``empty_list``/``empty_object`` accept
    preserve|null here (typed schemas can't per-row "drop" a key — use
    flatten_json for the full dynamic policy matrix)."""
    assert list_policy in ("preserve", "index")
    assert collision in ("first", "last", "error")
    assert empty_list in ("preserve", "null")
    assert empty_object in ("preserve", "null")
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
                f.dataType, f.name, f.name, 1, max_depth, sep, list_policy,
                index_limit, empty_list, empty_object,
            ):
                add(name, col)
        else:
            add(f.name, F.col(f.name))
    return df.select(*selected)


def flatten_events(df: DataFrame, **kw) -> DataFrame:
    """The projection form: flatten before/after payload structs into
    top-level ``before__x`` columns — the Arrow-flat-envelope shape the
    reference's S3 sink writes (arrow_schema.rs:6-19)."""
    return flatten_struct_cols(df, cols=("before", "after"), **kw)


def flatten_payloads_in_place(
    df: DataFrame,
    *,
    cols: tuple[str, ...] = ("before", "after"),
    sep: str = "__",
    max_depth: int = 32,
    list_policy: str = "preserve",
    index_limit: int = 4,
    collision: str = "error",
    empty_list: str = "preserve",
    empty_object: str = "preserve",
) -> DataFrame:
    """The PROCESSOR form, matching the reference exactly: nested
    objects inside each row image flatten to ``parent__child`` keys
    while before/after stay struct columns and the envelope keeps its
    shape (flatten.rs:29-203 mutates the payload, not the event) — so
    flatten composes with any downstream processor (envelope, routing,
    outbox) in any order. A NULL image stays NULL, never a struct of
    NULLs."""
    assert collision in ("first", "last", "error")
    for c in cols:
        f = next((f for f in df.schema.fields if f.name == c), None)
        if f is None or not isinstance(f.dataType, T.StructType):
            continue
        leaves = _flatten_fields(
            f.dataType, "", c, 1, max_depth, sep, list_policy,
            index_limit, empty_list, empty_object,
        )
        picked: dict[str, Column] = {}
        for name, col in leaves:
            if name in picked:
                if collision == "error":
                    raise ValueError(f"flatten collision on {c}.{name}")
                if collision == "first":
                    continue
            picked[name] = col
        rebuilt = F.when(
            F.col(c).isNotNull(), F.struct(*[col.alias(n) for n, col in picked.items()])
        )
        df = df.withColumn(c, rebuilt)
    return df


# -------------------------------------------------------- dynamic JSON path
#
# The reference flattens dynamic serde_json payloads per event
# (flatten.rs:29-203) — keys are runtime data, so policies like "drop
# this key when the object is empty" are per-row decisions. The typed
# path above can't express that (a static schema can't remove a column
# for some rows); this path can: it walks a JSON *string* with the same
# bounded-depth ``from_json(map<string,string>)`` peeling used by schema
# sensing (nested objects survive as JSON text; arrays/scalars parse to
# NULL at the next level), applying the full policy matrix of
# flatten_cfg.rs — empty_object/empty_list preserve|drop|null, lists
# preserve|index (with recursion into indexed elements), collision
# last|first|error — all as pure column algebra: no Python in the row
# path, whole-stage codegen, one expression tree per depth level.

_M = "map<string,string>"
_A = "array<string>"


def _let(col: Column, fn) -> Column:
    """Bind ``col`` to a higher-order-function lambda variable and hand
    it to the continuation ``fn``: the value is EVALUATED ONCE (when
    the one-element array is built) no matter how many times the
    continuation references it.

    r13 optimization (guide §1.2 per-task work): ``flatten_json``
    previously inlined each depth level's expression into the next —
    every level references its predecessor at least twice (leaves +
    recursion set) and the collision filter references the full leaf
    array twice more, so both the Catalyst tree and its per-row
    runtime evaluation grew ~4^depth. A let-binding per level makes
    evaluation linear in depth; output is expression-identical."""
    return F.transform(F.array(col), fn)[0]


def flatten_json(
    json_col: Column,
    *,
    sep: str = "__",
    max_depth: int = 3,
    lists: str = "preserve",
    empty_object: str = "preserve",
    empty_list: str = "preserve",
    collision: str = "last",
) -> Column:
    """Flatten a JSON object string into a ``map<string,string>`` of
    flattened-key → JSON-text-value (reference flatten.rs semantics).
    ``to_json`` the result to get the flattened JSON document."""
    assert lists in ("preserve", "index")
    assert empty_object in ("preserve", "drop", "null")
    assert empty_list in ("preserve", "drop", "null")
    assert collision in ("last", "first", "error")

    def is_object(j: Column) -> Column:
        return F.from_json(j, _M).isNotNull()

    def is_empty_object(j: Column) -> Column:
        return is_object(j) & (F.size(F.map_keys(F.from_json(j, _M))) == 0)

    def is_list(j: Column) -> Column:
        return F.from_json(j, _A).isNotNull()

    def is_empty_list(j: Column) -> Column:
        return is_list(j) & (F.size(F.from_json(j, _A)) == 0)

    def entry(path: Column, j: Column) -> Column:
        return F.struct(path.alias("path"), j.alias("j"))

    def empty_policy_leaf(e: Column, policy: str, empty_repr: str) -> Column:
        """Leaf for an empty container per policy; NULL struct = drop."""
        if policy == "preserve":
            return entry(e["path"], F.lit(empty_repr))
        if policy == "null":
            return entry(e["path"], F.lit("null"))
        return F.lit(None).cast(
            "struct<path:string,j:string>"
        )  # drop: filtered out below

    def step(entries: Column, at_boundary: bool) -> tuple[Column, Column]:
        """One depth level → (leaves emitted here, next-level entries)."""

        def leaf_of(e: Column) -> Column:
            return (
                F.when(is_empty_object(e["j"]), empty_policy_leaf(e, empty_object, "{}"))
                .when(is_empty_list(e["j"]), empty_policy_leaf(e, empty_list, "[]"))
                .otherwise(entry(e["path"], e["j"]))
            )

        def recursable(e: Column) -> Column:
            deeper = is_object(e["j"]) & ~is_empty_object(e["j"])
            if lists == "index":
                deeper = deeper | (is_list(e["j"]) & ~is_empty_list(e["j"]))
            return F.lit(not at_boundary) & deeper

        leaves = F.transform(
            F.filter(entries, lambda e: ~recursable(e)), lambda e: leaf_of(e)
        )
        if at_boundary:
            return leaves, F.array().cast("array<struct<path:string,j:string>>")

        def children(e: Column) -> Column:
            obj_children = F.transform(
                F.coalesce(F.map_entries(F.from_json(e["j"], _M)), F.array()),
                lambda x: entry(F.concat(e["path"], F.lit(sep), x["key"]), x["value"]),
            )
            if lists != "index":
                return obj_children
            list_children = F.transform(
                F.coalesce(F.from_json(e["j"], _A), F.array()),
                lambda x, i: entry(
                    F.concat(e["path"], F.lit(sep), i.cast("string")), x
                ),
            )
            return F.when(is_object(e["j"]), obj_children).otherwise(list_children)

        nxt = F.flatten(F.transform(F.filter(entries, recursable), children))
        return leaves, nxt

    level0 = F.transform(
        F.coalesce(F.map_entries(F.from_json(json_col, _M)), F.array()),
        lambda x: entry(x["key"], x["value"]),
    )

    def finalize(all_leaves_raw: Column) -> Column:
        # drop policy produced NULL structs; remove them, then bind the
        # final leaf array once — the collision filters below reference
        # it twice per element
        def with_bound(al: Column) -> Column:
            if collision == "last":
                deduped = F.filter(
                    al,
                    lambda e, i: ~F.exists(
                        F.slice(al, i + 2, F.size(al)),
                        lambda y: y["path"] == e["path"],
                    ),
                )
            elif collision == "first":
                deduped = F.filter(
                    al,
                    lambda e, i: ~F.exists(
                        F.slice(al, F.lit(1), i),
                        lambda y: y["path"] == e["path"],
                    ),
                )
            else:
                # "error": duplicate keys make map_from_entries raise
                # DUPLICATED_MAP_KEY (Spark's default EXCEPTION dedup
                # policy) — the batch fails, as the reference's
                # CollisionPolicy::Error does.
                deduped = al
            return F.map_from_entries(deduped)

        return _let(F.filter(all_leaves_raw, lambda e: e.isNotNull()), with_bound)

    def build(d: int, entries: Column, acc: Column | None) -> Column:
        # one _let per level: leaves and the next-level entry set are
        # computed from the SAME evaluated array, not from two inlined
        # copies of the whole prefix
        leaves, nxt = step(entries, at_boundary=(d == max_depth))
        packed = F.struct(leaves.alias("leaves"), nxt.alias("nxt"))

        def cont(p: Column) -> Column:
            new_acc = p["leaves"] if acc is None else F.concat(acc, p["leaves"])
            if d == max_depth:
                return finalize(new_acc)
            return build(d + 1, p["nxt"], new_acc)

        return _let(packed, cont)

    return build(0, level0, None)
