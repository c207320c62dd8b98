"""Schema sensing: runtime JSON shape inference over event payloads.

Re-expresses the reference's sensor (reference:
crates/schema-sensing/src/sensor.rs:146-250 per-table inference with a
structure-hash cache fast path; fingerprint.rs:23-107 structural
fingerprints; high_cardinality.rs map-vs-struct classification with
HLL + SpaceSaving sketches).

Spark mapping — all distributed, no driver loops:
- structure hash cache → a groupBy on the per-row shape fingerprint:
  identical shapes collapse before any deep inference (the scan is one
  pass; at 100 TB the shape cardinality is tiny vs row count, so the
  shuffle is negligible).
- deep inference → ``spark.read.json`` / ``schema_of_json`` over ONE
  exemplar per distinct shape, not per row.
- map-vs-struct → ``approx_count_distinct`` of keys (the HLL sketch is
  built in).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def shape_fingerprint(json_col) -> "F.Column":
    """Per-row structural fingerprint: md5 of the sorted top-level key
    list (reference fingerprint.rs structural hashing)."""
    return F.md5(F.concat_ws(",", F.array_sort(F.json_object_keys(json_col))))


def observe_shapes(df: DataFrame, json_col: str) -> DataFrame:
    """Distinct payload shapes with counts and one exemplar each —
    the structure-hash cache expressed as an aggregation."""
    c = F.col(json_col)
    return (
        df.select(shape_fingerprint(c).alias("shape_fingerprint"), c.alias("payload"))
        .groupBy("shape_fingerprint")
        .agg(F.count("*").alias("n_rows"), F.min("payload").alias("exemplar"))
    )


def infer_json_schema(spark: SparkSession, df: DataFrame, json_col: str):
    """Infer a StructType for a JSON string column from one exemplar per
    shape (cheap: |shapes| rows, not |df| rows)."""
    exemplars = [r["exemplar"] for r in observe_shapes(df, json_col).collect()]
    if not exemplars:
        return None
    return spark.read.json(spark.sparkContext.parallelize(exemplars)).schema


# ------------------------------------------------------------ deep sensing
#
# Reference fingerprint.rs:23-107 hashes the full nested key-path
# structure, and high_cardinality.rs classifies each *field path*
# map-vs-struct (not one global decision). Dynamic JSON has no static
# schema to walk, so we peel levels with ``from_json(map<string,string>)``
# — nested objects survive as JSON text at each level (verified Spark
# behavior), scalars/arrays parse to NULL and stop the recursion —
# giving a bounded-depth, pure-column-algebra walk: no Python, no UDF,
# whole-stage codegen applies, one pass over the data.

_MAP = "map<string,string>"


def _entries(json_col) -> "F.Column":
    """Top-level (path, json) entries of a JSON object string."""
    return F.transform(
        F.coalesce(F.map_entries(F.from_json(json_col, _MAP)), F.array()),
        lambda x: F.struct(x["key"].alias("path"), x["value"].alias("j")),
    )


def _child_entries(entries) -> "F.Column":
    """One level down: entries of every object-valued entry, with
    dot-prefixed paths. Non-object values yield no children."""
    return F.flatten(
        F.transform(
            entries,
            lambda p: F.transform(
                F.coalesce(F.map_entries(F.from_json(p["j"], _MAP)), F.array()),
                lambda x: F.struct(
                    F.concat_ws(".", p["path"], x["key"]).alias("path"),
                    x["value"].alias("j"),
                ),
            ),
        )
    )


def deep_key_paths(json_col, *, max_depth: int = 3) -> "F.Column":
    """All key paths (``a``, ``a.b``, ``a.b.c`` …) of a JSON object down
    to ``max_depth`` — the recursive walk of fingerprint.rs expressed as
    ``max_depth`` static column expressions."""
    level = _entries(json_col)
    all_paths = F.transform(level, lambda p: p["path"])
    for _ in range(1, max_depth):
        level = _child_entries(level)
        all_paths = F.concat(all_paths, F.transform(level, lambda p: p["path"]))
    return all_paths


def deep_shape_fingerprint(json_col, *, max_depth: int = 3) -> "F.Column":
    """Structural fingerprint over the full nested key-path set
    (fingerprint.rs:23-107): md5 of the sorted path list. Two payloads
    share a fingerprint iff their nested shapes are identical."""
    return F.md5(F.concat_ws(",", F.array_sort(deep_key_paths(json_col, max_depth=max_depth))))


def observe_deep_shapes(df: DataFrame, json_col: str, *, max_depth: int = 3) -> DataFrame:
    """Distinct nested shapes with counts + one exemplar — the deep twin
    of observe_shapes; the groupBy collapses identical shapes before any
    driver-side inference (shape cardinality ≪ row count at scale)."""
    c = F.col(json_col)
    return (
        df.select(
            deep_shape_fingerprint(c, max_depth=max_depth).alias("shape_fingerprint"),
            c.alias("payload"),
        )
        .groupBy("shape_fingerprint")
        .agg(F.count("*").alias("n_rows"), F.min("payload").alias("exemplar"))
    )


def _key_path_pairs(c, *, max_depth: int):
    """(parent_path, child_key) pairs for the root + each nested level —
    the walk both the map-vs-struct classifier and the heavy-hitter
    tracker run over."""
    level = _entries(c)
    pairs = F.transform(
        level, lambda p: F.struct(F.lit("").alias("parent_path"), p["path"].alias("child_key"))
    )
    for _ in range(1, max_depth):
        parents = level
        level = _child_entries(parents)
        pairs = F.concat(
            pairs,
            F.flatten(
                F.transform(
                    parents,
                    lambda p: F.transform(
                        F.coalesce(
                            F.map_keys(F.from_json(p["j"], _MAP)), F.array()
                        ),
                        lambda k: F.struct(
                            p["path"].alias("parent_path"), k.alias("child_key")
                        ),
                    ),
                )
            ),
        )
    return pairs


def classify_field_paths(
    df: DataFrame,
    json_col: str,
    *,
    max_depth: int = 3,
    key_cardinality_threshold: int = 16,
    exact: bool = False,
) -> DataFrame:
    """Per-field-path map-vs-struct classification
    (high_cardinality.rs:1-50): for every object-valued path (root =
    ``''``), count occurrences and distinct child keys; a path whose key
    set explodes is a MAP (user-keyed), a stable small key set is a
    STRUCT. ``exact=False`` uses approx_count_distinct — the built-in
    HLL sketch, the scale path; ``exact=True`` is for cross-engine
    comparison."""
    pairs = _key_path_pairs(F.col(json_col), max_depth=max_depth)
    exploded = df.select(F.explode(pairs).alias("pc")).select("pc.parent_path", "pc.child_key")
    n_distinct = (
        F.count_distinct(F.col("child_key"))
        if exact
        else F.approx_count_distinct("child_key")
    )
    return (
        exploded.groupBy("parent_path")
        .agg(
            F.count("*").alias("n_entries"),
            n_distinct.cast("long").alias("n_distinct_keys"),
        )
        .withColumn(
            "is_map", F.col("n_distinct_keys") > F.lit(key_cardinality_threshold)
        )
    )


def heavy_hitter_keys(
    df: DataFrame,
    json_col: str,
    *,
    max_depth: int = 3,
    capacity: int = 50,
    stable_threshold: float = 0.6,
) -> DataFrame:
    """Per-path top-``capacity`` child keys by frequency, with the
    reference's stable-field classification: a key present in at least
    ``stable_threshold`` of its parent's occurrences is *stable*
    (a schema property); the long tail below it is dynamic (map keys —
    UUIDs, user ids). Mirrors the SpaceSaving heavy-hitter tracker +
    stable_threshold rule (high_cardinality.rs:28-48, 117-157).

    SpaceSaving's bounded-memory guarantee maps onto Spark's map-side
    partial aggregation: each task keeps one counter per locally-seen
    (path, key), and only the partial counts shuffle. The window top-K
    cut bounds the output, matching the sketch's capacity semantics
    with exact counts (Spark can afford exactness here because the
    shuffle carries counts, not events).
    """
    from pyspark.sql import Window

    c = F.col(json_col)
    pairs = _key_path_pairs(c, max_depth=max_depth)
    # occurrences of each path AS AN OBJECT (the classifier's event
    # denominator: add() is called once per parent occurrence)
    occ_paths = F.when(
        F.from_json(c, _MAP).isNotNull(), F.array(F.lit(""))
    ).otherwise(F.array().cast("array<string>"))
    level = _entries(c)
    for _ in range(1, max_depth):
        obj_level = F.filter(level, lambda p: F.from_json(p["j"], _MAP).isNotNull())
        occ_paths = F.concat(occ_paths, F.transform(obj_level, lambda p: p["path"]))
        level = _child_entries(level)

    exploded = df.select(F.explode(pairs).alias("pc")).select(
        "pc.parent_path", "pc.child_key"
    )
    counts = exploded.groupBy("parent_path", "child_key").agg(F.count("*").alias("n"))
    occ = (
        df.select(F.explode(occ_paths).alias("parent_path"))
        .groupBy("parent_path")
        .agg(F.count("*").alias("n_parent_occurrences"))
    )
    w = Window.partitionBy("parent_path").orderBy(F.col("n").desc(), F.col("child_key").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= capacity)
        .join(occ, "parent_path")
        .select(
            "parent_path",
            "child_key",
            "n",
            "rank",
            F.round(F.col("n") / F.col("n_parent_occurrences"), 6).alias("support"),
            (
                F.col("n") >= F.lit(stable_threshold) * F.col("n_parent_occurrences")
            ).alias("stable"),
        )
    )


def shape_drift(before: DataFrame, after: DataFrame) -> DataFrame:
    """Shapes present in ``after`` but never observed in ``before`` —
    the sensor's drift trigger (sensor.rs cache-miss → re-inference).
    Input: two observe_deep_shapes outputs."""
    return after.join(
        before.select("shape_fingerprint"), "shape_fingerprint", "left_anti"
    )


# ----------------------------------------------------------- guided sensing
#
# Reference coordinator.rs:160-228 "guided mode": when the source DB
# schema is known, only JSON-typed columns are deep-inspected (the
# typed columns can't drift — the DDL capture path owns them); tables
# with no known schema fall back to full-payload observation. The
# schema map is driver-side config with bounded cardinality, so the
# routing compiles to one static CASE expression — a single pass, no
# per-table jobs.


def guided_shape_observations(
    df: DataFrame,
    json_columns: dict[str, list[str]] | None,
    *,
    table_col: str = "source.table",
    payload_col: str = "after",
    max_depth: int = 3,
) -> DataFrame:
    """Per (table, column) shape observations under guided sensing.

    ``json_columns`` maps known tables → their JSON string columns;
    events from those tables contribute one observation per JSON column
    (column-scoped fingerprint). Events from unknown tables (or when
    ``json_columns`` is None — schemaless source) contribute one
    full-payload observation under column ``*``.
    """
    table = F.col(table_col)
    payload = F.col(payload_col)
    full = F.array(
        F.struct(
            F.lit("*").alias("column"),
            deep_shape_fingerprint(F.to_json(payload), max_depth=max_depth).alias(
                "shape_fingerprint"
            ),
        )
    )
    obs = full
    if json_columns is not None:
        cases = None
        for tbl, cols in json_columns.items():
            arr = F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        deep_shape_fingerprint(
                            payload[c], max_depth=max_depth
                        ).alias("shape_fingerprint"),
                    )
                    for c in cols
                ]
            )
            cases = (
                F.when(table == tbl, arr)
                if cases is None
                else cases.when(table == tbl, arr)
            )
        obs = cases.otherwise(full) if cases is not None else full
    return (
        df.select(table.alias("table"), F.explode(obs).alias("o"))
        .groupBy("table", F.col("o.column").alias("column"), F.col("o.shape_fingerprint").alias("shape_fingerprint"))
        .agg(F.count("*").alias("n_rows"))
    )


def guided_drift(
    observations: DataFrame, expected: dict[tuple[str, str], str]
) -> DataFrame:
    """Observations whose fingerprint differs from the registered
    expectation for that (table, column) — the drift trigger of the
    guided path (drift_detector.observe against expected types).
    Pairs with no expectation are not drift (first-seen)."""
    spark = observations.sparkSession
    exp = spark.createDataFrame(
        [(t, c, fp) for (t, c), fp in expected.items()],
        "table string, column string, expected_fingerprint string",
    )
    return (
        observations.join(F.broadcast(exp), ["table", "column"])
        .filter(F.col("shape_fingerprint") != F.col("expected_fingerprint"))
        .select("table", "column", "shape_fingerprint", "expected_fingerprint", "n_rows")
    )


def classify_map_vs_struct(
    df: DataFrame, json_col: str, *, key_cardinality_threshold: int = 64
) -> DataFrame:
    """Key-cardinality classification (reference high_cardinality.rs):
    a JSON object column whose distinct-key count explodes is a MAP
    (user-keyed), not a STRUCT (fixed columns)."""
    keys = df.select(F.explode(F.json_object_keys(F.col(json_col))).alias("key"))
    agg = keys.agg(
        F.approx_count_distinct("key").alias("n_distinct_keys"),
        F.count("*").alias("n_keys_total"),
    )
    return agg.select(
        "n_distinct_keys",
        "n_keys_total",
        (F.col("n_distinct_keys") > key_cardinality_threshold).alias("is_map"),
    )
