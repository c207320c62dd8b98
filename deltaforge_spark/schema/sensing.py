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
