"""Similarity search over embedding columns (``array<float>``).

Two paths, as a 100-TB design requires:

- **brute-force top-k** (the exactness baseline): broadcast the query
  set, compute cosine via ``zip_with``/``aggregate`` fold (JVM-side,
  codegen — no Python), rank with a window. Cost is |corpus| × |queries|
  multiplies with NO shuffle of the corpus (queries broadcast); correct
  choice when the query set is small.
- **LSH-bucketed ANN** (the scale path): deterministic random-hyperplane
  signatures (sign of dot(v, plane_j)); corpus and queries shuffle only
  on bucket keys, candidates re-ranked exactly within buckets.
  Hyperplane components are derived from md5 hashes of (plane, dim) so
  the whole pipeline is reproducible run-to-run and engine-to-engine.

Float math notes: embeddings are float32; both Spark and DuckDB fold
sums left-to-right in array order after an exact float→double widening,
so dot products are bit-identical across engines — results are rounded
to 6dp anyway for hash-stability.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 5,
) -> DataFrame:
    """Exact top-k by cosine: broadcast-join the (small) query set
    against the corpus; deterministic tiebreak on corpus id."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    c = corpus.select(F.col(id_col).alias("match_id"), F.col(vec_col).alias("_cvec"))
    scored = c.join(F.broadcast(q), F.col("match_id") != F.col("query_id")).select(
        "query_id",
        "match_id",
        F.round(cosine(F.col("_qvec"), F.col("_cvec")), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("match_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "cosine_sim", "rank")
    )


# ------------------------------------------------------- LSH-bucketed ANN


def _plane_component(plane: int, dim: int) -> Column:
    """Deterministic ±1 hyperplane component from md5(plane:dim)."""
    h = F.conv(F.substring(F.md5(F.lit(f"p{plane}:d{dim}")), 1, 2), 16, 10).cast("long")
    return F.when(h % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))


def hyperplane_signature(vec: Column, *, num_planes: int, dims: int) -> Column:
    """Bit-signature: bit_j = 1 if dot(vec, plane_j) > 0. Planes are
    ±1-component vectors derived from md5 — reproducible, no RNG state."""
    sig = F.lit(0).cast("long")
    for j in range(num_planes):
        d = None
        for i in range(dims):
            term = F.element_at(vec, i + 1).cast("double") * _plane_component(j, i)
            d = term if d is None else d + term
        sig = sig + F.when(d > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 5,
    num_planes: int = 8,
    dims: int = 64,
) -> DataFrame:
    """ANN: bucket by hyperplane signature, exact re-rank inside buckets.

    At scale this replaces the |corpus|×|queries| product with a join on
    the signature key — the corpus shuffles once on a single long.
    Recall is tunable via num_planes (fewer planes → bigger buckets →
    higher recall, more compute); multi-probe = union of per-plane
    bit-flip signatures (not needed at test scale).
    """
    c = corpus.select(
        F.col(id_col).alias("match_id"),
        F.col(vec_col).alias("_cvec"),
        hyperplane_signature(F.col(vec_col), num_planes=num_planes, dims=dims).alias("_sig"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        hyperplane_signature(F.col(vec_col), num_planes=num_planes, dims=dims).alias("_sig"),
    )
    scored = c.join(F.broadcast(q), "_sig").filter(
        F.col("match_id") != F.col("query_id")
    ).select(
        "query_id",
        "match_id",
        F.round(cosine(F.col("_qvec"), F.col("_cvec")), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("match_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "cosine_sim", "rank")
    )
