"""Product quantization (PQ) for embedding columns: 16× vector
compression plus ADC (asymmetric distance computation) top-k — the
memory tier that makes billion-vector ANN serving feasible.

Beyond-reference training-data operator (the reference ships no vector
search; this completes the ANN family next to brute-force / IVF-Flat /
hyperplane-LSH in similarity.py). Method: Jégou et al., "Product
Quantization for Nearest Neighbor Search", IEEE TPAMI 2011.

Design for 100 TB:
- **Encoding is a map-only projection** — each vector independently
  snaps its M subvectors to the nearest of K codewords; zero shuffle.
  A 64-dim float32 vector (256 B) becomes M=8 uint8 codes (8 B).
- **ADC search broadcasts the query set**: per query, one M×K lookup
  table of subspace distances; per corpus row the approximate distance
  is M table lookups — no vector math against the corpus at all. The
  corpus never shuffles; top-k ranks inside a per-query window.
- **Codebook-source-agnostic dataflow** (same stance as IVF-Flat's
  centroids): the declared query uses the deterministic md5-derived
  codebook so the DuckDB oracle reproduces codes bit-for-bit;
  ``pq_fit`` provides distributed Lloyd's refinement (assignment
  map-only against the broadcast codebook, update one (subspace, code)
  groupBy) for production quality — the encode/search dataflow is
  identical under either codebook.

Exactness across engines: all distances are computed in QUANTIZED
integer space — vector components ``floor(x * 2^20 + 0.5)``, codeword
components integers by construction — expanded as
``d(s, c) = s·s − 2·s·c + c·c``. Every term is an integer-valued
float64 far below 2^53, so numpy, Spark and DuckDB agree bit-for-bit
and ties break identically (first minimum).
"""

from __future__ import annotations

import hashlib

import pandas as pd  # noqa: F401 — pandas_udf type hints resolve via module globals
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

QSCALE = 1 << 20  # shared quantization scale (similarity.QSCALE)


# ------------------------------------------------------------- codebooks


def deterministic_codebook(
    *, num_subspaces: int = 8, codes: int = 16, dims: int = 64, seed: int = 0
) -> list[list[list[int]]]:
    """``[m][k][d] -> int`` codeword components in quantized units,
    derived from md5 so any engine can bake the identical literals.
    Components are uniform-ish in ±2^18 (≈ ±0.25 in embedding space at
    QSCALE) — a data-free codebook: recall is what k-means refinement
    buys, the dataflow is what we pin here."""
    sub = dims // num_subspaces
    out = []
    for m in range(num_subspaces):
        cw = []
        for k in range(codes):
            comp = []
            for d in range(sub):
                h = int(hashlib.md5(f"pq{seed}:{m}:{k}:{d}".encode()).hexdigest()[:12], 16)
                comp.append((h % (1 << 19)) - (1 << 18))
            cw.append(comp)
        out.append(cw)
    return out


def _ilist(xs: list[int]) -> str:
    return "array(" + ",".join(f"{x}D" for x in xs) + ")"


def _quant_sql(vec_sql: str) -> str:
    return f"transform({vec_sql}, x -> floor(CAST(x AS DOUBLE) * {float(QSCALE)}D + 0.5D))"


def _sub_sql(vq_sql: str, m: int, sub: int) -> str:
    return f"slice({vq_sql}, {m * sub + 1}, {sub})"


def _dot_sql(a_sql: str, b_sql: str) -> str:
    return f"aggregate(zip_with({a_sql}, {b_sql}, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"


# --------------------------------------------------------------- encode


def pq_encode(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    codebook: list[list[list[int]]] | None = None,
    carry: list[str] | None = None,
    impl: str = "numpy",
) -> DataFrame:
    """``(vec_id, carry..., codes array<int>)`` — nearest codeword per
    subspace. Ties deterministically take the lowest code in every
    implementation (numpy argmin / array_position both return the
    FIRST minimum), and distances are exact integers, so the two impls
    are bit-identical (differential-tested in test_pq.py):

    - ``numpy`` (default): one ``(n, sub) @ (sub, K)`` matmul per
      subspace per Arrow batch. PQ encode is M×K distance evaluations
      per row — unlike the 32-dot hyperplane signature this is firmly
      past the Arrow-transfer crossover (SCALE.md): measured 6×
      (4.7s → 0.8s query time at bench scale).
    - ``column``: the codegen'd SQL projection (one parsed expression —
      SCALE.md "Column-builder py4j cost"); pure-JVM verification twin
      and the shape the DuckDB oracle mirrors literally.
    """
    cb = codebook or deterministic_codebook(dims=_dims_of(df, vec_col))
    num_subspaces, codes, sub = len(cb), len(cb[0]), len(cb[0][0])
    carry = carry or []
    assert impl in ("numpy", "column")

    if impl == "numpy":
        import numpy as np
        import pandas as pd

        C = np.array(cb, dtype=np.float64)  # (M, K, sub)

        @F.pandas_udf("array<int>")
        def _codes(vs: pd.Series) -> pd.Series:
            M_ = np.vstack(vs.to_numpy()).astype(np.float64)
            if M_.shape[1] != num_subspaces * sub:
                raise ValueError(
                    f"vector width {M_.shape[1]} != codebook width "
                    f"{num_subspaces}x{sub}={num_subspaces * sub}"
                )
            Q = np.floor(M_ * QSCALE + 0.5)
            out = np.empty((len(M_), num_subspaces), dtype=np.int32)
            for m in range(num_subspaces):
                S = Q[:, m * sub : (m + 1) * sub]
                # d_k = −2 s·c_k + c_k·c_k (s·s constant per row drops
                # from the argmin) — integer-valued float64s, exact
                D = -2.0 * (S @ C[m].T) + (C[m] * C[m]).sum(axis=1)
                out[:, m] = np.argmin(D, axis=1)
            return pd.Series(list(out))

        return df.select(
            F.col(id_col).alias("vec_id"),
            *[F.col(c) for c in carry],
            _codes(F.col(vec_col)).alias("codes"),
        )

    vq = _quant_sql(vec_col)
    code_exprs = []
    for m in range(num_subspaces):
        s = _sub_sql(vq, m, sub)
        dists = ",".join(
            f"(-2.0D * {_dot_sql(s, _ilist(c))} + {sum(x * x for x in c)}.0D)" for c in cb[m]
        )
        code_exprs.append(
            f"CAST(array_position(array({dists}), array_min(array({dists}))) - 1 AS INT)"
        )
    codes_sql = "array(" + ",".join(code_exprs) + ")"
    return df.select(
        F.col(id_col).alias("vec_id"),
        *[F.col(c) for c in carry],
        F.expr(codes_sql).alias("codes"),
    )


def _dims_of(df: DataFrame, vec_col: str) -> int:
    """Actual vector width from the data (one-row control-plane read,
    same O(1) driver cost class as centroid seeding). Array columns
    carry no length in the schema, so the only honest source is a row;
    a hardcoded width silently mis-encodes non-matching embeddings
    (slices past the end / zip_with truncation) instead of raising."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None or row["d"] is None or row["d"] <= 0:
        raise ValueError(f"cannot infer vector dims from empty column {vec_col!r}")
    return int(row["d"])


def _lut_udf(cb):
    """Per-query ADC lookup tables as one Arrow batch pass:
    ``array<array<double>>`` of [subspace][code] distances. Exact
    integer-valued float64s (same expansion as encode). The SQL-string
    twin of this expression weighs ~400 KB at M=8, K=16, sub=8 —
    Catalyst parse/analyze alone costs seconds per query build, which
    is why the LUT is numpy-only."""
    import numpy as np

    C = np.array(cb, dtype=np.float64)  # (M, K, sub)
    num_subspaces, _, sub = C.shape
    cc = (C * C).sum(axis=2)  # (M, K)

    @F.pandas_udf("array<array<double>>")
    def _lut(vs: pd.Series) -> pd.Series:
        import numpy as np

        M_ = np.vstack(vs.to_numpy()).astype(np.float64)
        if M_.shape[1] != num_subspaces * sub:
            raise ValueError(
                f"query width {M_.shape[1]} != codebook width {num_subspaces * sub}"
            )
        Q = np.floor(M_ * QSCALE + 0.5)
        out = np.empty((len(M_), num_subspaces, C.shape[1]))
        for m in range(num_subspaces):
            S = Q[:, m * sub : (m + 1) * sub]
            out[:, m, :] = (S * S).sum(axis=1, keepdims=True) - 2.0 * (S @ C[m].T) + cc[m]
        return pd.Series([[list(r) for r in row] for row in out])

    return _lut


# ----------------------------------------------------------------- search


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 5,
    codebook: list[list[list[int]]] | None = None,
    codes_df: DataFrame | None = None,
) -> DataFrame:
    """ADC top-k: exact per-query lookup tables against the codebook,
    M lookups per corpus row. Returns (query_id, match_id, adc_dist,
    rank) with ``adc_dist`` an exact integer-valued double (hash-safe).

    ``codes_df`` reuses a pre-encoded corpus (the production shape —
    encode once at ingest, search many); otherwise encodes inline.
    Queries broadcast; the corpus never moves."""
    cb = codebook or deterministic_codebook(dims=_dims_of(corpus, vec_col))
    num_subspaces, codes_n, sub = len(cb), len(cb[0]), len(cb[0][0])

    enc = codes_df if codes_df is not None else pq_encode(
        corpus, vec_col=vec_col, id_col=id_col, codebook=cb
    )

    q = queries.select(
        F.col(query_id_col).alias("query_id"), _lut_udf(cb)(F.col(vec_col)).alias("_lut")
    )
    scored = enc.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("match_id"),
        F.expr(
            "aggregate(zip_with(codes, _lut, (c, l) -> element_at(l, c + 1)), 0.0D, (acc, x) -> acc + x)"
        ).alias("adc_dist"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc_dist").asc(), F.col("match_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", F.col("adc_dist").cast("long").alias("adc_dist"), "rank")
    )


# -------------------------------------------------------------- training


def pq_fit(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_subspaces: int = 8,
    codes: int = 16,
    dims: int = 64,
    iters: int = 3,
    seed: int = 0,
) -> list[list[list[int]]]:
    """Distributed Lloyd's refinement of the deterministic codebook.

    Per iteration: (1) assignment is ``pq_encode`` — map-only against
    the broadcast codebook; (2) update explodes each vector into its M
    quantized subvectors keyed by (subspace, assigned code) and takes
    one groupBy mean — a single shuffle whose key space is M×K (tiny),
    with map-side partial aggregation. The new codebook (M×K×sub ints,
    a few KB) collects to the driver — bounded by codebook shape, not
    rows. Empty cells keep their previous codeword (standard Lloyd's
    fallback).

    Iterative ⇒ not SQL-oracle-expressible; covered by the descending
    distortion test (tests/test_pq.py)."""
    sub = dims // num_subspaces
    cb = deterministic_codebook(
        num_subspaces=num_subspaces, codes=codes, dims=dims, seed=seed
    )
    vq = F.expr(_quant_sql(vec_col))
    for _ in range(iters):
        enc = pq_encode(df, vec_col=vec_col, id_col=id_col, codebook=cb)
        joined = df.select(F.col(id_col).alias("vec_id"), vq.alias("_vq")).join(
            enc, "vec_id"
        )
        parts = joined.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(m).alias("m"),
                            F.element_at("codes", m + 1).alias("code"),
                            F.slice("_vq", m * sub + 1, sub).alias("s"),
                        )
                        for m in range(num_subspaces)
                    ]
                )
            ).alias("p")
        ).select("p.m", "p.code", "p.s")
        means = (
            parts.select(
                "m", "code", *[F.element_at("s", d + 1).alias(f"d{d}") for d in range(sub)]
            )
            .groupBy("m", "code")
            .agg(*[F.avg(f"d{d}").alias(f"d{d}") for d in range(sub)])
            .collect()
        )
        new_cb = [[list(c) for c in sp] for sp in cb]
        for r in means:
            new_cb[r["m"]][r["code"]] = [int(round(r[f"d{d}"])) for d in range(sub)]
        cb = new_cb
    return cb


def pq_distortion(
    df: DataFrame,
    codebook: list[list[list[int]]],
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> float:
    """Mean squared quantization error in quantized units — the
    k-means objective; used to verify pq_fit actually descends."""
    cb = codebook
    num_subspaces, _, sub = len(cb), len(cb[0]), len(cb[0][0])
    vq = _quant_sql(vec_col)
    enc = pq_encode(df, vec_col=vec_col, id_col=id_col, codebook=cb)
    terms = []
    for m in range(num_subspaces):
        s = _sub_sql(vq, m, sub)
        per_code = ",".join(
            f"({_dot_sql(s, s)} - 2.0D * {_dot_sql(s, _ilist(c))} + {sum(x * x for x in c)}.0D)"
            for c in cb[m]
        )
        terms.append(f"element_at(array({per_code}), element_at(codes, {m + 1}) + 1)")
    err_sql = " + ".join(terms)
    joined = df.select(F.col(id_col).alias("vec_id"), F.col(vec_col)).join(enc, "vec_id")
    row = joined.select(F.avg(F.expr(err_sql)).alias("mse")).collect()[0]
    return float(row["mse"])


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    codebook: list[list[list[int]]] | None = None,
) -> DataFrame:
    """IVF-PQ — the industry-standard billion-vector serving shape,
    composed from the two operators this module and similarity.py
    already pin: the inverted file restricts WHICH rows a query
    touches (~|corpus|·nprobe/n_cells), PQ codes shrink WHAT each
    touched row costs (8 bytes + M lookups, no vector math).

    Dataflow: corpus → cell assignment (map-only vs broadcast
    centroids) → PQ encode carrying cell_id (still map-only) → ONE
    shuffle on cell_id for the probe join; routed queries broadcast
    with their cells. Centroids are the deterministic lowest-id
    vectors (same as ivf_topk — k-means plugs into the identical
    dataflow); distances are the integer-exact ADC sums, so the DuckDB
    oracle reproduces routing, codes, and ranking."""
    from .similarity import ivf_assign

    cb = codebook or deterministic_codebook(dims=_dims_of(corpus, vec_col))

    cents = (
        corpus.orderBy(F.col(id_col).asc())
        .limit(n_cells)
        .select(F.col(id_col).alias("cell_id"), F.col(vec_col).alias("_centroid"))
    )
    assigned = ivf_assign(
        corpus.select(F.col(id_col).alias("match_id"), F.col(vec_col).alias("_cvec")),
        cents,
        vec_col="_cvec",
        id_col="match_id",
        nprobe=1,
    )
    enc = pq_encode(
        assigned, vec_col="_cvec", id_col="match_id", codebook=cb, carry=["cell_id"]
    ).withColumnRenamed("vec_id", "match_id")

    routed = ivf_assign(
        queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qvec")),
        cents,
        vec_col="_qvec",
        id_col="query_id",
        nprobe=nprobe,
    ).select("query_id", "cell_id", _lut_udf(cb)(F.col("_qvec")).alias("_lut"))

    scored = enc.join(F.broadcast(routed), "cell_id").filter(
        F.col("match_id") != F.col("query_id")
    ).select(
        "query_id",
        "match_id",
        F.expr(
            "aggregate(zip_with(codes, _lut, (c, l) -> element_at(l, c + 1)), 0.0D, (acc, x) -> acc + x)"
        ).alias("adc_dist"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc_dist").asc(), F.col("match_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", F.col("adc_dist").cast("long").alias("adc_dist"), "rank")
    )
