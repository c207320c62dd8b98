"""Dedup + similarity operator properties."""

import pyspark.sql.functions as F
from pyspark.sql import Row

from deltaforge_spark.operators.dedup import (
    exact_dedup,
    hamming64,
    minhash_lsh_pairs,
    minhash_signatures,
    shingle_jaccard_pairs,
    simhash,
    word_shingles,
)
from deltaforge_spark.operators.similarity import brute_force_topk, lsh_topk


DOCS = [
    Row(doc_id=1, text="the quick brown fox jumps over the lazy dog today"),
    Row(doc_id=2, text="the quick brown fox jumps over the lazy dog today"),  # exact dup
    Row(doc_id=3, text="the quick brown fox jumps over the lazy cat today"),  # near dup
    Row(doc_id=4, text="completely different words about spark and data engines"),
    Row(doc_id=5, text="ab"),  # < 3 tokens -> no shingles
]


def test_word_shingles_short_doc(spark):
    df = spark.createDataFrame(DOCS)
    out = df.select("doc_id", word_shingles(F.col("text")).alias("sh")).collect()
    by_id = {r["doc_id"]: r["sh"] for r in out}
    assert by_id[5] == []
    assert "the quick brown" in by_id[1]


def test_exact_dedup_groups(spark):
    df = spark.createDataFrame(DOCS)
    out = exact_dedup(df, ["text"], "doc_id")
    groups = {r["keep_id"]: r["n_dupes"] for r in out.collect()}
    assert groups[1] == 2  # docs 1,2 identical; keep min id
    assert groups[3] == 1


def test_minhash_identical_docs_identical_sigs(spark):
    df = spark.createDataFrame(DOCS)
    sig = minhash_signatures(df, text_col="text", id_col="doc_id", num_hashes=8)
    rows = {r["doc_id"]: tuple(r[f"mh{j}"] for j in range(8)) for r in sig.collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[4]
    assert 5 not in rows  # no shingles -> no signature


def test_minhash_lsh_finds_dup_pair(spark):
    df = spark.createDataFrame(DOCS)
    sig = minhash_signatures(df, text_col="text", id_col="doc_id", num_hashes=8)
    pairs = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(sig, num_hashes=8, bands=4).collect()}
    assert (1, 2) in pairs
    assert (1, 4) not in pairs and (4, 1) not in pairs


def test_simhash_near_dup_hamming(spark):
    df = spark.createDataFrame(DOCS)
    fp = {r["doc_id"]: r["simhash"] for r in simhash(df, text_col="text", id_col="doc_id", bits=16).collect()}
    assert fp[1] == fp[2]
    pairs = spark.createDataFrame([Row(a=fp[1], b=fp[3]), Row(a=fp[1], b=fp[4])])
    d = pairs.select(hamming64(F.col("a"), F.col("b")).alias("d")).collect()
    near, far = d[0]["d"], d[1]["d"]
    assert near < far  # near-dup closer in hamming space


def test_shingle_jaccard_exact_values(spark):
    df = spark.createDataFrame(DOCS)
    pairs = shingle_jaccard_pairs(df, text_col="text", id_col="doc_id", threshold=0.3)
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs.collect()}
    assert got[(1, 2)] == 1.0
    # docs 1 & 3 differ in word 9 of 10: 2 of 8 shingles change -> 6/10
    assert abs(got[(1, 3)] - 0.6) < 1e-9


def _emb_rows():
    # 4-dim embeddings: 1 and 2 parallel, 3 orthogonal-ish, 4 opposite
    return [
        Row(vec_id=1, embedding=[1.0, 0.0, 0.0, 0.0]),
        Row(vec_id=2, embedding=[2.0, 0.0, 0.0, 0.0]),
        Row(vec_id=3, embedding=[0.0, 1.0, 0.0, 0.0]),
        Row(vec_id=4, embedding=[-1.0, 0.0, 0.0, 0.0]),
        Row(vec_id=5, embedding=[0.9, 0.1, 0.0, 0.0]),
    ]


def test_brute_force_topk(spark):
    emb = spark.createDataFrame(_emb_rows())
    q = emb.filter(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = brute_force_topk(emb, q, k=2).collect()
    assert [r["match_id"] for r in out] == [2, 5]
    assert out[0]["cosine_sim"] == 1.0


def test_lsh_topk_recall_on_real_embeddings(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = brute_force_topk(emb, q, k=5).collect()
    # synthetic embeddings are near-uniform random => neighbors are weakly
    # clustered; 1 plane (2 buckets) gives deterministic recall 6/15 here
    approx = lsh_topk(emb, q, k=5, num_planes=1, dims=64).collect()
    exact_set = {(r["query_id"], r["match_id"]) for r in exact}
    approx_set = {(r["query_id"], r["match_id"]) for r in approx}
    assert len(approx_set & exact_set) >= 3
    approx_scores = {(r["query_id"], r["match_id"]): r["cosine_sim"] for r in approx}
    exact_scores = {(r["query_id"], r["match_id"]): r["cosine_sim"] for r in exact}
    for k_, v in approx_scores.items():
        if k_ in exact_scores:
            assert abs(v - exact_scores[k_]) < 1e-9


def test_connected_components_chain_and_islands(spark):
    """A 5-node chain (worst-case diameter for label propagation) plus a
    separate 2-clique: every node lands on its component's min label."""
    from deltaforge_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], ["doc_a", "doc_b"]
    )
    got = {
        r["doc_id"]: r["canonical_id"]
        for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_connected_components_merges_via_shared_node(spark):
    """Two clusters joined by one bridge edge collapse to one canonical."""
    from deltaforge_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(7, 8), (8, 9), (2, 3), (3, 7)], ["doc_a", "doc_b"]
    )
    got = {
        r["doc_id"]: r["canonical_id"]
        for r in connected_components(edges).collect()
    }
    assert set(got.values()) == {2}


def test_embedding_lsh_verify_strategies_agree(spark, sf_dir):
    """in_join and post_join are shuffle-plan alternatives, never
    semantic ones: identical pair sets and cosines."""
    from deltaforge_spark.operators.dedup import embedding_neardup_lsh

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = sorted(map(tuple, embedding_neardup_lsh(emb, verify="in_join").collect()))
    b = sorted(map(tuple, embedding_neardup_lsh(emb, verify="post_join").collect()))
    assert a == b and len(a) > 0


def test_embedding_lsh_sig_impls_identical(spark, sf_dir):
    """The numpy batch signature generator and the quantized column-
    algebra twin are implementations of ONE definition: identical
    (table, sig) keys per vector, hence identical query results."""
    from deltaforge_spark.operators.dedup import embedding_neardup_lsh
    from deltaforge_spark.operators.similarity import (
        QSCALE,
        hyperplane_signature,
        hyperplane_signatures_batch,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200)
    batch = {
        (r["_id"], r["table"], r["sig"])
        for r in hyperplane_signatures_batch(
            emb.select(F.col("vec_id").alias("_id"), F.col("embedding").alias("_v")),
            vec_col="_v",
            id_col="_id",
            num_planes=4,
            dims=64,
            num_tables=8,
        ).collect()
    }
    cols = emb.select(
        F.col("vec_id").alias("_id"),
        *[
            hyperplane_signature(
                F.col("embedding"), num_planes=4, dims=64, seed=t * 7919, scale=QSCALE
            ).alias(f"s{t}")
            for t in range(8)
        ],
    )
    col_sigs = {
        (r["_id"], t, r[f"s{t}"]) for r in cols.collect() for t in range(8)
    }
    assert batch == col_sigs and len(batch) == 200 * 8

    a = sorted(map(tuple, embedding_neardup_lsh(emb, sig_impl="numpy").collect()))
    b = sorted(map(tuple, embedding_neardup_lsh(emb, sig_impl="column").collect()))
    assert a == b


def test_embedding_lsh_max_bucket_caps_hot_bucket(spark, sf_dir):
    """max_bucket is the quadratic-bucket guard: a degenerate bucket
    (here: many IDENTICAL vectors, which land in the same signature in
    EVERY table) stops generating its O(n²) pairs once capped, while
    ordinary near-dup pairs — whose buckets stay small — survive with
    identical cosines; both verify strategies honor the cap."""
    from pyspark.sql import functions as F

    from deltaforge_spark.operators.dedup import embedding_neardup_lsh

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(100)
    # 40 copies of one constant vector: a hot bucket of size 40 in all
    # 8 tables (39*40/2 = 780 intra-bucket pairs)
    hot = spark.range(10_000, 10_040).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(0.5)] * 64).alias("embedding"),
    )
    mixed = emb.select("vec_id", "embedding").unionByName(hot)

    uncapped = embedding_neardup_lsh(mixed, max_bucket=None)
    capped = embedding_neardup_lsh(mixed, max_bucket=20)
    hot_pairs = capped.filter(
        (F.col("a_id") >= 10_000) & (F.col("b_id") >= 10_000)
    ).count()
    assert hot_pairs == 0  # the hot bucket never fans out
    assert uncapped.filter(
        (F.col("a_id") >= 10_000) & (F.col("b_id") >= 10_000)
    ).count() == 780
    # ordinary pairs (small buckets) are untouched by the cap
    base = sorted(
        map(tuple, embedding_neardup_lsh(emb.select("vec_id", "embedding")).collect())
    )
    surviving = sorted(
        map(tuple, capped.filter(F.col("b_id") < 10_000).collect())
    )
    assert surviving == base
    # post_join honors the same cap
    capped_pj = embedding_neardup_lsh(mixed, max_bucket=20, verify="post_join")
    assert capped_pj.filter(
        (F.col("a_id") >= 10_000) & (F.col("b_id") >= 10_000)
    ).count() == 0


def test_jaccard_hot_shingle_pruning(spark):
    """max_doc_freq bounds the quadratic hot-key blowup: a boilerplate
    shingle shared by EVERY doc stops generating pairs, while genuinely
    similar pairs (sharing rare shingles) survive with their exact
    rare-gram intersections."""
    from deltaforge_spark.operators.dedup import shingle_jaccard_pairs

    boiler = "click here now"
    rows = [(i, f"{boiler} filler{i} pad{i} end{i}") for i in range(20)]
    # docs 100/101: same rare content + the boilerplate
    rows += [(100, f"{boiler} rare alpha beta gamma delta"),
             (101, f"{boiler} rare alpha beta gamma delta")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    exact = shingle_jaccard_pairs(df, text_col="text", id_col="doc_id", threshold=0.1)
    pruned = shingle_jaccard_pairs(
        df, text_col="text", id_col="doc_id", threshold=0.1, max_doc_freq=5
    )
    exact_pairs = {(r["doc_a"], r["doc_b"]) for r in exact.collect()}
    pruned_rows = {(r["doc_a"], r["doc_b"]): r for r in pruned.collect()}

    # without pruning the boilerplate links all 22 docs pairwise
    assert len(exact_pairs) == 22 * 21 // 2
    # with pruning only the genuinely-similar pair remains
    assert set(pruned_rows) == {(100, 101)}
    r = pruned_rows[(100, 101)]
    # intersection = the 5 rare shingles of "rare alpha beta gamma delta"
    # region minus none (all rare); boilerplate-spanning grams pruned
    assert r["n_inter"] > 0 and r["jaccard"] < 1.0
