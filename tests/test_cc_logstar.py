"""Large-star/small-star connected components (dedup.py
connected_components_logstar): label correctness vs a brute-force
union-find model, round count logarithmic on an adversarially deep
path graph (where plain min-label propagation needs O(n) rounds), and
differential equality with the plain propagator on the LSH edge set."""

import math

import pytest


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _lcg_perm(n, seed=48271, mod=2**31 - 1):
    """Deterministic pseudo-random relabeling so the path's node ids
    carry no monotone structure the algorithm could exploit."""
    labels, x = [], seed
    for _ in range(n):
        x = (x * seed) % mod
        labels.append(x)
    assert len(set(labels)) == n
    return labels


def test_path_graph_converges_in_log_rounds(spark):
    """10k-node path — diameter 9999, the worst case for min-label
    propagation — must converge in <= ceil(log2 n) + 3 alternating
    rounds with exactly the brute-force labels."""
    from deltaforge_spark.operators.dedup import connected_components_logstar

    n = 10_000
    ids = _lcg_perm(n)
    edges = [(ids[i], ids[i + 1]) for i in range(n - 1)]
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])

    rounds: list = []
    got = {
        r["doc_id"]: r["canonical_id"]
        for r in connected_components_logstar(df, _rounds_out=rounds).collect()
    }
    want = _union_find(edges)
    assert got == want
    assert len(got) == n and set(got.values()) == {min(ids)}
    assert rounds[0] <= math.ceil(math.log2(n)) + 3, rounds


def test_many_small_components_and_singleton_edge_shapes(spark):
    """A mix of cliques, a chain, and 2-node components — labels match
    brute force exactly."""
    from deltaforge_spark.operators.dedup import connected_components_logstar

    edges = []
    # clique 100..104
    for i in range(100, 105):
        for j in range(i + 1, 105):
            edges.append((i, j))
    # chain 200..209
    edges += [(200 + i, 201 + i) for i in range(9)]
    # pairs
    edges += [(301, 300), (402, 401)]
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {
        r["doc_id"]: r["canonical_id"]
        for r in connected_components_logstar(df).collect()
    }
    assert got == _union_find(edges)


def test_differential_vs_plain_propagator_on_lsh_edges(spark, sf_dir):
    """Both CC variants must produce identical (doc_id, canonical_id)
    sets on the production near-dup edge set."""
    from deltaforge_spark.operators.dedup import (
        connected_components,
        connected_components_logstar,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sig = minhash_signatures(docs, text_col="text", id_col="doc_id", num_hashes=8)
    edges = minhash_lsh_pairs(sig, num_hashes=8, bands=4).persist()
    a = {(r[0], r[1]) for r in connected_components(edges).collect()}
    b = {(r[0], r[1]) for r in connected_components_logstar(edges).collect()}
    edges.unpersist()
    assert a == b and len(a) > 0
