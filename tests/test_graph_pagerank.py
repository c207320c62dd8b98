"""Exact-integer weighted PageRank (operators/graph.py): values match
a pure-Python integer replay of the same recurrence bit-for-bit,
weighted edges aggregate and drop self-loops, dangling nodes keep the
teleport floor, and the top-hosts view never ranks beyond top_n."""

import pytest

from deltaforge_spark.operators.graph import (
    MICRO,
    pagerank,
    pagerank_top_hosts,
    weighted_edges,
)

EDGES = [
    # (src, dst, weight) — node 5 is dangling (no out-edges),
    # node 1 is a hub, weights are deliberately uneven.
    (1, 2, 3),
    (1, 3, 1),
    (2, 3, 2),
    (3, 1, 5),
    (4, 1, 1),
    (4, 5, 4),
]


def _model(edges, n_iter, damp_num=85, damp_den=100):
    out_w = {}
    nodes = set()
    for s, d, w in edges:
        out_w[s] = out_w.get(s, 0) + w
        nodes.update((s, d))
    teleport = (damp_den - damp_num) * MICRO // damp_den
    rank = {n: MICRO for n in nodes}
    for _ in range(n_iter):
        s = {n: 0 for n in nodes}
        for u, v, w in edges:
            s[v] += rank[u] * w // out_w[u]
        rank = {n: teleport + damp_num * s[n] // damp_den for n in nodes}
    return rank


@pytest.mark.parametrize("n_iter", [1, 2, 3])
def test_pagerank_matches_integer_model_exactly(spark, n_iter):
    e = spark.createDataFrame(EDGES, "src long, dst long, weight long")
    got = {r["node"]: r["rank_micro"] for r in pagerank(e, n_iter=n_iter).collect()}
    assert got == _model(EDGES, n_iter)


def test_weighted_edges_counts_pairs_and_drops_self_loops(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (1, 2), (2, 2), (2, 1)], "src long, dst long"
    )
    got = {(r["src"], r["dst"]): r["weight"] for r in weighted_edges(pairs).collect()}
    assert got == {(1, 2): 2, (2, 1): 1}


def test_dangling_node_keeps_teleport_floor(spark):
    # 5 receives mass but emits none; its contribution is dropped by
    # design (documented in graph.py), never crashes the join.
    e = spark.createDataFrame(EDGES, "src long, dst long, weight long")
    ranks = {r["node"]: r["rank_micro"] for r in pagerank(e, n_iter=2).collect()}
    assert set(ranks) == {1, 2, 3, 4, 5}
    teleport = 15 * MICRO // 100
    # 4 has no in-edges at all: exactly the teleport floor.
    assert ranks[4] == teleport
    assert ranks[5] >= teleport


def test_top_hosts_view_limits_and_positions(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long, weight long")
    rows = pagerank_top_hosts(e, n_iter=2, top_n=3).collect()
    assert [r["position"] for r in rows] == [1, 2, 3]
    micros = [r["rank_micro"] for r in rows]
    assert micros == sorted(micros, reverse=True)


def _lp_model(edges, n_iter):
    # symmetrize with weight sum
    sym = {}
    for s, d, w in edges:
        if s == d:
            continue
        sym[(s, d)] = sym.get((s, d), 0) + w
        sym[(d, s)] = sym.get((d, s), 0) + w
    nodes = {s for s, _ in sym}
    label = {n: n for n in nodes}
    for _ in range(n_iter):
        votes = {}
        for (s, d), w in sym.items():
            votes.setdefault(s, {})
            votes[s][label[d]] = votes[s].get(label[d], 0) + w
        label = {
            n: min(ls, key=lambda l: (-ls[l], l)) for n, ls in votes.items()
        }
    return label


@pytest.mark.parametrize("n_iter", [1, 2, 3])
def test_label_propagation_matches_model(spark, n_iter):
    from deltaforge_spark.operators.graph import label_propagation

    e = spark.createDataFrame(EDGES, "src long, dst long, weight long")
    got = {
        r["node"]: r["label"]
        for r in label_propagation(e, n_iter=n_iter).collect()
    }
    assert got == _lp_model(EDGES, n_iter)


def test_label_propagation_two_cliques_converge(spark):
    from deltaforge_spark.operators.graph import label_propagation

    clique1 = [(a, b, 1) for a in (1, 2, 3) for b in (1, 2, 3) if a < b]
    clique2 = [(a, b, 1) for a in (10, 11, 12) for b in (10, 11, 12) if a < b]
    bridge = [(3, 10, 1)]
    e = spark.createDataFrame(
        clique1 + clique2 + bridge, "src long, dst long, weight long"
    )
    got = {
        r["node"]: r["label"] for r in label_propagation(e, n_iter=3).collect()
    }
    # each clique collapses to its min label; the single bridge edge
    # cannot outvote two intra-clique edges
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == got[12]
    assert got[10] != got[1]
