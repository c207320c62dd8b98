"""Gap-based sessionization (operators/sessions.py) and the Count-Min
sketch (sketches.py countmin_*): boundary semantics against a
hand-computed model, strict-gap edge, tiebreak determinism; CM's
never-underestimate guarantee, exactness when no buckets collide,
merge-by-sum of register tables."""

from pyspark.sql import functions as F

from deltaforge_spark.operators.sessions import session_stats, sessionize
from deltaforge_spark.operators.sketches import (
    countmin_estimate,
    countmin_registers,
)

S = 1_000_000_000  # 1 s in nanos
GAP = 30 * 60 * S


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, event_id long, ts long")


def test_sessionize_boundaries_and_seq(spark):
    rows = [
        # user 1: two sessions — the 3rd event arrives exactly GAP+1s late
        (1, 1, 0),
        (1, 2, 10 * S),
        (1, 3, 10 * S + GAP + S),
        # user 2: one session, events inside the gap
        (2, 4, 5 * S),
        (2, 5, 5 * S + GAP),  # exactly == gap: same session (strict >)
    ]
    got = {
        (r["user_id"], r["event_id"]): r["session_seq"]
        for r in sessionize(_events(spark, rows)).collect()
    }
    assert got == {(1, 1): 1, (1, 2): 1, (1, 3): 2, (2, 4): 1, (2, 5): 1}


def test_session_stats_reduction(spark):
    rows = [(1, 1, 0), (1, 2, 90 * S), (1, 3, 90 * S + GAP + S)]
    stats = {
        (r["user_id"], r["session_seq"]): (
            r["n_events"],
            r["start_ms"],
            r["end_ms"],
            r["duration_s"],
        )
        for r in session_stats(_events(spark, rows)).collect()
    }
    assert stats == {
        (1, 1): (2, 0, 90_000, 90),
        (1, 2): (1, (90 + 1800 + 1) * 1000, (90 + 1800 + 1) * 1000, 0),
    }


def test_sessionize_simultaneous_events_tiebreak_on_id(spark):
    # same ts: event_id orders them; both in one session, deterministic
    rows = [(1, 9, 0), (1, 3, 0), (1, 5, GAP + S)]
    got = sessionize(_events(spark, rows)).collect()
    assert {r["event_id"]: r["session_seq"] for r in got} == {9: 1, 3: 1, 5: 2}


def test_countmin_never_underestimates_and_exact_without_collisions(spark):
    data = [("a",)] * 7 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(data, "v string")
    regs = countmin_registers(df, "v", d=3, w=1024)
    probes = spark.createDataFrame([("a",), ("b",), ("c",), ("zz",)], "v string")
    est = {
        r["v"]: r["cm_est"]
        for r in countmin_estimate(probes, regs, "v", d=3, w=1024).collect()
    }
    truth = {"a": 7, "b": 3, "c": 1, "zz": 0}
    for k, t in truth.items():
        assert est[k] >= t
    # 3 keys in 1024 buckets x 3 rows: some row is collision-free for
    # each key with near-certainty under fixed md5 hashes — and the min
    # over rows then equals the exact count. Absent key reads 0.
    assert est == truth


def test_countmin_registers_bounded_and_mergeable(spark):
    df = spark.createDataFrame([(f"k{i % 50}",) for i in range(500)], "v string")
    regs = countmin_registers(df, "v", d=3, w=64).collect()
    assert len(regs) <= 3 * 64
    assert sum(r["cnt"] for r in regs) == 3 * 500  # each insert hits d rows
    # merge = sum register tables of two shards == registers of the union
    a = spark.createDataFrame([("x",)] * 4 + [("y",)] * 2, "v string")
    b = spark.createDataFrame([("x",)] * 1 + [("z",)] * 5, "v string")
    merged = (
        countmin_registers(a, "v", d=2, w=32)
        .unionByName(countmin_registers(b, "v", d=2, w=32))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = countmin_registers(a.unionByName(b), "v", d=2, w=32)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_bm25_search_ranks_matching_docs(spark):
    from deltaforge_spark.operators.keywords import bm25_search

    docs = spark.createDataFrame(
        [
            (1, "hash join hash join hash"),   # heavy on both terms
            (2, "hash scan scan scan scan"),   # one term, low tf share
            (3, "sort merge only here today"), # no match
            (4, "join vector"),                # two terms, short doc
        ],
        "doc_id long, text string",
    )
    rows = bm25_search(docs, ["hash", "join", "vector"], k=10).collect()
    got = {r["doc_id"]: (r["rank"], r["n_terms"]) for r in rows}
    assert 3 not in got  # no query term -> not retrieved
    assert got[4][1] == 2 and got[1][1] == 2 and got[2][1] == 1
    # short doc matching two terms incl. the rare one outranks all
    assert got[4][0] == 1
    scores = {r["doc_id"]: r["score"] for r in rows}
    assert scores[1] > scores[2]  # more matched mass, same length norm family


def test_bigram_pmi_prefers_exclusive_pairs(spark):
    from deltaforge_spark.operators.textanalysis import bigram_pmi

    # "x y" always co-occur (exclusive partners); "a b" co-occur but both
    # words also appear independently everywhere else -> lower PMI.
    docs = spark.createDataFrame(
        [(i, "x y a b a c b d a e b f") for i in range(5)],
        "doc_id long, text string",
    )
    rows = bigram_pmi(docs, min_count=5, k=10).collect()
    assert rows, "no bigram survived min_count"
    by_pair = {(r["w1"], r["w2"]): (r["c12"], r["pmi"]) for r in rows}
    assert by_pair[("x", "y")][0] == 5
    assert by_pair[("x", "y")][1] > by_pair[("a", "b")][1]
    # ranked on rounded pmi desc with (w1, w2) tiebreak
    pmis = [r["pmi"] for r in rows]
    assert pmis == sorted(pmis, reverse=True)


def test_chunk_documents_windows_and_overlap(spark):
    from deltaforge_spark.operators.chunking import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g"),   # 7 tokens -> 3 chunks at size 3 stride 2
            (2, "x y"),             # shorter than a chunk -> exactly 1
            (3, ""),                # degenerate -> 1 chunk, the '' token
        ],
        "doc_id long, text string",
    )
    rows = chunk_documents(docs, chunk_tokens=3, stride=2).collect()
    got = {(r["doc_id"], r["chunk_idx"]): (r["n_tokens"], r["chunk"]) for r in rows}
    assert got == {
        (1, 0): (3, "a b c"),
        (1, 1): (3, "c d e"),
        (1, 2): (3, "e f g"),
        (2, 0): (2, "x y"),
        (3, 0): (1, ""),
    }
    # every token position is covered and consecutive chunks overlap by 1
    assert got[(1, 1)][1].split()[0] == got[(1, 0)][1].split()[-1]


def test_chunk_documents_no_overlap_partition(spark):
    from deltaforge_spark.operators.chunking import chunk_documents

    docs = spark.createDataFrame([(1, " ".join(str(i) for i in range(10)))],
                                 "doc_id long, text string")
    rows = chunk_documents(docs, chunk_tokens=4).collect()
    chunks = [r["chunk"] for r in sorted(rows, key=lambda r: r["chunk_idx"])]
    assert chunks == ["0 1 2 3", "4 5 6 7", "8 9"]
    # stride == chunk: disjoint cover, token-exact
    assert " ".join(chunks).split() == [str(i) for i in range(10)]


def test_hll_merge_equals_direct_sketch(spark):
    from deltaforge_spark.operators.sketches import hll_merge, hll_registers

    rows = [(d, h, u) for d in (0, 1) for h in range(4) for u in range(h * 10, h * 10 + 25)]
    df = spark.createDataFrame(rows, "day long, hour long, user_id long")
    hourly = hll_registers(df, ["day", "hour"], "user_id", p=5)
    merged = sorted(
        map(tuple, hll_merge(hourly, ["day"]).select("day", "bucket", "m_j").collect())
    )
    direct = sorted(
        map(tuple, hll_registers(df, ["day"], "user_id", p=5).collect())
    )
    assert merged == direct  # union-by-max == sketching the union
