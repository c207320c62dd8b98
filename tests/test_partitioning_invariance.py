"""Partitioning invariance: operator RESULTS must not depend on the
physical layout of the input — partition count, row order within
partitions, or a pre-shuffle. On a 1000-executor cluster the layout is
whatever the previous stage produced; any operator whose answer drifts
with it is silently wrong at scale. These tests re-run representative
operators under adversarial layouts and require bit-identical rows.

Operators chosen for their hazard class:
- window/first-occurrence logic (line_dedup's global-first rule)
- iterative propagation (connected_components)
- hash-bucket joins (minhash LSH pairs)
- in-agg ordering (pack/epoch/keywords rely on explicit sorts)
- numpy Arrow batching (pq encode — batch boundaries move with layout)
"""

import pytest
from pyspark.sql import functions as F


def _layouts(df):
    """Three adversarial physical layouts of the same rows."""
    return [
        df.coalesce(1),
        df.repartition(7),
        df.repartition(32, F.col(df.columns[0])).sortWithinPartitions(
            F.col(df.columns[0]).desc()
        ),
    ]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    d.persist().count()
    return d


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    e.persist().count()
    return e


def test_line_dedup_layout_invariant(docs):
    from deltaforge_spark.operators.spans import line_dedup, token_chunks

    outs = []
    for d in _layouts(docs):
        lines = d.withColumn("_lines", token_chunks(F.col("text"), 10))
        outs.append(_rows(line_dedup(lines, lines_col="_lines")))
    assert outs[0] == outs[1] == outs[2] and len(outs[0]) > 0


def test_connected_components_layout_invariant(spark):
    from deltaforge_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40, 2)] + [(1, 2), (5, 6), (30, 0)],
        ["doc_a", "doc_b"],
    )
    outs = [_rows(connected_components(e)) for e in _layouts(edges)]
    assert outs[0] == outs[1] == outs[2]


def test_minhash_lsh_pairs_layout_invariant(docs):
    from deltaforge_spark.operators.dedup import minhash_lsh_pairs, minhash_signatures

    outs = []
    for d in _layouts(docs):
        sig = minhash_signatures(d, text_col="text", id_col="doc_id", num_hashes=8)
        outs.append(_rows(minhash_lsh_pairs(sig, num_hashes=8, bands=4)))
    assert outs[0] == outs[1] == outs[2] and len(outs[0]) > 0


def test_pq_encode_layout_invariant(emb):
    """Arrow batch boundaries move with the layout; codes must not."""
    from deltaforge_spark.operators.pq import pq_encode

    outs = []
    for e in _layouts(emb):
        outs.append(
            sorted((r["vec_id"], tuple(r["codes"])) for r in pq_encode(e).collect())
        )
    assert outs[0] == outs[1] == outs[2]


def test_substring_spans_layout_invariant(docs):
    from deltaforge_spark.operators.spans import duplicate_span_profile

    outs = [_rows(duplicate_span_profile(d, k=8)) for d in _layouts(docs)]
    assert outs[0] == outs[1] == outs[2]


def test_stratified_sample_layout_invariant(spark, sf_dir):
    """Hash-based selection is the whole point: identical picks under
    any partitioning (sampling.py design contract)."""
    from deltaforge_spark.operators.sampling import stratified_sample

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    outs = []
    for lay in _layouts(d):
        out = stratified_sample(
            lay, strata_col="lang", fractions={"en": 0.5, "zh": 0.2},
            default_fraction=0.1, key_col="doc_id",
        )
        outs.append(_rows(out.select("doc_id")))
    assert outs[0] == outs[1] == outs[2] and len(outs[0]) > 0


def test_bloom_probe_layout_invariant(spark):
    """Bloom claims are a pure function of the data — identical under
    any input partitioning."""
    from deltaforge_spark.operators.sketches import bloom_build, bloom_probe

    members = spark.createDataFrame(
        [("g", f"u{i}") for i in range(300)], ["g", "uid"]
    )
    probes = spark.createDataFrame([(f"u{i}",) for i in range(0, 600, 3)], ["uid"])

    def run(m, p):
        bits = bloom_build(m, ["g"], "uid")
        return {
            (r["g"], r["uid"], r["claimed"])
            for r in bloom_probe(p, bits, "uid", filter_group_cols=["g"]).collect()
        }

    assert run(members, probes) == run(members.repartition(13), probes.repartition(7))


def test_cc_logstar_layout_invariant(spark):
    from deltaforge_spark.operators.dedup import connected_components_logstar

    edges = [(i * 17 % 101, (i + 1) * 17 % 101) for i in range(60)]
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    a = {tuple(r) for r in connected_components_logstar(df).collect()}
    b = {tuple(r) for r in connected_components_logstar(df.repartition(11)).collect()}
    assert a == b and len(a) > 0
