"""Deterministic sampling + sequence packing (operators/sampling.py)."""

import pyspark.sql.functions as F
import pytest

from deltaforge_spark.operators.sampling import (
    deterministic_sample,
    pack_sequences,
    sample_hash,
    stratified_sample,
    whitespace_token_count,
)


def test_sample_determinism_across_partitionings(spark):
    df = spark.range(0, 2000).select(F.col("id").alias("k"))
    a = {r["k"] for r in deterministic_sample(df, key_col="k", fraction=0.3).collect()}
    b = {
        r["k"]
        for r in deterministic_sample(
            df.repartition(13), key_col="k", fraction=0.3
        ).collect()
    }
    assert a == b and 0.2 < len(a) / 2000 < 0.4


def test_sample_fraction_monotone(spark):
    """A smaller fraction selects a strict subset of a larger one —
    the property that makes ablation ladders comparable."""
    df = spark.range(0, 1000).select(F.col("id").alias("k"))
    small = {r["k"] for r in deterministic_sample(df, key_col="k", fraction=0.1).collect()}
    big = {r["k"] for r in deterministic_sample(df, key_col="k", fraction=0.5).collect()}
    assert small <= big


def test_stratified_fractions(spark):
    rows = [(i, "en" if i % 2 == 0 else ("zh" if i % 4 == 1 else "de")) for i in range(4000)]
    df = spark.createDataFrame(rows, ["k", "lang"])
    out = stratified_sample(
        df, strata_col="lang", fractions={"en": 0.5, "zh": 0.05},
        default_fraction=0.0, key_col="k",
    )
    got = out.groupBy("lang").count().collect()
    by = {r["lang"]: r["count"] for r in got}
    assert "de" not in by  # default 0 drops the stratum entirely
    assert 800 < by["en"] < 1200  # ~0.5 of 2000
    assert 20 < by["zh"] < 90  # ~0.05 of 1000


def test_pack_sequences_greedy_boundaries(spark):
    rows = [
        ("g", 1, 100), ("g", 2, 100), ("g", 3, 100),  # 100+100 fits, +100 overflows
        ("g", 4, 300),                                  # oversized -> own bin
        ("g", 5, 10),
        ("h", 1, 250),
    ]
    df = spark.createDataFrame(rows, ["grp", "ord", "tok"])
    out = pack_sequences(df, group_col="grp", order_col="ord", token_col="tok", budget=250)
    got = {(r["grp"], r["ord"]): (r["bin"], r["bin_tokens"]) for r in out.collect()}
    assert got[("g", 1)] == (0, 100)
    assert got[("g", 2)] == (0, 200)
    assert got[("g", 3)] == (1, 100)   # 200+100 > 250 -> new bin
    assert got[("g", 4)] == (2, 300)   # oversized doc alone, over budget
    assert got[("g", 5)] == (3, 10)    # 300 is already over -> next bin
    assert got[("h", 1)] == (0, 250)   # exact fit, separate group


def test_pack_respects_order_not_input_partitioning(spark):
    rows = [("g", i, 50) for i in range(20)]
    df = spark.createDataFrame(rows, ["grp", "ord", "tok"]).repartition(7)
    out = pack_sequences(df, group_col="grp", order_col="ord", token_col="tok", budget=100)
    got = sorted((r["ord"], r["bin"]) for r in out.collect())
    # 50+50 per bin -> bins [0,0,1,1,2,2,...]
    assert [b for _, b in got] == [i // 2 for i in range(20)]


def test_whitespace_token_count(spark):
    df = spark.createDataFrame([("  a b   c ",), ("one",)], ["text"])
    got = [r["n"] for r in df.select(whitespace_token_count(F.col("text")).alias("n")).collect()]
    assert got == [3, 1]


def test_sample_hash_range(spark):
    df = spark.range(0, 100).select(sample_hash(F.col("id")).alias("h"))
    mn, mx = df.agg(F.min("h"), F.max("h")).first()
    assert mn >= 0 and mx < (1 << 48)


@pytest.mark.spark
def test_epoch_shuffle_contract(spark):
    """Dense 1..N ranks, invariant to input partitioning, independent
    permutation per epoch, rows preserved."""
    from deltaforge_spark.operators.sampling import epoch_shuffle

    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(500)], "doc_id long, text string"
    )
    out = epoch_shuffle(df, key_col="doc_id").collect()
    assert sorted(r.shuffle_rank for r in out) == list(range(1, 501))
    assert sorted(r.doc_id for r in out) == list(range(500))
    m1 = {r.doc_id: r.shuffle_rank for r in out}
    m2 = {
        r.doc_id: r.shuffle_rank
        for r in epoch_shuffle(df.repartition(7), key_col="doc_id").collect()
    }
    assert m1 == m2  # partitioning-invariant
    m_e1 = {
        r.doc_id: r.shuffle_rank
        for r in epoch_shuffle(df, key_col="doc_id", epoch=1).collect()
    }
    assert m_e1 != m1  # epochs re-shuffle


def test_mixture_sample_budget_semantics(spark, sf_dir):
    """Budgets above the stratum total keep everything; below, the kept
    token mass approximates the budget; raising a budget only ADDS
    documents (ablation monotonicity); unbudgeted strata drop."""
    from pyspark.sql import functions as F

    from deltaforge_spark.operators.sampling import mixture_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    totals = {
        r["lang"]: r["t"]
        for r in docs.groupBy("lang")
        .agg(F.sum(F.size(F.split(F.trim(F.col("text")), " +"))).alias("t"))
        .collect()
    }

    # budget >> total: every en doc kept, other strata dropped
    all_en = mixture_sample(docs, strata_col="lang", token_budgets={"en": 10**9})
    assert all_en.count() == docs.filter(F.col("lang") == "en").count()
    assert {r["lang"] for r in all_en.select("lang").distinct().collect()} == {"en"}

    # fractional budget: kept mass lands near the budget
    b = totals["en"] // 2
    half = mixture_sample(docs, strata_col="lang", token_budgets={"en": b})
    kept = half.agg(
        F.sum(F.size(F.split(F.trim(F.col("text")), " +")))
    ).collect()[0][0]
    assert 0.5 * b <= kept <= 1.5 * b  # Poisson variance band at small n

    # monotone: the half-budget selection is a subset of the full one
    half_ids = {r["doc_id"] for r in half.select("doc_id").collect()}
    full_ids = {r["doc_id"] for r in all_en.select("doc_id").collect()}
    assert half_ids <= full_ids


def test_epoch_shuffle_manifest_barrier_identical(spark, tmp_path):
    """The durable manifest barrier (cluster default) yields exactly
    the ranks the localCheckpoint path yields, and the manifest is a
    replayable artifact on storage."""
    import glob

    from deltaforge_spark.operators.sampling import epoch_shuffle

    df = spark.createDataFrame([(i, f"d{i}") for i in range(200)], ["doc_id", "text"])
    local = {r["doc_id"]: r["shuffle_rank"] for r in epoch_shuffle(df, key_col="doc_id").collect()}
    mpath = str(tmp_path / "epoch0")
    durable = {
        r["doc_id"]: r["shuffle_rank"]
        for r in epoch_shuffle(df, key_col="doc_id", manifest_path=mpath).collect()
    }
    assert local == durable
    assert glob.glob(f"{mpath}/part-*.parquet")
    # the artifact replays without recomputation
    again = {r["doc_id"]: r["shuffle_rank"] for r in spark.read.parquet(mpath).collect()}
    assert again == local


class TestTemperatureMixture:
    def test_higher_temperature_boosts_tail_share(self, spark, sf_dir):
        """T=1 keeps strata proportional; T=4 flattens — the smallest
        stratum's share of kept tokens must not shrink as T rises."""
        from deltaforge_spark.operators.sampling import temperature_mixture
        from deltaforge_spark.sources import read_table
        from pyspark.sql import functions as F

        docs = read_table(spark, sf_dir, "documents")
        tok = F.size(F.split(F.trim(F.col("text")), " +"))

        def share_of_smallest(t):
            kept = temperature_mixture(
                docs, strata_col="lang", total_token_budget=3000, temperature=t
            )
            per = {
                r["lang"]: r["n"]
                for r in kept.groupBy("lang").agg(F.sum(tok).alias("n")).collect()
            }
            total = sum(per.values())
            base = {
                r["lang"]: r["n"]
                for r in docs.groupBy("lang").agg(F.sum(tok).alias("n")).collect()
            }
            smallest = min(base, key=base.get)
            return per.get(smallest, 0) / total

        s1, s4 = share_of_smallest(1.0), share_of_smallest(4.0)
        assert s4 >= s1

    def test_budget_roughly_met(self, spark, sf_dir):
        from deltaforge_spark.operators.sampling import temperature_mixture
        from deltaforge_spark.sources import read_table
        from pyspark.sql import functions as F

        docs = read_table(spark, sf_dir, "documents")
        tok = F.size(F.split(F.trim(F.col("text")), " +"))
        kept = temperature_mixture(
            docs, strata_col="lang", total_token_budget=3000, temperature=2.0
        )
        total = kept.agg(F.sum(tok)).collect()[0][0]
        # Poisson selection: expect within a generous band of the budget
        assert 1500 <= total <= 4500, total
