"""Unigram-LM perplexity scoring + weighted priority sampling
(operators/lm.py): hand-computed surprisal math, OOV smoothing,
reshard-invariance of the deterministic sample, and the 100-TB plan
shapes (no Python in the scoring path, TakeOrderedAndProject — never a
global sort — for the top-k)."""

import math

import pytest
from pyspark.sql import functions as F

from deltaforge_spark.operators.lm import (
    doc_surprisal,
    lm_normalizer,
    perplexity_filter,
    unigram_lm,
    weighted_sample,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "a a b"),
            (2, "a b c"),
            (3, "c c c c"),
        ],
        ["doc_id", "text"],
    )


class TestUnigramLm:
    def test_counts(self, docs):
        lm = {r["token"]: r["cnt"] for r in unigram_lm(docs).collect()}
        assert lm == {"a": 3, "b": 2, "c": 5}

    def test_normalizer(self, docs):
        n = lm_normalizer(unigram_lm(docs)).collect()[0]
        assert (n["n_total"], n["vocab"]) == (10, 3)

    def test_empty_tokens_dropped(self, spark):
        df = spark.createDataFrame([(1, "  a   b  ")], ["doc_id", "text"])
        lm = {r["token"]: r["cnt"] for r in unigram_lm(df).collect()}
        assert lm == {"a": 1, "b": 1}


class TestDocSurprisal:
    def _expected_micro(self, cnt, n_total=10, vocab=3):
        return round((math.log(n_total + vocab + 1) - math.log(cnt + 1)) * 1e6)

    def test_hand_computed(self, docs):
        lm = unigram_lm(docs)
        out = {r["doc_id"]: r for r in doc_surprisal(docs, lm).collect()}
        # doc 1: tokens a a b → micro surprisals 2*(ln14-ln4) + (ln14-ln3)
        micro = 2 * self._expected_micro(3) + self._expected_micro(2)
        assert out[1]["n_tokens"] == 3
        assert out[1]["avg_surprisal"] == round(micro / 3 / 1e6, 6)
        assert out[1]["ppl"] == round(math.exp(out[1]["avg_surprisal"]), 4)

    def test_oov_token_gets_smoothed_mass(self, spark, docs):
        lm = unigram_lm(docs)  # vocab {a,b,c}
        other = spark.createDataFrame([(9, "z z")], ["doc_id", "text"])
        row = doc_surprisal(other, lm).collect()[0]
        # c=0 → surprisal ln(14) - ln(1) = ln 14 per token
        assert row["avg_surprisal"] == round(round(math.log(14) * 1e6) / 1e6, 6)

    def test_rare_tokens_score_higher(self, docs):
        lm = unigram_lm(docs)
        out = {r["doc_id"]: r["avg_surprisal"] for r in doc_surprisal(docs, lm).collect()}
        # doc 3 is all 'c' (the most frequent token) → lowest surprisal
        assert out[3] < out[1] and out[3] < out[2]

    def test_filter_flag(self, docs):
        lm = unigram_lm(docs)
        mid = sorted(
            r["ppl"] for r in doc_surprisal(docs, lm).collect()
        )[1]
        out = {r["doc_id"]: r["keep"]
               for r in perplexity_filter(docs, lm, max_ppl=mid).collect()}
        assert sum(out.values()) == 2  # two docs at/below the median ppl

    def test_no_python_in_plan(self, docs):
        lm = unigram_lm(docs)
        plan = doc_surprisal(docs, lm)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestWeightedSample:
    def _docs(self, spark, n=200):
        rows = [(i, (i % 7) + 1) for i in range(n)]
        return spark.createDataFrame(rows, ["doc_id", "w"])

    def test_k_rows_deterministic(self, spark):
        df = self._docs(spark)
        a = sorted(r["doc_id"] for r in weighted_sample(df, key_col="doc_id", weight_col="w", k=20).collect())
        b = sorted(r["doc_id"] for r in weighted_sample(df, key_col="doc_id", weight_col="w", k=20).collect())
        assert len(a) == 20 and a == b

    def test_reshard_invariant(self, spark):
        df = self._docs(spark)
        a = sorted(r["doc_id"] for r in weighted_sample(df, key_col="doc_id", weight_col="w", k=20).collect())
        b = sorted(
            r["doc_id"]
            for r in weighted_sample(
                df.repartition(13, "w"), key_col="doc_id", weight_col="w", k=20
            ).collect()
        )
        assert a == b

    def test_weight_bias(self, spark):
        # weight 1000 vs weight 1: heavy rows should dominate the sample
        rows = [(i, 1000 if i < 100 else 1) for i in range(200)]
        df = spark.createDataFrame(rows, ["doc_id", "w"])
        got = [r["doc_id"] for r in weighted_sample(df, key_col="doc_id", weight_col="w", k=40).collect()]
        heavy = sum(1 for d in got if d < 100)
        assert heavy >= 35  # w ratio 1000:1 → light rows are rare draws

    def test_topk_is_take_ordered_not_global_sort(self, spark):
        df = self._docs(spark)
        plan = (
            weighted_sample(df, key_col="doc_id", weight_col="w", k=20)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "TakeOrderedAndProject" in plan


class TestBigramBackoff:
    """doc_surprisal_backoff — stupid backoff (Brants et al. 2007):
    seen bigrams score c12/c1, unseen back off to 0.4 * p_add1(w2)."""

    def test_hand_computed_seen_and_backoff(self, spark):
        from deltaforge_spark.operators.lm import doc_surprisal_backoff

        lm_corpus = spark.createDataFrame(
            [(0, "a b a b")], ["doc_id", "text"]
        )
        # LM: c(a)=2 c(b)=2, N=4 V=2; bigrams: c(a b)=2, c(b a)=1
        docs = spark.createDataFrame(
            [(1, "a b"), (2, "b q")], ["doc_id", "text"]
        )
        rows = {r["doc_id"]: r for r in doc_surprisal_backoff(docs, lm_corpus).collect()}
        # doc 1: seen bigram (a,b): sup = ln(c1=2) - ln(c12=2) = 0
        assert rows[1]["n_bigrams"] == 1
        assert rows[1]["avg_surprisal"] == 0.0
        assert rows[1]["ppl"] == 1.0
        # doc 2: (b,q) unseen, q OOV: sup = ln(N+V+1=7) - ln(0+1) + ln(2.5)
        expect = round(
            round(math.log(7.0) - math.log(1.0) + math.log(2.5), 6), 6
        )
        assert abs(rows[2]["avg_surprisal"] - expect) < 2e-6
        assert rows[2]["ppl"] == round(
            math.exp(rows[2]["avg_surprisal"]), 4
        )

    def test_short_docs_omitted_and_keep_flag(self, spark):
        from deltaforge_spark.operators.lm import doc_surprisal_backoff

        lm_corpus = spark.createDataFrame([(0, "x y")], ["doc_id", "text"])
        docs = spark.createDataFrame(
            [(1, "solo"), (2, "x y")], ["doc_id", "text"]
        )
        out = doc_surprisal_backoff(docs, lm_corpus, max_ppl=1.5).collect()
        ids = {r["doc_id"] for r in out}
        assert ids == {2}  # <2 tokens -> no bigram evidence -> omitted
        assert out[0]["keep"] is True  # seen bigram, ppl == 1.0

    def test_backoff_scores_higher_than_seen(self, spark):
        from deltaforge_spark.operators.lm import doc_surprisal_backoff

        lm_corpus = spark.createDataFrame(
            [(0, "the cat sat the cat ran")], ["doc_id", "text"]
        )
        docs = spark.createDataFrame(
            [(1, "the cat"), (2, "cat the")], ["doc_id", "text"]
        )
        rows = {r["doc_id"]: r for r in doc_surprisal_backoff(docs, lm_corpus).collect()}
        assert rows[1]["ppl"] < rows[2]["ppl"]

    def test_no_python_in_plan(self, spark):
        from deltaforge_spark.operators.lm import doc_surprisal_backoff

        lm_corpus = spark.createDataFrame([(0, "a b c")], ["doc_id", "text"])
        docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
        plan = doc_surprisal_backoff(docs, lm_corpus)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


class TestBpeTrain:
    """textanalysis.bpe_train — distributed Sennrich BPE training."""

    def test_learns_expected_merges(self, spark):
        from deltaforge_spark.operators.textanalysis import bpe_train

        # 'ab' dominates: pair (a,b) appears in every word, 5 words
        docs = spark.createDataFrame(
            [(0, "abc abd abe ab ab")], ["doc_id", "text"]
        )
        rows = bpe_train(docs, num_merges=2).collect()
        assert (rows[0]["left_sym"], rows[0]["right_sym"]) == ("a", "b")
        assert rows[0]["pair_freq"] == 5
        # merge 2: 'ab </w>' occurs twice ('ab' words); ties with
        # nothing bigger — tie-break is (cnt DESC, pair ASC)
        assert rows[1]["merge_rank"] == 2

    def test_greedy_overlap_and_weighting(self, spark):
        from deltaforge_spark.operators.textanalysis import bpe_train

        # 'aaa' x3: pair (a,a) counted at every adjacent POSITION
        # (2 per word) -> freq 6; after merging, 'aa a </w>' remains
        docs = spark.createDataFrame(
            [(0, "aaa aaa aaa")], ["doc_id", "text"]
        )
        rows = bpe_train(docs, num_merges=1).collect()
        assert (rows[0]["left_sym"], rows[0]["right_sym"], rows[0]["pair_freq"]) == (
            "a", "a", 6,
        )

    def test_early_stop_on_exhausted_vocab(self, spark):
        from deltaforge_spark.operators.textanalysis import bpe_train

        docs = spark.createDataFrame([(0, "a b")], ["doc_id", "text"])
        # each word is one char + </w>: only 2 distinct pairs exist,
        # then every word is a single symbol -> early break
        rows = bpe_train(docs, num_merges=8).collect()
        assert 0 < len(rows) < 8

    def test_matches_duckdb_oracle(self, spark):
        import duckdb
        import pandas as pd

        from deltaforge_spark.operators.textanalysis import (
            bpe_train,
            bpe_train_oracle_sql,
        )

        texts = [
            "the quick brown fox jumps over the lazy dog",
            "low lower lowest newer newest wider widest",
            "aaa aaaa aa a overlapping pairs test aaaa",
            "punctuation, and CAPS! should clean; fine 123 mixed42words",
            "",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
        )
        srows = sorted(map(tuple, bpe_train(df, num_merges=6).collect()))
        con = duckdb.connect()
        con.register("documents", pd.DataFrame({"text": texts}))
        drows = sorted(
            map(tuple, con.execute(bpe_train_oracle_sql(num_merges=6)).fetchall())
        )
        assert srows == drows

    def test_training_loop_releases_checkpoints(self, spark):
        from deltaforge_spark.operators.textanalysis import bpe_train

        def stored(spark):
            infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
            return {i.id() for i in infos if i.numCachedPartitions() > 0}

        before = stored(spark)
        docs = spark.createDataFrame(
            [(0, "the quick brown fox the lazy dog the end")],
            ["doc_id", "text"],
        )
        bpe_train(docs, num_merges=4).collect()
        leaked = stored(spark) - before
        assert not leaked, f"training rounds leaked checkpoints: {leaked}"
