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
