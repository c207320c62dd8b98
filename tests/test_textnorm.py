"""Unicode normalization + char-entropy operators (operators/textnorm.py)."""

import math

import pytest
from pyspark.sql import functions as F

from deltaforge_spark.operators.textnorm import (
    char_entropy_documents,
    clean_text,
    normalize_documents,
    normalize_text,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # decomposed e + COMBINING ACUTE -> must compose to é
        (0, "café time"),
        # control bytes stripped, whitespace runs collapsed, trimmed
        (1, "  a\x00b\x07c\td\n e  "),
        # already clean: normalization is identity
        (2, "plain ascii"),
        (3, ""),
        # single repeated char: entropy 0
        (4, "aaaa"),
        # uniform two-char: entropy exactly 1 bit
        (5, "abab"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestNormalize:
    def test_nfc_composes(self, docs):
        out = {
            r["doc_id"]: r["text_norm"]
            for r in normalize_documents(docs).collect()
        }
        assert out[0] == "café time"
        assert len(out[0]) == 9  # composed: é is ONE char

    def test_control_strip_and_ws_collapse(self, docs):
        out = {
            r["doc_id"]: r["text_norm"]
            for r in normalize_documents(docs).collect()
        }
        assert out[1] == "abc d e"
        assert out[2] == "plain ascii"
        assert out[3] == ""

    def test_lengths(self, docs):
        rows = {r["doc_id"]: r for r in normalize_documents(docs).collect()}
        assert rows[0]["n_chars_raw"] == 10  # decomposed counts 2 for é
        assert rows[0]["n_chars_norm"] == 9
        assert rows[2]["n_chars_raw"] == rows[2]["n_chars_norm"]

    def test_map_only_plan(self, docs):
        plan = normalize_documents(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestCharEntropy:
    def test_known_values(self, docs):
        rows = {r["doc_id"]: r for r in char_entropy_documents(docs).collect()}
        assert rows[4]["char_entropy"] == 0.0
        assert rows[4]["n_distinct"] == 1 and rows[4]["n_chars"] == 4
        assert rows[5]["char_entropy"] == 1.0
        # "café time": 10 cps, counts {c:1,a:1,f:1,e:2,́:1,' ':1,t:1,i:1,m:1}
        n, s = 10.0, 2 * math.log2(2)
        assert rows[0]["char_entropy"] == round(math.log2(n) - s / n, 6)
        assert rows[0]["n_distinct"] == 9

    def test_empty_doc(self, docs):
        rows = {r["doc_id"]: r for r in char_entropy_documents(docs).collect()}
        assert rows[3]["n_chars"] == 0
        assert rows[3]["n_distinct"] == 0
        assert rows[3]["char_entropy"] == 0.0

    def test_map_only_plan(self, docs):
        plan = char_entropy_documents(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
