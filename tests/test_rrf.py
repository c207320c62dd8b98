"""Reciprocal-rank fusion (similarity.rrf_fuse) properties."""

from pyspark.sql import Row

from deltaforge_spark.operators.similarity import rrf_fuse


def _ranked(spark, pairs):
    return spark.createDataFrame([Row(doc_id=d, rank=r) for d, r in pairs])


def test_rrf_doc_in_both_lists_beats_single_list_tops(spark):
    dense = _ranked(spark, [(1, 1), (2, 2), (3, 3)])
    sparse = _ranked(spark, [(9, 1), (3, 2), (8, 3)])
    out = rrf_fuse(dense, sparse, k=10).collect()
    by_rank = {r["rank"]: r for r in out}
    # doc 3 appears in BOTH lists (ranks 3+2) -> 1/63+1/62 beats any
    # single-list doc, including both rank-1 docs (1/61)
    assert by_rank[1]["doc_id"] == 3
    assert by_rank[1]["rank_dense"] == 3 and by_rank[1]["rank_sparse"] == 2


def test_rrf_missing_side_is_null_and_scores_zero(spark):
    dense = _ranked(spark, [(1, 1)])
    sparse = _ranked(spark, [(2, 1)])
    rows = {r["doc_id"]: r for r in rrf_fuse(dense, sparse, k=10).collect()}
    assert rows[1]["rank_sparse"] is None and rows[2]["rank_dense"] is None
    assert rows[1]["rrf_score"] == rows[2]["rrf_score"]  # symmetric 1/61
    assert rows[1]["rank"] == 1  # equal score -> doc_id tiebreak
    assert rows[2]["rank"] == 2


def test_rrf_k_bounds_output(spark):
    dense = _ranked(spark, [(i, i) for i in range(1, 40)])
    sparse = _ranked(spark, [(i + 100, i) for i in range(1, 40)])
    out = rrf_fuse(dense, sparse, k=5).collect()
    assert len(out) == 5
    assert sorted(r["rank"] for r in out) == [1, 2, 3, 4, 5]
