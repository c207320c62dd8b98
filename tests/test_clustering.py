"""Distributed Lloyd's k-means (operators/clustering.py)."""

import pytest
from pyspark.sql import functions as F

from deltaforge_spark.operators.clustering import (
    MICRO,
    assign_clusters,
    kmeans_cluster_profile,
    kmeans_fit_assign,
    quantize_micro,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


@pytest.fixture(scope="module")
def two_blobs(spark):
    # ids 0,1 seed the two clusters; the rest sit clearly nearer one blob
    rows = [
        (0, [0.0, 0.0]),
        (1, [10.0, 10.0]),
        (2, [0.1, -0.1]),
        (3, [9.9, 10.2]),
        (4, [0.2, 0.1]),
        (5, [10.1, 9.8]),
        (6, [-0.2, 0.0]),
    ]
    return _vecs(spark, rows)


class TestKmeans:
    def test_two_blobs_converge(self, two_blobs):
        out = {
            r["vec_id"]: r["cluster"]
            for r in kmeans_fit_assign(two_blobs, k=2, n_iter=2).collect()
        }
        assert out[0] == out[2] == out[4] == out[6] == 0
        assert out[1] == out[3] == out[5] == 1

    def test_deterministic_and_reshard_invariant(self, two_blobs):
        a = sorted(map(tuple, kmeans_fit_assign(two_blobs, k=2, n_iter=2).collect()))
        b = sorted(
            map(
                tuple,
                kmeans_fit_assign(two_blobs.repartition(5), k=2, n_iter=2).collect(),
            )
        )
        assert a == b

    def test_empty_cluster_keeps_seed(self, spark):
        # k=3 but only two blobs: seed 2 ([0.5, 0]) loses every member
        # to seed 0 in iteration 1 and must keep its seed centroid
        rows = [
            (0, [0.0, 0.0]),
            (1, [10.0, 10.0]),
            (2, [0.5, 0.0]),
            (3, [0.1, 0.0]),
            (4, [10.1, 10.0]),
        ]
        out = kmeans_fit_assign(_vecs(spark, rows), k=3, n_iter=2).collect()
        by_id = {r["vec_id"]: r["cluster"] for r in out}
        assert by_id[1] == by_id[4] == 1
        assert by_id[0] == by_id[3] == 0
        # no crash, exactly one row per vector
        assert len(out) == 5

    def test_exact_integer_distances(self, spark):
        df = _vecs(spark, [(0, [0.0, 0.0]), (1, [1.0, 1.0]), (2, [0.25, 0.25])])
        q = df.select("vec_id", quantize_micro(F.col("embedding")).alias("_qvec"))
        a = {
            r["vec_id"]: r["sq_dist"]
            for r in assign_clusters(q, [[0, 0], [MICRO, MICRO]]).collect()
        }
        assert a[0] == 0
        assert a[1] == 0
        assert a[2] == 2 * (MICRO // 4) ** 2  # nearer [0,0]

    def test_assignment_is_map_only(self, two_blobs):
        q = two_blobs.select(
            "vec_id", quantize_micro(F.col("embedding")).alias("_qvec")
        )
        plan = (
            assign_clusters(q, [[0, 0], [MICRO, MICRO]])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan

    def test_profile_shape(self, two_blobs):
        prof = {
            r["cluster"]: r for r in kmeans_cluster_profile(two_blobs, k=2, n_iter=2).collect()
        }
        assert prof[0]["n_members"] == 4 and prof[1]["n_members"] == 3
        assert prof[0]["min_id"] == 0 and prof[1]["min_id"] == 1
        assert prof[0]["mean_sq_dist"] >= 0.0
