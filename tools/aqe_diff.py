"""AQE re-shape audit: run join-heavy kernels at sf0.1 and sf1 and
record what Spark's adaptive execution changed between the scales —
which joins stayed broadcast, which flipped to shuffle strategies, and
where AQE coalesced or skew-split shuffle reads (VERDICT r6 #1:
"record which plans AQE re-shapes").

Usage: python tools/aqe_diff.py [sf1_dir]
Updates SF1_SOAK.json ("aqe" key) and prints the per-query table.

Method: each kernel is executed to completion (collect) so the
AdaptiveSparkPlan finalizes, then the *final* physical plan string is
scanned for join-strategy and AQEShuffleRead markers. Compare counts
across the two SFs: identical counts = the plan shape is
scale-stable; differing counts = AQE re-shaped it, and the diff says
how. Collect is safe here: every audited kernel returns an aggregate
or bounded pair/top-k output, never the corpus.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, "/root/repo")

# Join-heavy kernels where the 10x flip risk is real: multi-join
# relational shapes, LSH candidate joins, broadcast-dimensioned
# retrieval, and the bucketized interval/as-of joins.
KERNELS = [
    "q2_min_cost_supplier",
    "q5_region_revenue",
    "q8_market_share",
    "q9_product_profit",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q20_potential_promotion",
    "q21_waiting_suppliers",
    "dedup_minhash_lsh",
    "dedup_embedding_lsh",
    "doc_bm25_search",
    "doc_oov_rate",
    "doc_contamination",
    "events_interval_join",
    "events_asof_join",
    "web_triangles",
    "basket_brand_lift",
    # r8 additions: the gid decision join, the recall audit's twin
    # pair joins, and the leakage-safe split's label join
    "cdc_pgoutput_two_phase",
    "dedup_lsh_recall",
    "dataset_split_leakage_safe",
    "customer_value_deciles_sampled",
    # r13 additions: the DSIR broadcast score join, the classifier's
    # per-round feature joins, the containment inverted-index self-join,
    # and the hybrid fuse's bounded full-outer merge
    "doc_dsir_weights",
    "doc_quality_classifier",
    "dedup_containment",
    "similarity_hybrid_rrf",
]

MARKERS = {
    "bhj": r"\bBroadcastHashJoin\b",
    "smj": r"\bSortMergeJoin\b",
    "shj": r"\bShuffledHashJoin\b",
    "bnlj": r"\bBroadcastNestedLoopJoin\b",
    "coalesced": r"\bAQEShuffleRead coalesced\b",
    "skewed": r"\bskewed=true\b",
}


def plan_counts(df) -> dict[str, int]:
    df.collect()  # finalize the adaptive plan
    s = df._jdf.queryExecution().executedPlan().toString()
    return {k: len(re.findall(rx, s)) for k, rx in MARKERS.items()}


def main() -> None:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/deltaforge-testdata/sf1"
    sf01_dir = "/root/testdata/sf0.1"

    import __spark_entry__ as entry
    from deltaforge_spark.session import get_spark

    spark = get_spark("aqe-diff")
    qs = entry.queries()

    out: dict[str, dict] = {}
    for name in KERNELS:
        fn = qs[name]
        a = plan_counts(fn(spark, sf01_dir))
        b = plan_counts(fn(spark, sf1_dir))
        reshaped = {k: [a[k], b[k]] for k in MARKERS if a[k] != b[k]}
        out[name] = {"sf0.1": a, "sf1": b, "reshaped": reshaped}
        flag = " RESHAPED " + json.dumps(reshaped) if reshaped else ""
        print(f"{name}: sf0.1={a} sf1={b}{flag}", file=sys.stderr, flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "SF1_SOAK.json")
    doc = {}
    if os.path.exists(path):
        with open(path) as f:
            doc = json.load(f)
    doc["aqe"] = out
    doc["aqe_reshaped"] = sorted(k for k, v in out.items() if v["reshaped"])
    with open(path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(json.dumps({"reshaped": doc["aqe_reshaped"]}))


if __name__ == "__main__":
    main()
