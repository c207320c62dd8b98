"""sf1 scale soak: time the riskiest operators at sf0.1 vs sf1 (10x)
and record the scaling ratio — the measured evidence behind SCALE.md's
100-TB arguments (VERDICT r6 #1).

Usage: python tools/soak_sf1.py [sf1_dir]
Writes/updates SF1_SOAK.json ("kernels" key) and prints the table.

The ten kernels are the ones whose scale story is least trivial:
iterative graph joins (connected components, log-star, PageRank),
candidate-pair generation (embedding LSH, substring spans), stateful
streaming (the near-dup gate), layout writes (Z-order), bucketized
interval joins, and exact per-key window percentiles (the documented
small-scale twin of the sampled path). A healthy ratio for a 10x input
on fixed cores is ~10x or less (fixed costs amortize); super-linear
ratios are the scale bugs this soak exists to catch.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

KERNELS = [
    "dedup_connected_components",
    "dedup_cc_logstar",
    "dedup_embedding_lsh",
    "dedup_substring_spans",
    "web_pagerank",
    "web_communities",
    "lake_zorder_stats",
    "events_interval_join",
    "dedup_stream_gate",
    "events_percentiles",
    "events_sampled_percentiles",
]


def materialize(df) -> None:
    if df is not None:
        df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/deltaforge-testdata/sf1"
    sf01_dir = "/root/testdata/sf0.1"

    import __spark_entry__ as entry
    from deltaforge_spark.session import get_spark

    spark = get_spark("soak-sf1")
    qs = entry.queries()

    out: dict[str, dict] = {}
    for name in KERNELS:
        fn = qs[name]
        # warm pass at sf0.001 compiles codegen out of the timings
        materialize(fn(spark, "/root/testdata/sf0.001"))
        row: dict[str, float] = {}
        for label, d in (("sf0.1", sf01_dir), ("sf1", sf1_dir)):
            best = None
            for _ in range(2):  # min-of-2: shared-host stall insurance
                t0 = time.perf_counter()
                materialize(fn(spark, d))
                sec = time.perf_counter() - t0
                best = sec if best is None else min(best, sec)
            row[label] = round(best, 3)
        row["ratio"] = round(row["sf1"] / row["sf0.1"], 2)
        out[name] = row
        print(f"{name}: sf0.1={row['sf0.1']}s sf1={row['sf1']}s ratio={row['ratio']}x",
              file=sys.stderr, flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "SF1_SOAK.json")
    doc = {}
    if os.path.exists(path):
        with open(path) as f:
            doc = json.load(f)
    doc["kernels"] = out
    doc["sf1_rows"] = {"lineitem": 6_000_000, "events": 1_000_000,
                       "documents": 50_000, "embeddings": 20_000}
    doc["generator"] = "tools/gen_sf.py sf0.1 x10 (deterministic key-shift)"
    with open(path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
