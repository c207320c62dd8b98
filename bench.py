"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "events_per_sec": ...}

The comparable BASELINE path (BASELINE.md) is CDC event throughput:
decode → filter/flatten/envelope → sink. We report wall-clock per
query plus events/s on that pipeline; each query is fully materialized
through Spark's noop sink (no driver collect overhead).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from deltaforge_spark.session import get_spark


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def cdc_pipeline(spark, sf_dir):
    """The BASELINE-comparable path: change-event decode → filter →
    flatten → native envelope (JSON serialize)."""
    from deltaforge_spark.operators import FilterSpec, apply_filter, envelope_native, flatten_events
    from deltaforge_spark.sources import change_feed

    df = change_feed(spark, sf_dir)
    df = apply_filter(df, FilterSpec(ops=["c", "u", "d"], fields=[{"field": "value", "op": "gte", "value": 1}]))
    df = envelope_native(df)
    return df.select("value", "event_id", "op")


HEADLINE = [
    "cdc_changefeed",
    "cdc_filter_fields",
    "cdc_flatten",
    "cdc_envelope_roundtrip",
    "cdc_upsert_materialize",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "events_sessionization",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "text_analysis",
    "similarity_bruteforce",
    "multimodal_image_meta",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    import __spark_entry__ as entry

    qs = entry.queries()

    # warm the JVM/codegen path once with a trivial job
    spark.range(1000).select(F.sum("id")).collect()

    timings: dict[str, float] = {}

    # CDC throughput path (events/s, BASELINE-comparable)
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    t0 = time.perf_counter()
    materialize(cdc_pipeline(spark, sf_dir))
    cdc_sec = time.perf_counter() - t0
    timings["cdc_pipeline"] = round(cdc_sec, 3)
    ev_per_sec = n_events / cdc_sec if cdc_sec > 0 else 0.0

    for name in HEADLINE:
        if name not in qs:
            continue
        t0 = time.perf_counter()
        materialize(qs[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "events_per_sec": round(ev_per_sec),
                "n_events": n_events,
            }
        )
    )


if __name__ == "__main__":
    main()
