"""Bench ↔ declared-surface contract (VERDICT r5 #7): every bench
HEADLINE kernel name must be a declared query (so a timed number always
has a correctness row behind it), the trend kernels must be either
declared queries or known synthetic bench feeds, and the driver-checked
first-50 prefix contains the queries that still need a driver row."""

import sys

sys.path.insert(0, "/root/repo")


def _entry():
    import __spark_entry__ as e

    return e


def _bench():
    import bench

    return bench


# bench-only synthetic kernels: wire/delivery feeds that exist to time
# the decode/delivery path, not oracle-checkable queries (documented in
# QUERIES.md "What the bench times")
SYNTHETIC_KERNELS = {
    "cdc_pipeline",
    "cdc_pipeline_xl",
    "cdc_binlog_decode_staged",
    "cdc_binlog_decode_staged_xl",
    "cdc_pgoutput_decode_staged",
    "cdc_delivery_kafka_wire",
    "cdc_delivery_kafka_wire_drain",
    "cdc_delivery_alo",
    "cdc_delivery_eos",
}


class TestBenchContract:
    def test_headline_subset_of_declared_queries(self):
        qs = _entry().queries()
        missing = [n for n in _bench().HEADLINE if n not in qs]
        assert missing == [], f"bench HEADLINE times undeclared names: {missing}"

    def test_headline_has_no_duplicates(self):
        hl = _bench().HEADLINE
        assert len(hl) == len(set(hl))

    def test_trend_kernels_are_declared_or_synthetic(self):
        qs = _entry().queries()
        unknown = [
            n for n in _bench().TREND_KERNELS
            if n not in qs and n not in SYNTHETIC_KERNELS
        ]
        assert unknown == [], f"trend kernels neither declared nor synthetic: {unknown}"

    def test_every_query_has_an_oracle(self):
        e = _entry()
        qs, osql = e.queries(), e.oracle_sql()
        assert sorted(set(qs) - set(osql)) == []
        assert sorted(set(osql) - set(qs)) == []

    def test_driver_prefix_contains_never_sampled_queries(self):
        """Queries without any driver row yet must sit in the first-50
        prefix the driver verifies (r5 #2 generalized: r6 gave
        cdc_binlog_datasource its row; r7's new queries are next)."""
        names = list(_entry().queries())
        for name in (
            "q2_min_cost_supplier",
            "q20_potential_promotion",
            "cdc_pgoutput_stream_decode",
            "web_triangles",
            "dataset_split_leakage_safe",
            "doc_oov_rate",
            "web_kcore",
            "events_rollup",
            "events_pivot_types",
            "customer_value_deciles",
            "customer_value_deciles_sampled",
            "doc_source_boilerplate",
        ):
            assert name in names[:50], name

    def test_queries_md_in_sync(self):
        """QUERIES.md regenerates from the declared surface — a stale
        count means someone added a query without running the doc
        generator."""
        qs = _entry().queries()
        head = open("/root/repo/QUERIES.md").read(400)
        assert f"{len(qs)} queries" in head


R7_NEW_QUERIES = [
    "q2_min_cost_supplier", "q20_potential_promotion",
    "cdc_pgoutput_stream_decode", "web_triangles",
    "dataset_split_leakage_safe", "doc_oov_rate",
    "web_kcore", "events_rollup", "events_pivot_types",
    "customer_value_deciles", "customer_value_deciles_sampled",
    "doc_source_boilerplate",
]


def test_every_new_r7_query_is_in_driver_prefix():
    """Never-driver-sampled queries must sit in the first-50 prefix the
    driver verifies; queries displaced past 50 must all have a green
    CORRECTNESS row from an earlier round (checked by name against the
    recorded artifacts)."""
    import json
    import os

    names = list(_entry().queries())
    for n in R7_NEW_QUERIES:
        assert names.index(n) < 50, f"{n} at {names.index(n)} — not driver-visible"
    prior_green = set()
    for r in range(1, 7):
        p = f"/root/repo/CORRECTNESS_r{r:02d}.json"
        if os.path.exists(p):
            rows = json.load(open(p))
            prior_green |= {
                k for k, v in rows.items()
                if v.get("hash_match") or (v.get("rows_match") and v.get("err") is None)
            }
    for n in names[50:]:
        assert n in prior_green, f"{n} displaced past 50 with no prior driver row"
