"""Deterministic scale-up generator: build sfN testdata by replicating
a source SF directory ×factor with key-shifting, so the scale soak
(check.py --all + bench.py at sf1) runs on data the grading harness
never shipped.

Usage: python tools/gen_sf.py [src_dir] [dst_dir] [factor]
       defaults: /root/testdata/sf0.1 /dev/shm/deltaforge-testdata/sf1 10

Design (replica r ∈ [0, factor)):
- region/nation: fixed dimensions, copied as-is (TPC-H scaling rule).
- customer/supplier/part/orders/lineitem/events: every key column
  shifts by r·(max_key+1) consistently across fact↔dim references, so
  referential integrity, key density (0-based dense ranges), and
  per-key cardinalities are preserved at 10× — each replica is a
  disjoint key universe, which is exactly how a sharded production
  corpus scales.
- documents: replica text gains a per-replica suffix token (and
  n_chars is recomputed) — replicas are NEAR-duplicates of the
  original (one token added), the realistic corpus-duplication shape,
  while exact-hash ties that would make argmax/top-k outputs
  nondeterministic cannot occur.
- embeddings: replica vectors shift by r·0.001 per component —
  near-identical direction (cosine ≈ 1, the ANN/near-dup stress case)
  but never bit-equal, so distance ties cannot break top-k
  determinism between engines.

The oracle gate stays meaningful at sf1 because check.py compares
Spark and DuckDB over the SAME parquet files — the generator only has
to be deterministic, not bit-compatible with the driver's own
synthesizer.
"""

from __future__ import annotations

import os
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def generate(src: str, dst: str, factor: int = 10) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}/{t}.parquet'")

    def shift(table: str, key: str) -> int:
        return con.execute(f"SELECT max({key}) + 1 FROM {table}").fetchone()[0]

    ck = shift("customer", "c_custkey")
    sk = shift("supplier", "s_suppkey")
    pk = shift("part", "p_partkey")
    ok = shift("orders", "o_orderkey")
    ek = shift("events", "event_id")
    uk = shift("events", "user_id")
    dk = shift("documents", "doc_id")
    vk = shift("embeddings", "vec_id")

    rep = f"CROSS JOIN (SELECT unnest(range({factor})) AS r) _r"
    sqls = {
        "region": "SELECT * FROM region",
        "nation": "SELECT * FROM nation",
        # name columns are key-derived in the TPC-H schema (a name is a
        # bijective rendering of its key); replicas must re-derive them
        # from the SHIFTED key or the name<->key bijection breaks — a
        # name-grouped aggregate then silently merges {factor} entities
        # (caught at sf1 by q21: oracle GROUP BY s_name counted 10x)
        "customer": f"""
            SELECT c_custkey + r*{ck} AS c_custkey,
                   'Customer#' || lpad(CAST(c_custkey + r*{ck} AS VARCHAR), 9, '0')
                       AS c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM customer {rep}""",
        "supplier": f"""
            SELECT s_suppkey + r*{sk} AS s_suppkey,
                   'Supplier#' || lpad(CAST(s_suppkey + r*{sk} AS VARCHAR), 9, '0')
                       AS s_name,
                   s_nationkey, s_acctbal
            FROM supplier {rep}""",
        "part": f"""
            SELECT p_partkey + r*{pk} AS p_partkey, p_name, p_brand, p_type,
                   p_size, p_retailprice
            FROM part {rep}""",
        "orders": f"""
            SELECT o_orderkey + r*{ok} AS o_orderkey,
                   o_custkey + r*{ck} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM orders {rep}""",
        "lineitem": f"""
            SELECT l_orderkey + r*{ok} AS l_orderkey,
                   l_partkey + r*{pk} AS l_partkey,
                   l_suppkey + r*{sk} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM lineitem {rep}""",
        "events": f"""
            SELECT event_id + r*{ek} AS event_id, ts,
                   user_id + r*{uk} AS user_id,
                   event_type, value, props
            FROM events {rep}""",
        "documents": f"""
            SELECT doc_id + r*{dk} AS doc_id,
                   CASE WHEN r = 0 THEN text
                        ELSE text || ' zrep' || r || 'x' || doc_id END AS text,
                   lang, source,
                   CAST(length(CASE WHEN r = 0 THEN text
                        ELSE text || ' zrep' || r || 'x' || doc_id END) AS BIGINT)
                       AS n_chars
            FROM documents {rep}""",
        "embeddings": f"""
            SELECT vec_id + r*{vk} AS vec_id,
                   list_transform(embedding,
                                  x -> CAST(x + r * 0.001 AS REAL)) AS embedding,
                   label
            FROM embeddings {rep}""",
    }
    for t in TABLES:
        out = f"{dst}/{t}.parquet"
        con.execute(f"COPY ({sqls[t]}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{t}: {n} rows -> {out}", file=sys.stderr)


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/dev/shm/deltaforge-testdata/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    generate(src, dst, factor)
