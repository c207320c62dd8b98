"""tools/check.py fast-oracle twins (VERDICT r12 #7): the Python fold
substituted for DuckDB's O(n^2) recursive CTE at sf1 scale must agree
with the declared SQL oracle ROW-FOR-ROW — otherwise the sf1 speedup
silently changes what the gate verifies."""

import sys

import duckdb

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")


def _con(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return con


def test_pack_sequences_fold_matches_recursive_cte():
    import check as checkmod
    import __spark_entry__ as entry

    sql = entry.oracle_sql()["doc_pack_sequences"]
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        con = _con(sf_dir)
        cols, rows = checkmod.FAST_ORACLES["doc_pack_sequences"](con)
        res = con.execute(sql)
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        assert cols == dcols
        assert sorted(rows) == sorted(drows), sf_dir


def test_fast_oracle_gated_to_scale():
    """The declared SQL oracle (what the driver runs) stays exercised
    at the driver tiers — the fold only substitutes past 10k docs."""
    import check as checkmod

    assert not checkmod._fast_oracle_scale(_con("/root/testdata/sf0.01"))
