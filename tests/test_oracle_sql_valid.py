"""Every declared oracle must be valid DuckDB SQL over the testdata
views — a seconds-fast guard (no Spark) that catches oracle-side syntax
or binding regressions before the driver's correctness gate does."""

import duckdb
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()
SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return c


def test_every_query_has_an_oracle_and_it_parses(con):
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert not set(qs) - set(oracles), "queries missing oracles"
    assert not set(oracles) - set(qs), "orphan oracles"
    bad = {}
    for name, sql in oracles.items():
        try:
            # EXPLAIN parses, binds and plans without executing
            con.execute(f"EXPLAIN {sql}")
        except Exception as ex:  # pragma: no cover - failure reporting
            bad[name] = str(ex).splitlines()[0][:200]
    assert not bad, f"invalid oracle SQL: {bad}"
