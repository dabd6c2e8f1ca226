"""Driver-gate mirror: every oracle-checked queries() entry must match its
DuckDB oracle_sql() on the testdata tables (row count, column names, and an
order-insensitive value hash) — the same comparison the driver runs at
sf=0.01.  Runs at sf0.001 here for speed; ``tools/oracle_check.py`` runs
the full sf0.01 sweep standalone.
"""

import hashlib

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def canon(df: pd.DataFrame):
    df = df[sorted(df.columns)]
    rows = sorted(tuple(str(v) for v in r) for r in df.itertuples(index=False))
    h = hashlib.sha1("\n".join("|".join(r) for r in rows).encode()).hexdigest()
    return len(df), sorted(df.columns), h


ORACLE_NAMES = sorted(entry_mod.oracle_sql())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(name, con, ray_session):
    mine = entry_mod.queries()[name](SF_DIR)
    mine = mine.to_pandas() if not isinstance(mine, pd.DataFrame) else mine
    ref = con.sql(entry_mod.oracle_sql()[name]).df()
    assert canon(mine) == canon(ref)


def test_rows_only_queries_run(ray_session):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    for name in set(qs) - set(oracles):
        res = qs[name](SF_DIR)
        res = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
        assert len(res) >= 0, name


def test_entry_smoke(ray_session):
    res = entry_mod.entry()
    assert res.count() > 0
