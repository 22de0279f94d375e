"""Fast driver-contract guard (no Spark): every queries() entry has an
oracle_sql() entry, and every oracle parses + binds in DuckDB against
the real sf0.001 tables. Catches renamed columns, SQL typos, and
missing fixtures in seconds — the full value-hash sweep
(scripts/check_oracle.py) remains the correctness gate."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def entry():
    import __spark_entry__ as e

    return e


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def test_every_query_has_an_oracle(entry):
    qs, os_ = entry.queries(), entry.oracle_sql()
    missing = sorted(set(qs) - set(os_))
    assert not missing, f"queries without oracle SQL: {missing}"
    orphans = sorted(set(os_) - set(qs))
    assert not orphans, f"oracles without queries: {orphans}"


def test_every_oracle_binds_in_duckdb(entry, con):
    bad = {}
    for name, sql in entry.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001
            bad[name] = str(e)[:200]
    assert not bad, f"oracle SQL fails to bind: {bad}"


def test_fixture_files_exist(entry):
    """Frozen-oracle rows reference parquet fixtures — they must be
    committed (a regenerated-but-unstaged fixture silently breaks the
    driver gate)."""
    import re

    for name, sql in entry.oracle_sql().items():
        for m in re.finditer(r"read_parquet\('([^']+)'", sql):
            path = m.group(1)
            if "*" in path:
                import glob

                assert glob.glob(path), f"{name}: no match for {path}"
            else:
                assert os.path.exists(path), f"{name}: missing {path}"
