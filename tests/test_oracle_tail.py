"""Oracle gate for queries past the driver's 50-entry correctness window.

The driver's per-round correctness harness compares only the first 50
``queries()`` entries against their DuckDB oracles; everything after that
would regress silently (round-4 ADVICE, medium). This test runs every TAIL
entry — index >= DRIVER_WINDOW — through the SAME compare logic
(``tools.check_correctness``: column-name set + order-insensitive
normalized value multiset) at sf0.001, so `pytest` re-verifies them every
round. If the window constant ever changes driver-side, the worst case is
overlap (some queries checked twice), never a gap, because the tail is
computed from the live ``queries()`` ordering.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from tools.check_correctness import TABLES, norm_rows  # noqa: E402

DRIVER_WINDOW = 50
SF_DIR = "/root/testdata/sf0.001"

_tail = list(entrymod.queries())[DRIVER_WINDOW:]


@pytest.fixture(scope="module")
def duck():
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", _tail)
def test_tail_query_matches_oracle(spark, duck, name):
    fn = entrymod.queries()[name]
    oracles = entrymod.oracle_sql()
    sdf = fn(spark, SF_DIR)
    srows, scols = sdf.collect(), sdf.columns
    if name not in oracles:
        assert len(srows) > 0, f"{name}: rows-only check returned 0 rows"
        return
    pdf = duck.execute(oracles[name]).df()
    dcols = [str(c) for c in pdf.columns]
    drows = list(pdf.itertuples(index=False, name=None))
    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch"
    s_n, d_n = norm_rows(scols, srows), norm_rows(dcols, drows)
    assert len(s_n) == len(d_n), \
        f"{name}: row count {len(s_n)} vs oracle {len(d_n)}"
    assert s_n == d_n, f"{name}: value multiset mismatch"
