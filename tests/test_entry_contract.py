"""Driver-contract conformance: every queries() entry vs its DuckDB oracle
at sf0.001 (fast), plus entry() smoke. The standalone
scripts/check_contract.py runs the same comparison at sf0.01 (the driver's
scale)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from scripts.check_contract import TABLES, df_to_multiset

SF = "/root/testdata/sf0.001"


def test_no_duplicate_toplevel_defs():
    """A later duplicate def silently shadows the earlier one (Python
    module semantics) — a shared helper redefined at the bottom of this
    1200-line contract file once broke three driver entries at once.
    Pin: every top-level function name in __spark_entry__.py is unique."""
    import ast
    from collections import Counter

    tree = ast.parse(open(entrymod.__file__).read())
    names = Counter(
        n.name for n in tree.body if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
    )
    dups = {k: c for k, c in names.items() if c > 1}
    assert not dups, f"duplicate top-level defs shadow each other: {dups}"


def test_every_query_has_oracle_or_is_known_rows_only():
    """Every queries() entry either has a DuckDB oracle or is on the
    explicit rows-only allowlist (approximate/xxhash-based operators whose
    correctness evidence is a pytest recall/invariant test). A new entry
    that forgets its oracle fails here instead of silently downgrading to
    the weaker rows-only driver check."""
    rows_only = {"similarity_ann_lsh", "similarity_ivf"}
    qs, os_ = set(entrymod.queries()), set(entrymod.oracle_sql())
    missing = qs - os_ - rows_only
    assert not missing, f"queries() entries without an oracle_sql(): {sorted(missing)}"
    stale = os_ - qs
    assert not stale, f"oracle_sql() keys with no queries() entry: {sorted(stale)}"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"user_id", "last_event_id", "last_event_type", "n_events", "last_ts"}
    assert all(r["last_event_type"] != "error" for r in rows)


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF)
    srows = sdf.collect()
    oracle = entrymod.oracle_sql().get(name)
    if oracle is None:
        # rows-only contract: approximate operators — must still run and
        # (except genuinely-empty results) produce rows
        assert srows is not None
        return
    cur = duck.execute(oracle)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    sc, sm = df_to_multiset(sdf.columns, [[r[c] for c in sdf.columns] for r in srows])
    oc, om = df_to_multiset(ocols, orows)
    assert sc == oc, f"{name}: column sets differ {sc} vs {oc}"
    assert len(srows) == len(orows), f"{name}: rowcount {len(srows)} vs {len(orows)}"
    assert sm == om, f"{name}: value multisets differ"
