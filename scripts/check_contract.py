"""Self-check of the __spark_entry__ contract — mimics the driver:
runs each queries()[name] on Spark and oracle_sql()[name] on DuckDB at
sf0.01, compares row count + column names + order-insensitive values.

Usage: python scripts/check_contract.py [name ...]
"""

from __future__ import annotations

import math
import sys
import time
from datetime import datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def df_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        t = tuple(norm_cell(r[i]) for i in order)
        out[t] = out.get(t, 0) + 1
    return sorted(cols), out


def main(names=None):
    import __spark_entry__ as entrymod
    from cht_sync_spark.session import get_spark

    spark = get_spark("contract_check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = names or list(qs)
    failures = []
    timings: dict[str, float] = {}
    for name in names:
        t0 = time.monotonic()
        try:
            sdf = qs[name](spark, SF)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error {str(e)[:200]}")
            continue
        spark_s = time.monotonic() - t0
        if name not in oracles:
            timings[name] = spark_s
            print(f"ROWS  {name}: {len(srows)} rows (no oracle — rows-only) [{spark_s:.1f}s]")
            if len(srows) == 0 and name != "dedup_embedding_cosine":
                failures.append((name, "0 rows on rows-only check"))
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error {str(e)[:200]}")
            continue
        timings[name] = time.monotonic() - t0
        sc, sm = df_to_multiset(scols, [[r[c] for c in scols] for r in srows])
        oc, om = df_to_multiset(ocols, orows)
        if sc != oc:
            failures.append((name, f"columns differ: {sc} vs {oc}"))
            print(f"FAIL  {name}: columns {sc} != {oc}")
        elif len(srows) != len(orows):
            failures.append((name, f"rowcount {len(srows)} vs {len(orows)}"))
            print(f"FAIL  {name}: rowcount {len(srows)} != {len(orows)}")
        elif sm != om:
            only_s = [k for k in sm if sm[k] != om.get(k)][:3]
            only_o = [k for k in om if om[k] != sm.get(k)][:3]
            failures.append((name, f"values differ; spark-only={only_s} oracle-only={only_o}"))
            print(f"FAIL  {name}: values differ\n  spark-only: {only_s}\n  oracle-only: {only_o}")
        else:
            print(f"OK    {name}: {len(srows)} rows [{timings[name]:.1f}s]")
    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    if timings:
        total = sum(timings.values())
        print(f"total wall {total:.1f}s over {len(timings)} entries; slowest:")
        for n, s in sorted(timings.items(), key=lambda kv: -kv[1])[:15]:
            print(f"  {s:6.1f}s  {n}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or None))
