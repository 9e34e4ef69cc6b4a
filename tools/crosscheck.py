"""Local twin of the driver's correctness harness.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at the given sf dir, comparing
row count, column-name set, and an order-insensitive value hash
(columns sorted by name, rows sorted, doubles rounded to 6).

Usage: python tools/crosscheck.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    return hashlib.md5("\n".join("|".join(r) for r in rows).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from sparksearch.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = e.queries(), e.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sp = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {str(ex)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sp)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            du = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {str(ex)[:300]}")
            n_fail += 1
            continue
        problems = []
        if len(sp) != len(du):
            problems.append(f"rows {len(sp)} vs {len(du)}")
        if sorted(sp.columns) != sorted(du.columns):
            problems.append(f"cols {sorted(sp.columns)} vs {sorted(du.columns)}")
        elif canon(sp) != canon(du):
            problems.append("value-hash mismatch")
        if problems:
            n_fail += 1
            print(f"FAIL  {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            if "value-hash mismatch" in problems and len(sp) == len(du):
                key = sorted(sp.columns)[0]
                m = sp.sort_values(list(sorted(sp.columns))).reset_index(drop=True).compare(
                    du[sp.columns].sort_values(list(sorted(sp.columns))).reset_index(drop=True)
                ) if set(sp.columns) == set(du.columns) else None
                if m is not None and len(m):
                    print(m.head(5))
        else:
            print(f"OK    {name}: {len(sp)} rows [{time.time()-t0:.1f}s]")
    print(f"\n{n_fail} failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
