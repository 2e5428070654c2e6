"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given scale factor, then compares row count, column names
and an order-insensitive value hash. Exact value equality ⇒ hash
equality under any driver canonicalization.

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __spark_entry__ import oracle_sql, queries  # noqa: E402
from spark_extensions_spark.session import ALL_TABLES, get_spark  # noqa: E402
from spark_extensions_spark.testing import compare_result_sets  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("verify_local")
    con = duckdb.connect()
    for t in ALL_TABLES:
        # driver fixtures are single files; Spark-written fixtures
        # (make_sf1.py output) are parquet DIRECTORIES — glob those
        p = f"{sf_dir}/{t}.parquet"
        src = f"'{p}/**/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")
    qs = queries()
    oracles = oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}", flush=True)
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)", flush=True)
            n_rowsonly += 1
            continue
        try:
            ddf = con.sql(oracles[name])
            dcols = list(ddf.columns)
            drows = ddf.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}", flush=True)
            n_fail += 1
            continue
        problems = compare_result_sets(scols, srows, dcols, drows)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems), flush=True)
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)", flush=True)
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only", flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
