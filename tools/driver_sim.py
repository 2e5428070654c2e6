"""Simulate the driver's correctness gate seams exactly:

- a VANILLA SparkSession (bare builder — none of get_spark's confs),
- run from a FOREIGN working directory (not the repo root),
- __spark_entry__ imported by path, queries at sf0.01 vs DuckDB.

Catches anything that silently depends on session defaults (ANSI,
timezone, shuffle partitions, Arrow) or on cwd-relative paths.  Run it
whenever session confs or path handling change (NOTES.md).

Usage: python tools/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    os.chdir("/tmp")  # foreign cwd — the driver does not run from the repo
    sys.path.insert(0, REPO)

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry
    from spark_extensions_spark.session import ALL_TABLES
    from spark_extensions_spark.testing import compare_result_sets

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver_sim")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in ALL_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            if name not in oracles:
                sdf.limit(5).collect()
                n_rows_only += 1
                print(f"ROWS {name}", flush=True)
                continue
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            ddf = con.sql(oracles[name])
            problems = compare_result_sets(
                scols, srows, list(ddf.columns), ddf.fetchall()
            )
            if not problems:
                n_pass += 1
            else:
                n_fail += 1
                print(f"FAIL {name}: " + "; ".join(problems)[:300], flush=True)
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            print(f"FAIL {name}: {str(e)[:300]}", flush=True)
    print(f"{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
