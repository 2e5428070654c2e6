"""Materialize a synthetic sf1 fixture directory: 10 FK-consistent
shifted copies of the sf0.1 tables (VERDICT r5 #6 — the full-registry
scale-cliff run needs a complete sf1-shaped directory, which the
driver doesn't ship).

Key strides keep every FK relationship intact per copy (copy i's
orders reference copy i's customers, etc.); nation/region stay
UNSHIFTED single copies so the dimension joins fan IN exactly like a
real 10x corpus (every copy shares the same 25-nation world — also the
realistic skew shape).

Usage: python tools/make_sf1.py [out_dir] [k] [src_sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spark_extensions_spark.session import (  # noqa: E402
    ALL_TABLES,
    get_spark,
    load_tables,
)

# column -> per-copy stride; FK pairs share a stride so joins survive
STRIDES: dict[str, dict[str, int]] = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": 10_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "part": {"p_partkey": 10_000_000},
    "orders": {"o_orderkey": 100_000_000, "o_custkey": 10_000_000},
    "lineitem": {
        "l_orderkey": 100_000_000,
        "l_partkey": 10_000_000,
        "l_suppkey": 1_000_000,
    },
    "events": {"event_id": 1_000_000_000, "user_id": 10_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_spark("make_sf1")
    tables = load_tables(spark, src, *ALL_TABLES)
    os.makedirs(out, exist_ok=True)
    for name in ALL_TABLES:
        df = tables[name]
        strides = STRIDES[name]
        dest = os.path.join(out, f"{name}.parquet")
        if not strides:  # unscaled dims
            copies = [df]
        else:
            copies = []
            for i in range(k):
                p = df
                for c, stride in strides.items():
                    dt = dict(df.dtypes)[c]
                    p = p.withColumn(
                        c, (F.col(c) + F.lit(i * stride)).cast(dt)
                    )
                copies.append(p)
        outdf = copies[0]
        for p in copies[1:]:
            outdf = outdf.unionAll(p)
        outdf.write.mode("overwrite").parquet(dest)
        n = spark.read.parquet(dest).count()
        print(f"{name}: {n} rows -> {dest}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
