"""Materialize a synthetic sf1 fixture directory: 10 FK-consistent
shifted copies of the sf0.1 tables (VERDICT r5 #6 — the full-registry
scale-cliff run needs a complete sf1-shaped directory, which the
driver doesn't ship).

Key strides keep every FK relationship intact per copy (copy i's
orders reference copy i's customers, etc.); nation/region stay
UNSHIFTED single copies so the dimension joins fan IN exactly like a
real 10x corpus (every copy shares the same 25-nation world — also the
realistic skew shape).

Usage: python tools/make_sf1.py [out_dir] [k] [src_sf_dir] [--zipf [alpha]]

``--zipf`` (VERDICT r8 #1) produces the SKEWED variant of the same
fixture: every gate in the repo runs on uniformly-distributed keys,
yet production 100 TB joins and windows die on Zipfian key skew — the
one unmeasured scale risk. The variant keeps row counts and FK
integrity identical to the uniform fixture and re-draws only the
distribution of three hot surfaces:

- ``orders.o_custkey``  → bounded-Zipf(alpha, 10·|customer|) draw
- ``lineitem.l_partkey`` → bounded-Zipf(alpha, 10·|part|) draw
- ``events.ts``          → one hot day absorbing ~25% of all events
  (time-of-day preserved, so session/tumbling windows still spread)

Draw mechanics: u = xxhash64(row pk) mapped to [0,1) (deterministic,
seed-free), rank = inverse-CDF of the bounded zeta distribution
    rank = floor((1 - u·(1 - N^(1-alpha)))^(-1/(alpha-1)))
(frequency ∝ rank^-alpha, the textbook Zipf tail; alpha defaults to
1.1 — hot enough that the single hottest customer takes ~2-3% of all
orders at N = 150k), then rank maps back into the striped key layout
(idx = rank % per_copy, copy = rank // per_copy) so every drawn key
EXISTS in the dimension table and joins stay referentially intact.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Column, DataFrame  # noqa: E402
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


def zipf_rank(u: Column, n_keys: int, alpha: float) -> Column:
    """Inverse-CDF of the bounded zeta distribution: u in [0,1) ->
    0-based rank in [0, n_keys), frequency ∝ (rank+1)^-alpha.
    alpha == 1 takes the log-form limit (F(k) = ln k / ln N →
    k = N^u); the natural value to sweep when calibrating skew."""
    if abs(alpha - 1.0) < 1e-9:
        k_cont = F.pow(F.lit(float(n_keys)), u)
    else:
        b = 1.0 - float(n_keys) ** (1.0 - alpha)
        k_cont = F.pow(
            F.lit(1.0) - u * F.lit(b), F.lit(-1.0 / (alpha - 1.0))
        )
    rank = (F.floor(k_cont) - F.lit(1)).cast("bigint")
    return F.greatest(F.lit(0), F.least(rank, F.lit(n_keys - 1)))


def _unit_hash(*cols: str) -> Column:
    """Deterministic seed-free uniform draw in [0,1) from row identity.

    40 hash bits (ADVICE r9): u resolution must exceed the key-domain
    size or the inverse-CDF quantizes the Zipf tail — 20 bits capped
    distinct ranks at ~1M while sf1 draws 1.5M+ keys.
    """
    return (F.pmod(F.xxhash64(*cols), F.lit(1 << 40)) / float(1 << 40)).cast(
        "double"
    )


def apply_zipf_skew(
    name: str,
    outdf: DataFrame,
    per_copy: dict[str, int],
    k: int,
    alpha: float,
) -> DataFrame:
    """Re-draw the hot join keys of one scaled table (see module doc)."""
    def remap(df, key_col, u, n_per_copy, stride):
        rank = zipf_rank(u, n_per_copy * k, alpha)
        dt = dict(df.dtypes)[key_col]
        return df.withColumn(
            key_col,
            (
                F.pmod(rank, F.lit(n_per_copy))
                + F.lit(stride) * (rank / F.lit(n_per_copy)).cast("bigint")
            ).cast(dt),
        )

    if name == "orders":
        return remap(
            outdf,
            "o_custkey",
            _unit_hash("o_orderkey"),
            per_copy["customer"],
            STRIDES["customer"]["c_custkey"],
        )
    if name == "lineitem":
        return remap(
            outdf,
            "l_partkey",
            _unit_hash("l_orderkey", "l_linenumber"),
            per_copy["part"],
            STRIDES["part"]["p_partkey"],
        )
    if name == "events":
        # one hot day absorbing ~25% of events, time-of-day preserved
        hot = F.to_timestamp(F.lit("2024-03-15"))
        return outdf.withColumn(
            "ts",
            F.when(
                F.pmod(F.xxhash64("event_id"), F.lit(4)) == 0,
                hot + (F.col("ts") - F.date_trunc("day", F.col("ts"))),
            ).otherwise(F.col("ts")),
        )
    return outdf


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    zipf = "--zipf" in sys.argv
    alpha = 1.1
    if zipf:
        zi = sys.argv.index("--zipf")
        if zi + 1 < len(sys.argv) and not sys.argv[zi + 1].startswith("--"):
            try:
                alpha = float(sys.argv[zi + 1])
                args = [a for a in args if a != sys.argv[zi + 1]]
            except ValueError:
                pass
    out = args[0] if len(args) > 0 else "/tmp/sf1"
    k = int(args[1]) if len(args) > 1 else 10
    src = args[2] if len(args) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("make_sf1")
    tables = load_tables(spark, src, *ALL_TABLES)
    os.makedirs(out, exist_ok=True)
    per_copy = {
        "customer": tables["customer"].count(),
        "part": tables["part"].count(),
    }
    if zipf:
        # The Zipf remap (pmod(rank, n) + stride*copy) assumes DENSE
        # 0-BASED dimension keys; on 1-based TPC-H data rank 0 — the
        # single hottest key — would map to a nonexistent key and
        # silently orphan the head of the distribution (ADVICE r9).
        # Fail loudly instead.
        for dim, key in (("customer", "c_custkey"), ("part", "p_partkey")):
            lo, hi = tables[dim].agg(
                F.min(key), F.max(key)
            ).first()
            n = per_copy[dim]
            if lo != 0 or hi != n - 1:
                raise SystemExit(
                    f"--zipf requires dense 0-based {key}: got "
                    f"min={lo} max={hi} count={n}; offset the source "
                    f"keys (key - min) before scaling"
                )
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
        if zipf:
            outdf = apply_zipf_skew(name, outdf, per_copy, k, alpha)
        outdf.write.mode("overwrite").parquet(dest)
        n = spark.read.parquet(dest).count()
        print(f"{name}: {n} rows -> {dest}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
