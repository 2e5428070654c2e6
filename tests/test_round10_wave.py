"""Round-10 wave: ADVICE-r9 guard fixes + new gates.

- Bradley-Terry int64-headroom refusal (ADVICE r9 #2): the e13
  fixed-point multiply wraps silently in non-ANSI Spark while DuckDB
  raises; the operator must refuse loudly before the engines can
  diverge.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_bradley_terry_overflow_guard_refuses(spark):
    from spark_extensions_spark.operators.evals import (
        BT_TERM_SCALE,
        bradley_terry_strengths,
    )

    over = 9223372036854775807 // BT_TERM_SCALE + 1
    matches = spark.range(over).select(
        F.lit("a").alias("winner"),
        F.lit("a").alias("m_a"),
        F.lit("b").alias("m_b"),
    )
    with pytest.raises(ValueError, match="int64 headroom"):
        bradley_terry_strengths(matches, iters=1)


def test_bradley_terry_guard_passes_under_bound(spark):
    from spark_extensions_spark.operators.evals import bradley_terry_strengths

    matches = spark.range(10).select(
        F.when(F.col("id") % 3 == 0, "b").otherwise("a").alias("winner"),
        F.lit("a").alias("m_a"),
        F.lit("b").alias("m_b"),
    )
    rows = {r["model"]: r for r in bradley_terry_strengths(matches).collect()}
    assert set(rows) == {"a", "b"}
    assert rows["a"]["strength_e9"] > rows["b"]["strength_e9"]


def test_theil_sen_selection_distributed_and_exact(spark, sf_dir):
    """Round-10 rewrite: the slope median is picked by range-partition +
    per-partition counts + a pid-local row_number — the plan must not
    funnel the pair set through Exchange SinglePartition, and the
    selected element must equal the brute-force k-th of the full sorted
    pair list."""
    from spark_extensions_spark.queries49 import q_ts_theil_sen

    out = q_ts_theil_sen(spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan

    row = out.collect()[0]
    # brute-force twin over the same daily series
    days = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy(
            F.expr(
                "cast(datediff(date_trunc('day', o_orderdate),"
                " date'1992-01-01') as bigint)"
            ).alias("d")
        )
        .agg(
            F.sum(
                F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)")
            ).alias("y")
        )
        .collect()
    )
    pts = sorted((r["d"], r["y"]) for r in days)
    slopes = []
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            dy = pts[j][1] - pts[i][1]
            dx = pts[j][0] - pts[i][0]
            slopes.append((dy / dx, dy, dx))
    slopes.sort()
    k = (len(slopes) + 1) // 2
    med = slopes[k - 1]
    assert row["n_pairs"] == len(slopes)
    assert (row["med_dy"], row["med_dx"]) == (med[1], med[2])


def test_pq_codebooks_from_rows_matches_det(spark, sf_dir):
    """ann_ivfpq reuses the IVF coarse sample as the PQ sample when
    ksub == n_lists (saves the second two-job selection pass); the
    derived codebooks must be bit-identical to an independent
    pq_codebooks_det call."""
    from spark_extensions_spark.operators.similarity import (
        ivf_centroids_det,
        pq_codebooks_det,
        pq_codebooks_from_rows,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = ivf_centroids_det(emb, "vec_id", "embedding", 16)
    assert pq_codebooks_from_rows(rows, 8) == pq_codebooks_det(
        emb, "vec_id", "embedding", 8, 16
    )
