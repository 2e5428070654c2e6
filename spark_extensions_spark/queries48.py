"""t2 query registry, batch 48: Wilcoxon signed-rank paired test.

Registered into the shared registry (imported from queries47 at module
end). Same determinism rules as the queries.py docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_extensions_spark.operators.stats import (
    wilcoxon_oracle_sql,
    wilcoxon_signed_rank,
)
from spark_extensions_spark.queries import _register, _t

_WX_SPLIT = "1998-01-01"

_WX_PAIRS_DUCK = f"""
  SELECT o_custkey,
         CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '{_WX_SPLIT}'
              THEN CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
              ELSE 0 END) AS BIGINT)
         - CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '{_WX_SPLIT}'
              THEN CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
              ELSE 0 END) AS BIGINT) AS diff_cents
  FROM orders
  GROUP BY o_custkey
  HAVING COUNT(*) FILTER (o_orderdate < TIMESTAMP '{_WX_SPLIT}') > 0
     AND COUNT(*) FILTER (o_orderdate >= TIMESTAMP '{_WX_SPLIT}') > 0
"""


@_register(
    "stat_wilcoxon",
    wilcoxon_oracle_sql(_WX_PAIRS_DUCK, "diff_cents"),
    doc="Wilcoxon signed-rank paired test (operators/stats.py:"
    "wilcoxon_signed_rank; Wilcoxon 1945) — did per-customer spend "
    "shift between the early and late halves of the order history? "
    "Pairs are exact-cent spend diffs for customers active in BOTH "
    "halves; zero diffs dropped per the classical definition; tied "
    "|diff| blocks take average ranks carried DOUBLED so every rank "
    "sum is an exact BIGINT (the mannwhitney cumulative trick). ONE "
    "hash agg to the |diff| domain + a domain-sized cumulative "
    "window; z is the shared-formula double. Completes the "
    "nonparametric battery (KS/MWU/Kendall/Spearman/Wilcoxon).",
)
def q_stat_wilcoxon(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    cents = F.expr(
        "cast(floor(o_totalprice * 100 + 0.5d) as bigint)"
    )
    early = F.col("o_orderdate") < _WX_SPLIT
    pairs = (
        o.groupBy("o_custkey")
        .agg(
            F.sum(F.when(early, cents).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("a"),
            F.sum(F.when(~early, cents).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("b"),
            F.count(F.when(early, 1)).alias("na"),
            F.count(F.when(~early, 1)).alias("nb"),
        )
        .where((F.col("na") > 0) & (F.col("nb") > 0))
        .select((F.col("a") - F.col("b")).alias("diff_cents"))
    )
    return wilcoxon_signed_rank(pairs, "diff_cents")
