"""t2 query registry, batch 35: one-way ANOVA, the SCD2 point-in-time
join, and readability scoring.

Registered into the shared registry (imported from queries34 at module
end). Same determinism rules as the queries.py docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_extensions_spark.queries import _register, _t
from spark_extensions_spark.queries14 import _BASE_SQL, _SNAP_SQL


# =====================================================================
# One-way ANOVA F across all groups
# =====================================================================

@_register(
    "stat_anova",
    __import__(
        "spark_extensions_spark.operators.stats", fromlist=["x"]
    ).anova_oracle_sql("lineitem", "l_quantity", "l_returnflag"),
    doc="One-way ANOVA F statistic of quantity across the returnflag "
    "groups (operators/stats.py:anova_f): does the group mean differ "
    "more than within-group variance explains — the k-group "
    "generalization of the Welch t drift gate. Exact integer-scaled "
    "DECIMAL power sums per group (order-free), the k per-group "
    "s^2/n doubles combined in a FIXED order via a sorted-array fold, "
    "shared final double formula. One scan, two map-side-combinable "
    "aggregates.",
)
def q_stat_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.operators.stats import anova_f

    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return anova_f(li, "l_quantity", "l_returnflag")


# =====================================================================
# SCD2 point-in-time (feature-store as-of) join
# =====================================================================

_SCD2_HIST_SQL = f"""
    WITH base AS ({_BASE_SQL}), snap AS ({_SNAP_SQL}),
    changed AS (
      SELECT o.c_custkey,
             o.c_acctbal AS old_bal, o.c_mktsegment AS old_seg,
             n.c_acctbal AS new_bal, n.c_mktsegment AS new_seg,
             (o.c_acctbal IS DISTINCT FROM n.c_acctbal
              OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment) AS chg
      FROM base o JOIN snap n ON o.c_custkey = n.c_custkey
    ),
    hist AS (
      SELECT c_custkey, old_bal AS c_acctbal, old_seg AS c_mktsegment,
             CAST(1 AS BIGINT) AS valid_from,
             CAST(NULL AS BIGINT) AS valid_to
      FROM changed WHERE NOT chg
      UNION ALL
      SELECT c_custkey, old_bal, old_seg, CAST(1 AS BIGINT),
             CAST(2 AS BIGINT)
      FROM changed WHERE chg
      UNION ALL
      SELECT c_custkey, new_bal, new_seg, CAST(2 AS BIGINT),
             CAST(NULL AS BIGINT)
      FROM changed WHERE chg
      UNION ALL
      SELECT o.c_custkey, o.c_acctbal, o.c_mktsegment, CAST(1 AS BIGINT),
             CAST(2 AS BIGINT)
      FROM base o
      WHERE NOT EXISTS (SELECT 1 FROM snap n
                        WHERE n.c_custkey = o.c_custkey)
      UNION ALL
      SELECT n.c_custkey, n.c_acctbal, n.c_mktsegment, CAST(2 AS BIGINT),
             CAST(NULL AS BIGINT)
      FROM snap n
      WHERE NOT EXISTS (SELECT 1 FROM base o
                        WHERE o.c_custkey = n.c_custkey)
    )
"""


@_register(
    "join_point_in_time",
    _SCD2_HIST_SQL
    + """
    SELECT f.o_orderkey, f.ver,
           h.c_acctbal, h.c_mktsegment
    FROM (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderdate < TIMESTAMP '1997-01-01'
                  THEN CAST(1 AS BIGINT) ELSE CAST(2 AS BIGINT) END AS ver
      FROM orders
    ) f
    LEFT JOIN hist h
      ON h.c_custkey = f.o_custkey
     AND f.ver >= h.valid_from
     AND (h.valid_to IS NULL OR f.ver < h.valid_to)
    """,
    doc="Point-in-time join of orders onto the SCD2 customer history "
    "(operators/incremental.py:scd2_point_in_time_join): each order "
    "is enriched with the dimension slice valid at ITS load version — "
    "the feature-store as-of join that prevents future attribute "
    "values leaking into past training examples (joining the current "
    "slice would). Equi-join on the business key with the validity "
    "test as a residual filter (SCD2 keeps few slices per key — the "
    "hash join does the distribution work, never a range join); "
    "orders whose customer was deleted before their version enrich "
    "to NULL through the left join. Oracle builds the same two-load "
    "history as scd2_history and applies the interval filter.",
)
def q_join_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.operators.incremental import (
        scd2_apply,
        scd2_init,
        scd2_point_in_time_join,
    )
    from spark_extensions_spark.queries14 import _base_and_snap

    base, snap = _base_and_snap(spark, sf_dir)
    hist = scd2_apply(
        scd2_init(
            base, ["c_custkey"], ["c_acctbal", "c_mktsegment"],
            load_version=1,
        ),
        snap,
        ["c_custkey"],
        ["c_acctbal", "c_mktsegment"],
        load_version=2,
    )
    o = _t(spark, sf_dir, "orders")["orders"]
    facts = o.select(
        "o_orderkey",
        "o_custkey",
        F.when(
            F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"),
            F.lit(1),
        )
        .otherwise(F.lit(2))
        .cast("bigint")
        .alias("ver"),
    )
    return scd2_point_in_time_join(
        facts, hist, "o_custkey", "c_custkey", "ver"
    ).select("o_orderkey", "ver", "c_acctbal", "c_mktsegment")


# =====================================================================
# Readability scoring (Flesch reading ease, vowel-run syllables)
# =====================================================================

@_register(
    "text_readability",
    """
    WITH t AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(lower(text), '[a-z]+'))
                  AS DOUBLE) AS w,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                  AS DOUBLE) AS syl,
             CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+')))
                  AS DOUBLE) AS sent
      FROM documents
    )
    SELECT doc_id,
           CAST(w AS BIGINT) AS n_words,
           CAST(syl AS BIGINT) AS n_syllables,
           CAST(sent AS BIGINT) AS n_sentences,
           CASE WHEN w = 0e0 THEN NULL
                ELSE floor((206835e-3 - 1015e-3 * (w / sent)
                            - 846e-1 * (syl / w)) * 1e3 + 5e-1) / 1e3
           END AS flesch
    FROM t
    """,
    doc="Flesch reading-ease scoring with vowel-run syllable counting "
    "— the classic readability quality signal (very low scores flag "
    "legalese/code, implausibly high flag fragment spam); complements "
    "the Gopher/C4 structural rules. Pure row-local regex counting in "
    "one codegen projection, zero shuffle; e-notation literals keep "
    "both engines in DOUBLE and the score is fixed-point-floored to "
    "3 dp (the vowel-run syllable heuristic is the standard "
    "dictionary-free approximation).",
)
def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    w = F.expr(
        "cast(size(regexp_extract_all(lower(text), '[a-z]+', 0)) "
        "as double)"
    )
    syl = F.expr(
        "cast(size(regexp_extract_all(lower(text), '[aeiouy]+', 0)) "
        "as double)"
    )
    sent = F.expr(
        "cast(greatest(1, size(regexp_extract_all(text, '[.!?]+', 0))) "
        "as double)"
    )
    g = docs.select(
        "doc_id", w.alias("w"), syl.alias("syl"), sent.alias("sent")
    )
    return g.select(
        "doc_id",
        F.col("w").cast("bigint").alias("n_words"),
        F.col("syl").cast("bigint").alias("n_syllables"),
        F.col("sent").cast("bigint").alias("n_sentences"),
        F.when(F.col("w") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.expr(
                "floor((206835e-3 - 1015e-3 * (w / sent) "
                "- 846e-1 * (syl / w)) * 1e3 + 5e-1) / 1e3"
            )
        )
        .alias("flesch"),
    )

from spark_extensions_spark import queries36  # noqa: E402,F401  (registration side effect)
