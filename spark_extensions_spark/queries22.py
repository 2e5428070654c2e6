"""t2 query registry, batch 25: cohort/RFM analytics, probabilistic
record linkage, vocab-aware tokenization.

Registered into the shared registry (imported from queries21 at module
end). Same determinism rules as the queries.py docstring.

- ``analytic_cohort_retention``: weekly cohort × weeks-since retention
  matrix over the event stream — first-touch aggregate + one
  distinct-count shuffle.
- ``analytic_rfm``: recency/frequency/monetary quintile segmentation
  of customers from their orders — one aggregate + ntile windows with
  unique-key tiebreaks.
- ``link_fs_score``: Fellegi–Sunter probabilistic record-linkage
  scores over nation-blocked customer pairs — field-agreement match /
  non-match weights (literal doubles) summed in fixed order; the
  classical entity-resolution scoring pass (complements the fuzzy
  Levenshtein matcher in operators/joins.py).
- ``text_vocab_tokens``: per-document token count under a broadcast
  vocabulary with character fallback — the corpus-adaptive stand-in
  for BPE token accounting (vocab words cost 1 token, OOV words cost
  ceil(len/4)); vocab = deterministic top-200 corpus words.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_extensions_spark.queries import _register, _t


@_register(
    "analytic_cohort_retention",
    """
    WITH firsts AS (
      SELECT user_id,
             CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY 1
    )
    SELECT f.cohort_week,
           CAST(FLOOR(date_diff('day', f.cohort_week,
                                CAST(e.ts AS DATE)) / 7.0) AS INT)
             AS weeks_since,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
    doc="Weekly cohort retention matrix: per-user first-touch week "
    "(one shuffle on user_id), broadcast-join back, distinct-active "
    "count per (cohort, weeks_since) cell — the product-analytics "
    "cohort table at event scale.",
)
def q_analytic_cohort_retention(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")["events"]
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    return (
        ev.join(F.broadcast(firsts), "user_id")
        .select(
            "cohort_week",
            F.floor(
                F.datediff(F.col("ts").cast("date"), F.col("cohort_week"))
                / 7.0
            )
            .cast("int")
            .alias("weeks_since"),
            "user_id",
        )
        .groupBy("cohort_week", "weeks_since")
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_active"))
    )


@_register(
    "analytic_rfm",
    """
    WITH rfm AS (
      SELECT o_custkey AS custkey,
             MAX(o_orderdate) AS last_order,
             COUNT(*) AS freq,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS DECIMAL(38,0)) AS monet
      FROM orders GROUP BY 1
    )
    SELECT custkey,
           CAST(ntile(5) OVER (ORDER BY last_order, custkey) AS INT) AS r,
           CAST(ntile(5) OVER (ORDER BY freq, custkey) AS INT) AS f,
           CAST(ntile(5) OVER (ORDER BY monet, custkey) AS INT) AS m
    FROM rfm
    """,
    doc="RFM quintile segmentation: one aggregate over orders (exact "
    "integer-scaled monetary sum), then three exact distributed ntiles "
    "(operators/sampling.py:distributed_ntile — rank from the "
    "two-phase global sort index, tile from integer arithmetic; "
    "bit-identical to the oracle's window ntile but with no "
    "single-partition global window) with unique-key tiebreaks.",
)
def q_analytic_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.operators.sampling import distributed_ntile

    orders = _t(spark, sf_dir, "orders")["orders"]
    rfm = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .cast("decimal(38,0)")
        ).alias("monet"),
    ).localCheckpoint()
    n = rfm.count()
    out = distributed_ntile(rfm, ["last_order", "custkey"], 5, "r", total=n)
    out = distributed_ntile(out, ["freq", "custkey"], 5, "f", total=n)
    out = distributed_ntile(out, ["monet", "custkey"], 5, "m", total=n)
    return out.select("custkey", "r", "f", "m")


# Fellegi–Sunter agreement weights: log2(m/u) match, log2((1-m)/(1-u))
# non-match, precomputed in Python and injected as shared literals (the
# engines never call log).
_FS_FIELDS = {
    # field: (m, u) probabilities
    "seg": (0.9, 0.2),
    "bal": (0.8, 0.1),
    "name3": (0.95, 0.05),
}


def _fs_weight(m: float, u: float) -> tuple[str, str]:
    import math

    return repr(math.log2(m / u)), repr(math.log2((1 - m) / (1 - u)))


def _fs_score_sql() -> str:
    # floor(x*1e9+0.5)/1e9, not round(x, 9): this string is shared by
    # the Spark query (F.expr) and the DuckDB oracle, but round's dp
    # rescale differs between engines on identical doubles — the floor
    # form runs the identical IEEE sequence in both.
    terms = []
    for field, (m, u) in _FS_FIELDS.items():
        w_a, w_d = _fs_weight(m, u)
        terms.append(
            f"(CASE WHEN agree_{field} THEN {w_a} ELSE {w_d} END)"
        )
    return "floor((" + " + ".join(terms) + ") * 1e9 + 5e-1) / 1e9"


@_register(
    "link_fs_score",
    f"""
    WITH pairs AS (
      SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
             a.c_mktsegment = b.c_mktsegment AS agree_seg,
             FLOOR(a.c_acctbal / 1000.0) = FLOOR(b.c_acctbal / 1000.0)
               AS agree_bal,
             substr(a.c_name, 1, 12) = substr(b.c_name, 1, 12)
               AS agree_name3
      FROM customer a JOIN customer b
        ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    )
    SELECT key_a, key_b, {_fs_score_sql()} AS fs_score
    FROM pairs
    WHERE {_fs_score_sql()} > 0
    """,
    doc="Fellegi–Sunter record-linkage scores over nation-blocked "
    "customer pairs: per-field agreement indicators feed literal "
    "log2(m/u) weights (precomputed in Python — engines never call "
    "log) summed in fixed order; blocking bounds the pair join, the "
    "probabilistic complement of the fuzzy Levenshtein matcher.",
)
def q_link_fs_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.session import ensure_parallelism

    cust = _t(spark, sf_dir, "customer")["customer"]
    # the blocked self-join broadcasts one side; the STREAM side scan
    # is a single task on a one-file fixture — spread it so pair
    # generation + scoring use every core
    a, b = ensure_parallelism(cust).alias("a"), cust.alias("b")
    pairs = a.join(
        b,
        (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
        & (F.col("a.c_custkey") < F.col("b.c_custkey")),
    ).select(
        F.col("a.c_custkey").alias("key_a"),
        F.col("b.c_custkey").alias("key_b"),
        (F.col("a.c_mktsegment") == F.col("b.c_mktsegment")).alias(
            "agree_seg"
        ),
        (
            F.floor(F.col("a.c_acctbal") / 1000.0)
            == F.floor(F.col("b.c_acctbal") / 1000.0)
        ).alias("agree_bal"),
        (
            F.substring(F.col("a.c_name"), 1, 12)
            == F.substring(F.col("b.c_name"), 1, 12)
        ).alias("agree_name3"),
    )
    score = F.expr(_fs_score_sql())
    return pairs.select("key_a", "key_b", score.alias("fs_score")).filter(
        score > 0
    )


_VOCAB_K = 200


@_register(
    "text_vocab_tokens",
    f"""
    WITH words AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
               AS w
      FROM documents
    ),
    vocab AS (
      SELECT w FROM (
        SELECT w, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, w) AS rn
        FROM words GROUP BY w
      ) WHERE rn <= {_VOCAB_K}
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(CASE WHEN v.w IS NOT NULL THEN 1
                         ELSE CAST(CEIL(len(words.w) / 4.0) AS BIGINT)
                    END) AS BIGINT) AS n_tokens
    FROM words LEFT JOIN vocab v ON words.w = v.w
    GROUP BY doc_id
    """,
    doc="Vocab-aware token accounting: deterministic top-200 corpus "
    "vocabulary (broadcast), per-doc token cost = 1 for vocab words, "
    "ceil(len/4) char-fallback for OOV — the BPE-budget estimate shape "
    "(explode + broadcast join + per-doc sum; vocab fits memory by "
    "construction).",
)
def q_text_vocab_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    words = docs.select(
        "doc_id",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("w"),
    )
    # top-K via orderBy+limit (TakeOrderedAndProject — distributed
    # partial top-k; a bare row_number window here would funnel the
    # whole vocabulary through one task)
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(_VOCAB_K)
        .select("w", F.lit(True).alias("in_vocab"))
    )
    return (
        words.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum(
                F.when(F.col("in_vocab"), F.lit(1).cast("bigint")).otherwise(
                    F.ceil(F.length("w") / 4.0).cast("bigint")
                )
            )
            .cast("bigint")
            .alias("n_tokens"),
        )
    )

from spark_extensions_spark import queries23  # noqa: E402,F401  (registration side effect)
