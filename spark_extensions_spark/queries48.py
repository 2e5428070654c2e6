"""t2 query registry, batch 48: Wilcoxon signed-rank paired test.

Registered into the shared registry (imported from queries47 at module
end). Same determinism rules as the queries.py docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_extensions_spark.operators.evals import (
    krippendorff_oracle_sql,
)
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


# ------------------------------------------------------------------
# pipeline_cdc_to_scd2 — changefeed-driven dimension historization
# ------------------------------------------------------------------

_C2S_BOUNDS = ["event_id < 4000", "event_id < 7000", "TRUE"]


def _c2s_oracle() -> str:
    """Direct slice derivation: per user, the latest-non-error value at
    each of the three snapshot bounds; a slice starts at every value
    change (including reinsert-after-delete) and closes at the next
    change — equivalent to the scd2_apply_changes chain by the SCD2
    contract, so the oracle is an INDEPENDENT formulation, not a
    mirror of the Spark plan."""
    gens = ",\n".join(
        f"""c2s_g{i + 1} AS (
      SELECT user_id, event_id FROM (
        SELECT user_id, event_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE {b}
      ) WHERE rn = 1 AND event_type <> 'error'
    )"""
        for i, b in enumerate(_C2S_BOUNDS)
    )
    vals = " UNION ALL ".join(
        f"SELECT user_id, {v} AS v, event_id AS val FROM c2s_g{v}"
        for v in (1, 2, 3)
    )
    return f"""
    WITH {gens},
    c2s_users AS (
      SELECT DISTINCT user_id FROM (
        SELECT user_id FROM c2s_g1 UNION ALL
        SELECT user_id FROM c2s_g2 UNION ALL
        SELECT user_id FROM c2s_g3)
    ),
    c2s_vals AS (
      SELECT u.user_id, g.v, s.val
      FROM c2s_users u
      CROSS JOIN (SELECT * FROM (VALUES (1), (2), (3)) t(v)) g
      LEFT JOIN ({vals}) s ON s.user_id = u.user_id AND s.v = g.v
    ),
    c2s_seq AS (
      SELECT user_id, v, val,
             (v = 1 AND val IS NOT NULL)
             OR (v > 1 AND val IS DISTINCT FROM
                 LAG(val) OVER (PARTITION BY user_id ORDER BY v)) AS chg
      FROM c2s_vals
    ),
    c2s_starts AS (
      SELECT user_id, v AS valid_from, val FROM c2s_seq
      WHERE chg AND val IS NOT NULL
    )
    SELECT s.user_id, s.val AS event_id,
           CAST(s.valid_from AS BIGINT) AS valid_from,
           CAST((SELECT MIN(q.v) FROM c2s_seq q
                 WHERE q.user_id = s.user_id
                   AND q.v > s.valid_from AND q.chg) AS BIGINT)
             AS valid_to,
           (SELECT MIN(q.v) FROM c2s_seq q
            WHERE q.user_id = s.user_id
              AND q.v > s.valid_from AND q.chg) IS NULL AS is_current
    FROM c2s_starts s
    """


@_register(
    "pipeline_cdc_to_scd2",
    _c2s_oracle(),
    doc="Changefeed-driven dimension historization — the lakehouse CDF "
    "-> SCD2 pattern end to end: three latest-non-error-per-user "
    "snapshots diff into I/U/D change sets (one full-outer join each, "
    "the cdc_snapshot_diff shape), which drive "
    "operators/incremental.py:scd2_apply_changes twice on top of "
    "scd2_init — per key: unchanged passes, update closes + reopens, "
    "delete closes, reinsert opens a fresh slice. The oracle derives "
    "validity slices INDEPENDENTLY (per-version value grid + "
    "change-flag window + next-change correlated min), so the chain "
    "is verified against the SCD2 contract itself, not against a "
    "mirror of the plan.",
)
def q_pipeline_cdc_to_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from spark_extensions_spark.operators.incremental import (
        scd2_apply_changes,
        scd2_init,
    )

    ev = _t(spark, sf_dir, "events")["events"]

    def snap(bound: str) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy(F.desc("event_id"))
        return (
            ev.where(F.expr(bound))
            .withColumn("rn", F.row_number().over(w))
            .where((F.col("rn") == 1) & (F.col("event_type") != "error"))
            .select("user_id", "event_id")
        )

    def changes(old: DataFrame, new: DataFrame) -> DataFrame:
        o = old.select(
            F.col("user_id"), F.col("event_id").alias("old_eid")
        )
        n = new.select(
            F.col("user_id"), F.col("event_id").alias("new_eid")
        )
        j = o.join(n, "user_id", "full_outer")
        return j.where(
            F.col("old_eid").isNull()
            | F.col("new_eid").isNull()
            | (F.col("old_eid") != F.col("new_eid"))
        ).select(
            "user_id",
            F.coalesce("new_eid", "old_eid").alias("event_id"),
            F.when(F.col("old_eid").isNull(), "I")
            .when(F.col("new_eid").isNull(), "D")
            .otherwise("U")
            .alias("op"),
        )

    g1, g2, g3 = (snap(b) for b in _C2S_BOUNDS)
    hist = scd2_init(g1, ["user_id"], ["event_id"], load_version=1)
    hist = scd2_apply_changes(
        hist, changes(g1, g2), ["user_id"], ["event_id"], load_version=2
    )
    return scd2_apply_changes(
        hist, changes(g2, g3), ["user_id"], ["event_id"], load_version=3
    )


# ------------------------------------------------------------------
# sample_negatives — deterministic ring negatives
# ------------------------------------------------------------------

from spark_extensions_spark.operators.sampling import (  # noqa: E402
    ring_negatives,
    ring_negatives_oracle_sql,
)


@_register(
    "sample_negatives",
    ring_negatives_oracle_sql("SELECT doc_id FROM documents", "doc_id", k=4),
    doc="Deterministic random negative sampling for contrastive "
    "training (operators/sampling.py:ring_negatives): each anchor "
    "takes the k=4 documents sitting at evenly-spread offsets on a "
    "deterministic md5-shuffled ring — reproducible on any cluster "
    "layout, ONE equi-join on the position key (k rows per anchor, "
    "linear total) where ORDER BY rand() per anchor is quadratic and "
    "non-reproducible. The ring index is the two-phase distributed "
    "global_sort_index; the oracle is the single-window form, so the "
    "query ALSO re-proves the deterministic_shuffle equivalence "
    "contract. Complements embedding_hard_negatives (difficulty-"
    "ranked picks) as the uniform background draw.",
)
def q_sample_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    return ring_negatives(docs.select("doc_id"), "doc_id", k=4)


# ------------------------------------------------------------------
# ts_backtest_snaive — forecast backtesting (model selection)
# ------------------------------------------------------------------


@_register(
    "ts_backtest_snaive",
    """
    WITH bt_day AS (
      SELECT time_bucket(INTERVAL '1 day', o_orderdate) AS d,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    bt_lag AS (
      SELECT d, cents,
             LAG(cents, 1) OVER (ORDER BY d) AS f_naive1,
             LAG(cents, 7) OVER (ORDER BY d) AS f_snaive7
      FROM bt_day
    ),
    bt_err AS (
      SELECT 'naive1' AS model, ABS(cents - f_naive1) AS ae
      FROM bt_lag WHERE f_naive1 IS NOT NULL AND f_snaive7 IS NOT NULL
      UNION ALL
      SELECT 'snaive7', ABS(cents - f_snaive7)
      FROM bt_lag WHERE f_naive1 IS NOT NULL AND f_snaive7 IS NOT NULL
    )
    SELECT model, CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(ae) AS BIGINT) AS sum_abs_err_cents,
           CAST(FLOOR(SUM(ae) / CAST(COUNT(*) AS DOUBLE) + 0.5)
                AS BIGINT) AS mae_cents
    FROM bt_err GROUP BY model
    """,
    doc="Forecast backtesting for model selection: naive-1 vs "
    "seasonal-naive-7 one-step forecasts of daily revenue, scored by "
    "MAE over the SAME evaluation days (both lags non-NULL, so the "
    "comparison is apples-to-apples) — the hindcast harness every "
    "production forecaster gates on before shipping a model. One hash "
    "aggregate to the per-day series (domain-sized), two lag windows "
    "over it, exact-cent errors; MAE is one double division "
    "floor-quantized.",
)
def q_ts_backtest_snaive(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders")["orders"]
    day = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("d")
    ).agg(
        F.sum(F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)"))
        .cast("bigint")
        .alias("cents")
    )
    # bounded input: the per-day series (date domain) — lag windows
    # run over |days| rows at any corpus size
    w = Window.orderBy("d")
    lagged = day.select(
        "cents",
        F.lag("cents", 1).over(w).alias("f_naive1"),
        F.lag("cents", 7).over(w).alias("f_snaive7"),
    ).where(
        F.col("f_naive1").isNotNull() & F.col("f_snaive7").isNotNull()
    )
    err = lagged.select(
        F.lit("naive1").alias("model"),
        F.abs(F.col("cents") - F.col("f_naive1")).alias("ae"),
    ).unionByName(
        lagged.select(
            F.lit("snaive7").alias("model"),
            F.abs(F.col("cents") - F.col("f_snaive7")).alias("ae"),
        )
    )
    return err.groupBy("model").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("ae").cast("bigint").alias("sum_abs_err_cents"),
        F.expr(
            "cast(floor(sum(ae) / cast(count(1) as double) + 0.5d)"
            " as bigint)"
        ).alias("mae_cents"),
    )


# ------------------------------------------------------------------
# agg_weighted_percentile — exact weighted quantiles
# ------------------------------------------------------------------

_WP_PCTS = [25, 50, 75, 90]


@_register(
    "agg_weighted_percentile",
    f"""
    WITH wp_vals AS (
      SELECT CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS v,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
      FROM lineitem GROUP BY 1
    ),
    wp_cum AS (
      SELECT v, w,
             CAST(SUM(w) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cw
      FROM wp_vals
    ),
    wp_tot AS (SELECT SUM(w) AS tw FROM wp_vals),
    wp_p AS (SELECT * FROM (VALUES {", ".join(f"({p})" for p in _WP_PCTS)})
             t(pct))
    SELECT pct,
           MIN(CASE WHEN cw * 100 >= pct * tw THEN v END) AS price_cents
    FROM wp_cum CROSS JOIN wp_tot CROSS JOIN wp_p
    GROUP BY pct
    """,
    doc="Exact WEIGHTED percentiles (lower weighted-quantile: smallest "
    "v whose cumulative weight reaches p·W) of line price weighted by "
    "quantity — the quantile form sampling-weighted corpora need "
    "(agg_percentile_exact is the unweighted interpolated twin). The "
    "threshold compare is cross-multiplied (cw·100 ≥ pct·W) so NO "
    "division ever happens — pure BIGINT, no float boundary seam. "
    "One hash aggregate onto the distinct-cents domain + a "
    "domain-sized cumulative window.",
)
def q_agg_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    vals = li.groupBy(
        F.expr(
            "cast(floor(l_extendedprice * 100 + 0.5d) as bigint)"
        ).alias("v")
    ).agg(
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("w")
    )
    # bounded input: one row per distinct price-cents (post-agg domain)
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = vals.select(
        "v", "w", F.sum("w").over(w).cast("bigint").alias("cw")
    )
    tot = vals.agg(F.sum("w").alias("tw"))
    pcts = (
        _t(spark, sf_dir, "lineitem")["lineitem"]
        .sparkSession.createDataFrame([(p,) for p in _WP_PCTS], "pct int")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(pcts))
        .groupBy("pct")
        .agg(
            F.min(
                F.when(
                    F.col("cw") * 100 >= F.col("pct") * F.col("tw"),
                    F.col("v"),
                )
            ).alias("price_cents")
        )
    )


# ------------------------------------------------------------------
# tokenizer_bpe_pair_stats — the first BPE merge, hash-checked
# ------------------------------------------------------------------

_BPS_TOP = 20


@_register(
    "tokenizer_bpe_pair_stats",
    f"""
    WITH bps_words AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        SELECT unnest(string_split_regex(lower(text),
                 '[^a-z0-9'']+')) AS word
        FROM documents
      ) WHERE word <> '' GROUP BY word
    ),
    bps_pairs AS (
      SELECT unnest(list_append(
               CASE WHEN length(word) < 2 THEN []
                    ELSE list_transform(
                      generate_series(1, length(word) - 1),
                      i -> substr(word, i, 1) || '|'
                           || substr(word, i + 1, 1))
               END,
               substr(word, length(word), 1) || '|</w>')) AS pair,
             freq
      FROM bps_words
    )
    SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt
    FROM bps_pairs GROUP BY pair
    ORDER BY cnt DESC, pair LIMIT {_BPS_TOP}
    """,
    doc="The first iteration of BPE training, hash-checked: adjacent "
    "symbol-pair counts over the corpus word-frequency table (chars + "
    "the </w> end marker, weighted by word frequency) — the top row "
    "IS the first merge functions/tokenizer.py:bpe_train picks "
    "(deterministic lexicographic tie-break), pinned in pytest. The "
    "full merge LOOP stays rows-only (tokenizer_bpe: each step needs "
    "the global argmax, inherently sequential), but this query "
    "converts the loop's input statistics — the part that touches "
    "the corpus — to oracle-backed; the word table is ONE scan + one "
    "hash agg, pair expansion is row-local over the vocabulary-sized "
    "table, the top-k a TakeOrderedAndProject.",
)
def q_tokenizer_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.functions.tokenizer import word_frequencies

    docs = _t(spark, sf_dir, "documents")["documents"]
    wf = word_frequencies(docs, "text")
    pairs = wf.select(
        F.explode(
            F.expr(
                "array_append("
                "  case when length(word) < 2 then array()"
                "       else transform(sequence(1, length(word) - 1),"
                "         i -> substr(word, i, 1) || '|'"
                "              || substr(word, i + 1, 1)) end,"
                "  substr(word, length(word), 1) || '|</w>')"
            )
        ).alias("pair"),
        "freq",
    )
    agg = pairs.groupBy("pair").agg(
        F.sum("freq").cast("bigint").alias("cnt")
    )
    return agg.orderBy(F.desc("cnt"), "pair").limit(_BPS_TOP)


# ------------------------------------------------------------------
# agg_hll_rollup_table — mergeable-sketch rollup, hash-checked
# ------------------------------------------------------------------


from spark_extensions_spark.operators.sketches import (  # noqa: E402
    _hll_rank_duck,
    _hll_rank_spark,
)


def _hll_rollup_oracle() -> str:
    bucket, rank = _hll_rank_duck("o_custkey")
    return f"""
    WITH hr_fine AS (
      SELECT o_orderstatus, o_orderpriority,
             {bucket} AS bucket, MAX({rank}) AS max_rank
      FROM orders WHERE o_custkey IS NOT NULL
      GROUP BY 1, 2, 3
    )
    SELECT o_orderstatus, bucket,
           CAST(MAX(max_rank) AS INT) AS max_rank
    FROM hr_fine GROUP BY 1, 2
    """


@_register(
    "agg_hll_rollup_table",
    _hll_rollup_oracle(),
    doc="Mergeable-sketch ROLLUP with the deterministic HLL: fine "
    "(status, priority) register tables built in one scan, then "
    "merged up to status by elementwise register MAX — the 100 TB "
    "cube-maintenance pattern agg_hll_sketch runs on JVM sketch "
    "bytes, now with every register value hash-checked at BOTH "
    "levels of the hierarchy (the oracle recomputes the fine level "
    "and merges it the same way, so the merge algebra itself is "
    "part of the verified surface). Two hash aggregates; shuffle "
    "volume <= groups x 256 registers at any corpus size.",
)
def q_agg_hll_rollup_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    bucket, rank = _hll_rank_spark("o_custkey")
    fine = (
        o.where(F.col("o_custkey").isNotNull())
        .select(
            "o_orderstatus",
            "o_orderpriority",
            F.expr(bucket).alias("bucket"),
            F.expr(rank).alias("rank"),
        )
        .groupBy("o_orderstatus", "o_orderpriority", "bucket")
        .agg(F.max("rank").alias("max_rank"))
    )
    return fine.groupBy("o_orderstatus", "bucket").agg(
        F.max("max_rank").cast("int").alias("max_rank")
    )


# ------------------------------------------------------------------
# eval_krippendorff — multi-rater agreement
# ------------------------------------------------------------------

_KA_R1 = (
    "CASE WHEN o_totalprice < 80000 THEN 0 "
    "WHEN o_totalprice < 160000 THEN 1 ELSE 2 END"
)
_KA_R2 = (
    "CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 2 "
    "WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END"
)
_KA_R3 = (
    "CASE WHEN o_orderstatus = 'F' THEN 2 "
    "WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END"
)
_KA_RATINGS_DUCK = " UNION ALL ".join(
    f"SELECT o_orderkey AS unit, {r} AS label FROM orders"
    for r in (_KA_R1, _KA_R2, _KA_R3)
)


@_register(
    "eval_krippendorff",
    krippendorff_oracle_sql(_KA_RATINGS_DUCK, "unit", "label", scale_l=2),
    doc="Krippendorff's alpha (nominal) — the inter-annotator-"
    "agreement gate of RLHF/eval labeling pipelines "
    "(operators/evals.py:krippendorff_alpha_nominal; Krippendorff "
    "2004): cohen_kappa covers exactly two raters, alpha handles any "
    "rater count and missing ratings. Three derived judgments of "
    "each order (price band / priority band / status band) share a "
    "{0,1,2} label space; observed and expected disagreement are "
    "EXACT BIGINTs (per-unit pair sums m² − Σn², lcm-scaled across "
    "unit sizes), alpha is one double division e6-quantized. Two "
    "hash aggregates, one corpus scan.",
)
def q_eval_krippendorff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.operators.evals import (
        krippendorff_alpha_nominal,
    )

    o = _t(spark, sf_dir, "orders")["orders"]
    ratings = None
    for r in (_KA_R1, _KA_R2, _KA_R3):
        part = o.select(
            F.col("o_orderkey").alias("unit"),
            F.expr(r).cast("int").alias("label"),
        )
        ratings = part if ratings is None else ratings.unionByName(part)
    return krippendorff_alpha_nominal(ratings, "unit", "label")


# batch 49 registers at import time, same chain as queries47 -> 48
from spark_extensions_spark import queries49  # noqa: E402,F401  (registration side effect)
