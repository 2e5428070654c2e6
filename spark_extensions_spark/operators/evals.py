"""Text-generation evaluation metrics as distributed operators.

ROUGE-N (Lin 2004, "ROUGE: A Package for Automatic Evaluation of
Summaries") with the standard CLIPPED n-gram counts: per (reference,
hypothesis) pair, overlap = Σ_g min(count_ref(g), count_hyp(g)), then
precision / recall / F1. The metric every summarization / data-distill
pipeline reports; here it is exact integer math end-to-end (counts are
integers, the three ratios are cross-multiplied e6 fixed-point integer
divisions), so the whole eval is hash-verifiable across engines.

Scale shape: n-gram expansion is row-local (split + slice transform +
explode); counting is two hash aggregates keyed by (pair id, gram);
the overlap join is equi-keyed on the same key — no broadcast of
anything corpus-sized, no driver state. Reference scope note: the
reference engine (smart-data-lake/spark-extensions) has no eval
layer; this extends SURVEY §2.F's beyond-reference families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gram_counts(
    pairs: DataFrame, id_col: str, text_col: str, n: int, cnt: str
) -> DataFrame:
    """Per-pair n-gram counts of one side.  Tokenization is its OWN
    projection step so the regex runs once per row, then the shared
    :func:`~spark_extensions_spark.operators.dedup.shingles_from_words`
    expands grams from the materialized words array (inlining the
    tokenizer into the per-element lambda would re-run it once per
    gram — Catalyst does not hoist subexpressions out of higher-order
    lambdas)."""
    from spark_extensions_spark.operators.dedup import shingles_from_words

    words = pairs.select(
        id_col,
        F.expr(
            f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"
        ).alias("__ws"),
    )
    grams = words.select(
        id_col,
        F.explode(
            F.col("__ws") if n == 1 else shingles_from_words("__ws", n)
        ).alias("gram"),
    )
    return grams.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias(cnt))


def rouge_n(
    pairs: DataFrame,
    id_col: str,
    ref_col: str,
    hyp_col: str,
    n: int = 2,
) -> DataFrame:
    """ROUGE-N with clipped counts over (reference, hypothesis) pairs.

    Returns one row per pair: ``(id_col, overlap, ref_total,
    hyp_total, rouge_p_e6, rouge_r_e6, rouge_f_e6)`` — all BIGINT.
    Empty sides yield 0 metrics (never NULL/NaN).
    """
    # three branches (ref grams, hyp grams, the id spine) read the
    # pairs plan — one materialization instead of per-branch recompute
    # (the caller's pair construction may itself be a join)
    pairs = pairs.localCheckpoint(eager=False)
    rg = _gram_counts(pairs, id_col, ref_col, n, "rc")
    hg = _gram_counts(pairs, id_col, hyp_col, n, "hc")
    ov = (
        rg.join(hg, [id_col, "gram"])
        .groupBy(id_col)
        .agg(F.sum(F.least("rc", "hc")).alias("overlap"))
    )
    rt = rg.groupBy(id_col).agg(F.sum("rc").alias("ref_total"))
    ht = hg.groupBy(id_col).agg(F.sum("hc").alias("hyp_total"))
    base = (
        pairs.select(id_col)
        .join(rt, id_col, "left")
        .join(ht, id_col, "left")
        .join(ov, id_col, "left")
        .select(
            id_col,
            F.coalesce("overlap", F.lit(0)).cast("bigint").alias("overlap"),
            F.coalesce("ref_total", F.lit(0))
            .cast("bigint")
            .alias("ref_total"),
            F.coalesce("hyp_total", F.lit(0))
            .cast("bigint")
            .alias("hyp_total"),
        )
    )
    p = F.when(F.col("hyp_total") == 0, F.lit(0)).otherwise(
        F.expr("(overlap * 1000000) div hyp_total")
    )
    r = F.when(F.col("ref_total") == 0, F.lit(0)).otherwise(
        F.expr("(overlap * 1000000) div ref_total")
    )
    out = base.select(
        id_col,
        "overlap",
        "ref_total",
        "hyp_total",
        p.cast("bigint").alias("rouge_p_e6"),
        r.cast("bigint").alias("rouge_r_e6"),
    )
    return out.select(
        id_col,
        "overlap",
        "ref_total",
        "hyp_total",
        "rouge_p_e6",
        "rouge_r_e6",
        F.when(
            F.col("rouge_p_e6") + F.col("rouge_r_e6") == 0, F.lit(0)
        )
        .otherwise(
            F.expr(
                "(2 * rouge_p_e6 * rouge_r_e6)"
                " div (rouge_p_e6 + rouge_r_e6)"
            )
        )
        .cast("bigint")
        .alias("rouge_f_e6"),
    )


def _ngrams_duck(text_col: str, n: int) -> str:
    ws = f"regexp_extract_all(LOWER({text_col}), '[a-z0-9]+')"
    if n == 1:
        return ws
    # the proven-stable construct subset: generate_series + single-arg
    # lambda + positive-bounds slice (see text_collocations)
    return (
        f"CASE WHEN LEN({ws}) < {n} THEN [] "
        f"ELSE list_transform(generate_series(0, LEN({ws}) - {n}), "
        f"i -> array_to_string({ws}[i+1:i+{n}], ' ')) END"
    )


def rouge_n_oracle_sql(
    pairs_sql: str,
    id_col: str,
    ref_col: str,
    hyp_col: str,
    n: int = 2,
) -> str:
    """DuckDB twin of :func:`rouge_n` over ``pairs_sql``."""
    return f"""
    WITH pairs AS ({pairs_sql}),
    rg AS (
      SELECT {id_col}, gram, COUNT(*) AS rc FROM (
        SELECT {id_col}, UNNEST({_ngrams_duck(ref_col, n)}) AS gram
        FROM pairs
      ) GROUP BY {id_col}, gram
    ),
    hg AS (
      SELECT {id_col}, gram, COUNT(*) AS hc FROM (
        SELECT {id_col}, UNNEST({_ngrams_duck(hyp_col, n)}) AS gram
        FROM pairs
      ) GROUP BY {id_col}, gram
    ),
    ov AS (
      SELECT {id_col}, SUM(LEAST(rc, hc)) AS overlap
      FROM rg JOIN hg USING ({id_col}, gram) GROUP BY {id_col}
    ),
    rt AS (SELECT {id_col}, SUM(rc) AS ref_total FROM rg GROUP BY {id_col}),
    ht AS (SELECT {id_col}, SUM(hc) AS hyp_total FROM hg GROUP BY {id_col}),
    base AS (
      SELECT p.{id_col},
             CAST(COALESCE(overlap, 0) AS BIGINT) AS overlap,
             CAST(COALESCE(ref_total, 0) AS BIGINT) AS ref_total,
             CAST(COALESCE(hyp_total, 0) AS BIGINT) AS hyp_total
      FROM pairs p
      LEFT JOIN rt USING ({id_col})
      LEFT JOIN ht USING ({id_col})
      LEFT JOIN ov USING ({id_col})
    ),
    pr AS (
      SELECT *,
             CASE WHEN hyp_total = 0 THEN 0
                  ELSE (overlap * 1000000) // hyp_total END AS rouge_p_e6,
             CASE WHEN ref_total = 0 THEN 0
                  ELSE (overlap * 1000000) // ref_total END AS rouge_r_e6
      FROM base
    )
    SELECT {id_col}, overlap, ref_total, hyp_total,
           CAST(rouge_p_e6 AS BIGINT) AS rouge_p_e6,
           CAST(rouge_r_e6 AS BIGINT) AS rouge_r_e6,
           CAST(CASE WHEN rouge_p_e6 + rouge_r_e6 = 0 THEN 0
                     ELSE (2 * rouge_p_e6 * rouge_r_e6)
                          // (rouge_p_e6 + rouge_r_e6) END AS BIGINT)
             AS rouge_f_e6
    FROM pr
    """


# =====================================================================
# Exact rank-based AUC (tie-aware) and expected calibration error —
# classifier-quality evals in exact integer arithmetic
# =====================================================================

def auc_exact(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Tie-aware ROC AUC from exact integer pair counting.

    For each distinct score value v (ascending):
    ``correct2 = Σ_v [ 2·pos(v)·cum_neg(<v) + pos(v)·neg(v) ]`` — twice
    the count of correctly ordered (pos, neg) pairs with ties counted
    half — and ``AUC = correct2 / (2·n_pos·n_neg)``. Every compared
    quantity is an exact integer; the single double division at the end
    operates on exactly-representable BIGINTs (the proven stat_psi /
    Mann-Whitney recipe — operators/stats.py:613 uses the same
    domain-cumulative window).

    ``score_col`` must be integer-typed (exact); ``label_col`` boolean.
    Scale shape: one hash aggregate on the score DOMAIN, then a
    domain-sized cumulative window (bounded input: one row per distinct
    score, never the corpus). Output: one row
    ``(n_pos, n_neg, correct2, auc_e6)`` — all BIGINT.
    """
    counts = df.groupBy(F.col(score_col).alias("v")).agg(
        F.count(F.when(F.col(label_col), 1)).alias("pos"),
        F.count(F.when(~F.col(label_col), 1)).alias("neg"),
    )
    from pyspark.sql import Window

    # bounded input: one row per DISTINCT score (post-agg domain)
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = counts.select(
        "pos",
        "neg",
        F.coalesce(F.sum("neg").over(w), F.lit(0)).alias("cneg"),
        F.sum("pos").over(wt).alias("n_pos"),
        F.sum("neg").over(wt).alias("n_neg"),
    )
    return cum.agg(
        F.max("n_pos").cast("bigint").alias("n_pos"),
        F.max("n_neg").cast("bigint").alias("n_neg"),
        F.sum(
            F.lit(2) * F.col("pos").cast("bigint") * F.col("cneg")
            + F.col("pos").cast("bigint") * F.col("neg")
        )
        .cast("bigint")
        .alias("correct2"),
    ).select(
        "n_pos",
        "n_neg",
        "correct2",
        # single-class input has no rankable pairs: NULL AUC (the
        # unguarded division THROWS under ANSI Spark instead of the
        # oracle's NULL)
        F.expr(
            "case when n_pos = 0 or n_neg = 0 then cast(null as bigint)"
            " else cast(floor(cast(correct2 as double)"
            " / cast(2 * n_pos * n_neg as double) * 1e6 + 0.5d)"
            " as bigint) end"
        ).alias("auc_e6"),
    )


def auc_exact_oracle_sql(
    scored_sql: str, score_col: str, label_col: str
) -> str:
    """DuckDB twin of :func:`auc_exact` over ``scored_sql``."""
    return f"""
    WITH auc_counts AS (
      SELECT {score_col} AS v,
             COUNT(*) FILTER ({label_col}) AS pos,
             COUNT(*) FILTER (NOT {label_col}) AS neg
      FROM ({scored_sql}) s0
      GROUP BY {score_col}
    ),
    auc_cum AS (
      SELECT pos, neg,
             COALESCE(SUM(neg) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cneg,
             SUM(pos) OVER () AS n_pos,
             SUM(neg) OVER () AS n_neg
      FROM auc_counts
    )
    SELECT CAST(MAX(n_pos) AS BIGINT) AS n_pos,
           CAST(MAX(n_neg) AS BIGINT) AS n_neg,
           CAST(SUM(2 * pos * cneg + pos * neg) AS BIGINT) AS correct2,
           CASE WHEN MAX(n_pos) = 0 OR MAX(n_neg) = 0
                THEN CAST(NULL AS BIGINT)
                ELSE CAST(FLOOR(
                  CAST(SUM(2 * pos * cneg + pos * neg) AS DOUBLE)
                  / CAST(2 * MAX(n_pos) * MAX(n_neg) AS DOUBLE)
                  * 1e6 + 0.5) AS BIGINT) END AS auc_e6
    FROM auc_cum
    """


def calibration_ece(
    df: DataFrame,
    conf_e3_col: str,
    label_col: str,
    bins: int = 10,
) -> DataFrame:
    """Expected calibration error from integer confidences.

    ``conf_e3_col`` holds confidence in exact integer milli-units
    (0..1000). With equal-width bins, the classic
    ``ECE = Σ_b (n_b/N)·|acc_b − conf̄_b|`` collapses to
    ``ECE = Σ_b |1000·pos_b − Σconf_e3_b| / (1000·N)`` — the numerator
    is an EXACT integer per bin (the per-bin divisions cancel), so the
    whole metric is hash-verifiable except one final double division of
    exactly-representable BIGINTs.

    Output: one row per non-empty bin
    ``(bin, n, pos, sum_conf_e3, gap_e3)`` plus the per-bin absolute
    gap numerator — the reliability-diagram table — all BIGINT.
    """
    b = F.least(
        F.expr(f"{conf_e3_col} * {bins} div 1000"), F.lit(bins - 1)
    )
    return (
        df.groupBy(b.cast("int").alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count(F.when(F.col(label_col), 1))
            .cast("bigint")
            .alias("pos"),
            F.sum(conf_e3_col).cast("bigint").alias("sum_conf_e3"),
        )
        .select(
            "bin",
            "n",
            "pos",
            "sum_conf_e3",
            F.abs(
                F.lit(1000) * F.col("pos") - F.col("sum_conf_e3")
            )
            .cast("bigint")
            .alias("gap_e3"),
        )
    )


def calibration_ece_oracle_sql(
    scored_sql: str, conf_e3_col: str, label_col: str, bins: int = 10
) -> str:
    """DuckDB twin of :func:`calibration_ece`."""
    return f"""
    SELECT CAST(LEAST(({conf_e3_col} * {bins}) // 1000, {bins - 1})
                AS INT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) FILTER ({label_col}) AS BIGINT) AS pos,
           CAST(SUM({conf_e3_col}) AS BIGINT) AS sum_conf_e3,
           CAST(ABS(1000 * COUNT(*) FILTER ({label_col})
                    - SUM({conf_e3_col})) AS BIGINT) AS gap_e3
    FROM ({scored_sql}) s0
    GROUP BY 1
    """


# =====================================================================
# Deterministic Poisson bootstrap — metric confidence intervals without
# randomness (hash-derived integer resample weights)
# =====================================================================

# Poisson(1) inverse-CDF thresholds on a uniform 1e6-bucket hash,
# pre-rounded to INTEGER constants so both engines branch on identical
# literals (floor(CDF(k) * 1e6): e^-1-derived, computed offline once)
_POIS1_THRESH = (367879, 735758, 919698, 981011, 996340)


def _poisson_weight_case(bucket_sql: str) -> str:
    cases = " ".join(
        f"WHEN {bucket_sql} < {t} THEN {k}"
        for k, t in enumerate(_POIS1_THRESH)
    )
    return f"(CASE {cases} ELSE 5 END)"


def poisson_bootstrap_replicates(
    df: DataFrame,
    id_col: str,
    value_col: str,
    n_replicates: int = 50,
    salt: str = "boot",
) -> DataFrame:
    """B deterministic Poisson-bootstrap replicates of a mean metric.

    The distributed-bootstrap standard (Chamandy et al. 2012, "Estimating
    uncertainty for massive data streams"): instead of resampling rows
    (which needs global coordination), each row enters replicate ``b``
    with an independent Poisson(1) weight — here DERIVED from
    ``md5(id:salt:b)`` through integer inverse-CDF thresholds, so the
    whole procedure is reproducible on any cluster layout and
    hash-verifiable against SQL.

    Scale shape: explode ``B`` replicate ids per row, then ONE
    map-side-combinable aggregate — partial state collapses to ``B``
    rows per partition before the shuffle, so the shuffle volume is
    ``B × #partitions`` rows regardless of corpus size.

    Output: one row per replicate, ``(b, n_eff, sum_wv, mean_e6)`` —
    exact BIGINT weighted count/sum plus the floor-quantized mean. The
    2.5%/97.5% quantiles of ``mean_e6`` across the B-row result are the
    CI (B is bounded; take them downstream however you like).
    """
    from spark_extensions_spark.operators.sampling import hash_bucket

    b = F.explode(
        F.sequence(F.lit(1), F.lit(int(n_replicates)))
    ).alias("b")
    rows = df.select(
        F.col(id_col).cast("string").alias("__id"),
        F.col(value_col).cast("bigint").alias("__v"),
    ).select("__id", "__v", b)
    bucket = hash_bucket(
        "concat(__id, ':', cast(b as string))", salt, 1_000_000
    )
    w = F.expr(
        _poisson_weight_case("__bkt")
    )
    weighted = rows.select(
        "b",
        "__v",
        bucket.alias("__bkt"),
    ).select("b", "__v", w.alias("__w"))
    return (
        weighted.groupBy("b")
        .agg(
            F.sum("__w").cast("bigint").alias("n_eff"),
            F.sum(F.col("__w") * F.col("__v"))
            .cast("bigint")
            .alias("sum_wv"),
        )
        .select(
            F.col("b").cast("int").alias("b"),
            "n_eff",
            "sum_wv",
            F.expr(
                "cast(floor(cast(sum_wv as double)"
                " / cast(n_eff as double) * 1e6 + 0.5d) as bigint)"
            ).alias("mean_e6"),
        )
    )


def poisson_bootstrap_oracle_sql(
    source_sql: str,
    id_col: str,
    value_col: str,
    n_replicates: int = 50,
    salt: str = "boot",
) -> str:
    """DuckDB twin of :func:`poisson_bootstrap_replicates`."""
    from spark_extensions_spark.operators.sampling import (
        hash_bucket_duck,
    )

    bucket = hash_bucket_duck(
        f"(CAST({id_col} AS VARCHAR) || ':' || CAST(b AS VARCHAR))",
        salt,
        1_000_000,
    )
    wcase = _poisson_weight_case("__bkt")
    return f"""
    WITH boot_rows AS (
      SELECT CAST({id_col} AS VARCHAR) AS {id_col},
             CAST({value_col} AS BIGINT) AS __v,
             UNNEST(generate_series(1, {int(n_replicates)})) AS b
      FROM ({source_sql}) s0
    ),
    boot_w AS (
      SELECT b, __v, {wcase} AS __w
      FROM (SELECT b, __v, {bucket} AS __bkt FROM boot_rows)
    )
    SELECT CAST(b AS INT) AS b,
           CAST(SUM(__w) AS BIGINT) AS n_eff,
           CAST(SUM(__w * __v) AS BIGINT) AS sum_wv,
           CAST(FLOOR(CAST(SUM(__w * __v) AS DOUBLE)
                / CAST(SUM(__w) AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
             AS mean_e6
    FROM boot_w
    GROUP BY b
    """


# =====================================================================
# Corpus BLEU components (Papineni et al. 2002) — clipped n-gram
# precisions in exact integer arithmetic
# =====================================================================

def bleu_counts(
    pairs: DataFrame,
    id_col: str,
    ref_col: str,
    hyp_col: str,
    max_n: int = 2,
) -> DataFrame:
    """Per-pair BLEU components: clipped n-gram matches and totals for
    n = 1..``max_n``, plus reference / hypothesis token lengths.

    BLEU's modified n-gram precision clips each hypothesis gram's
    count at its reference count — exactly ROUGE's overlap with the
    roles of the denominators swapped (precision divides by the
    HYPOTHESIS total).  Everything emitted is an exact BIGINT:
    ``(id, ref_len, hyp_len, match_1..match_N, total_1..total_N,
    p_1_e6..p_N_e6)``, with p_n the e6 fixed-point clipped precision
    (0 when the hypothesis has no n-grams).  The brevity penalty and
    geometric mean involve exp/log (NOT correctly-rounded libm, so not
    hash-portable across engines) and are left to the caller — corpus
    BLEU = BP(Σref_len, Σhyp_len) · exp(Σ log p_n / N) over the SUMS
    of these per-pair columns, one driver-side formula on one row.

    Scale shape: per n, gram expansion is row-local and counting is a
    (pair, gram) hash aggregate followed by an equi-join on the same
    key — identical to :func:`rouge_n`; the N levels reuse ONE
    materialized tokenization of each side.
    """
    pairs = pairs.localCheckpoint(eager=False)
    out = pairs.select(
        id_col,
        F.expr(
            f"size(regexp_extract_all(lower({ref_col}), '[a-z0-9]+', 0))"
        )
        .cast("bigint")
        .alias("ref_len"),
        F.expr(
            f"size(regexp_extract_all(lower({hyp_col}), '[a-z0-9]+', 0))"
        )
        .cast("bigint")
        .alias("hyp_len"),
    )
    for n in range(1, max_n + 1):
        rg = _gram_counts(pairs, id_col, ref_col, n, "rc")
        hg = _gram_counts(pairs, id_col, hyp_col, n, "hc")
        ov = (
            rg.join(hg, [id_col, "gram"])
            .groupBy(id_col)
            .agg(F.sum(F.least("rc", "hc")).alias(f"match_{n}"))
        )
        ht = hg.groupBy(id_col).agg(F.sum("hc").alias(f"total_{n}"))
        out = (
            out.join(ov, id_col, "left")
            .join(ht, id_col, "left")
            .withColumn(
                f"match_{n}",
                F.coalesce(f"match_{n}", F.lit(0)).cast("bigint"),
            )
            .withColumn(
                f"total_{n}",
                F.coalesce(f"total_{n}", F.lit(0)).cast("bigint"),
            )
        )
    for n in range(1, max_n + 1):
        out = out.withColumn(
            f"p_{n}_e6",
            F.when(F.col(f"total_{n}") == 0, F.lit(0))
            .otherwise(F.expr(f"(match_{n} * 1000000) div total_{n}"))
            .cast("bigint"),
        )
    return out


def bleu_oracle_sql(
    pairs_sql: str,
    id_col: str,
    ref_col: str,
    hyp_col: str,
    max_n: int = 2,
) -> str:
    """DuckDB twin of :func:`bleu_counts` over ``pairs_sql``."""
    per_n_ctes = []
    for n in range(1, max_n + 1):
        per_n_ctes.append(f"""
    rg{n} AS (
      SELECT {id_col}, gram, COUNT(*) AS rc FROM (
        SELECT {id_col}, UNNEST({_ngrams_duck(ref_col, n)}) AS gram
        FROM pairs
      ) GROUP BY {id_col}, gram
    ),
    hg{n} AS (
      SELECT {id_col}, gram, COUNT(*) AS hc FROM (
        SELECT {id_col}, UNNEST({_ngrams_duck(hyp_col, n)}) AS gram
        FROM pairs
      ) GROUP BY {id_col}, gram
    ),
    ov{n} AS (
      SELECT {id_col}, SUM(LEAST(rc, hc)) AS match_{n}
      FROM rg{n} JOIN hg{n} USING ({id_col}, gram) GROUP BY {id_col}
    ),
    ht{n} AS (
      SELECT {id_col}, SUM(hc) AS total_{n} FROM hg{n} GROUP BY {id_col}
    )""")
    join_clauses = "".join(
        f"""
      LEFT JOIN ov{n} USING ({id_col})
      LEFT JOIN ht{n} USING ({id_col})"""
        for n in range(1, max_n + 1)
    )
    mt_cols = "".join(
        f""",
           CAST(COALESCE(match_{n}, 0) AS BIGINT) AS match_{n},
           CAST(COALESCE(total_{n}, 0) AS BIGINT) AS total_{n}"""
        for n in range(1, max_n + 1)
    )
    p_cols = "".join(
        f""",
           CAST(CASE WHEN COALESCE(total_{n}, 0) = 0 THEN 0
                ELSE (COALESCE(match_{n}, 0) * 1000000)
                     // COALESCE(total_{n}, 0) END AS BIGINT)
             AS p_{n}_e6"""
        for n in range(1, max_n + 1)
    )
    return f"""
    WITH pairs AS ({pairs_sql}),
    {",".join(per_n_ctes)}
    SELECT p.{id_col},
           CAST(LEN(regexp_extract_all(LOWER({ref_col}), '[a-z0-9]+'))
                AS BIGINT) AS ref_len,
           CAST(LEN(regexp_extract_all(LOWER({hyp_col}), '[a-z0-9]+'))
                AS BIGINT) AS hyp_len{mt_cols}{p_cols}
    FROM pairs p{join_clauses}
    """


# =====================================================================
# pass@k (Chen et al. 2021, "Evaluating LLMs Trained on Code") —
# the unbiased estimator in exact integer arithmetic
# =====================================================================

def pass_at_k(
    samples: DataFrame,
    problem_col: str,
    passed_col: str,
    k: int,
) -> DataFrame:
    """Per-problem unbiased pass@k: with n samples of which c passed,

        pass@k = 1 − C(n−c, k) / C(n, k)

    (the probability that a random size-k subset contains at least one
    passing sample).  Both binomials are falling factorials over k
    consecutive integers divided by k! — and the k! CANCELS in the
    ratio, so the whole computation stays in DECIMAL(38,0)/HUGEINT
    products (exact while 10⁶·n^k < 10³⁸, i.e. n < ~2.4·10⁶ at k = 5)
    with one final e6 fixed-point
    estimate ``pass_at_k_e6`` (positive intdiv, portable) plus exact
    ``n`` and ``c``.  Problems with n < k are excluded (the estimator
    is undefined); c = 0 gives exactly 0, c ≥ n−k+1 exactly 1e6
    (C(n−c,k) = 0 via the zero factor in the falling factorial).

    The metric every best-of-n / verifier pipeline reports; corpus
    pass@k is the mean of ``pass_at_k_e6`` downstream.

    Scale shape: ONE map-side-combinable aggregate keyed by problem
    (count + conditional count), then row-local closed-form math — no
    window, no join, no per-sample state.
    """
    if k < 1:
        raise ValueError("k must be >= 1")

    def falling(m: str) -> str:
        # C(m, k) * k!  as an exact DECIMAL product of k terms — the
        # k! is NEVER divided out: it cancels between numerator and
        # denominator, which keeps the whole computation in DECIMAL
        # (Spark's `div` returns LONG, so dividing early would drop
        # back to int64 and overflow near n ≈ 1020 — review finding)
        terms = " * ".join(
            f"cast(({m} - {i}) as decimal(38,0))" if i == 0
            else f"({m} - {i})"
            for i in range(k)
        )
        return f"({terms})"

    per = (
        samples.groupBy(F.col(problem_col).alias("problem"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.when(F.col(passed_col), F.lit(1)).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("c"),
        )
        .where(F.col("n") >= k)
    )
    fn = falling("n")
    fm = falling("(n - c)")
    # k! cancels: (C(n,k)-C(n-c,k))/C(n,k) = (fn-fm)/fn, all DECIMAL;
    # only the final e6 integral divide lands in LONG (result <= 1e6).
    # DECIMAL(38,0) bounds: 1e6 * fn < 1e38 => n < ~2.4e6 at k = 5.
    return per.select(
        "problem",
        "n",
        "c",
        F.expr(
            f"cast((1000000 * ({fn} - {fm})) div {fn} as bigint)"
        ).alias("pass_at_k_e6"),
    )


def pass_at_k_oracle_sql(
    samples_sql: str, problem_col: str, passed_sql: str, k: int
) -> str:
    """DuckDB twin of :func:`pass_at_k` (HUGEINT falling factorials)."""
    def falling(m: str) -> str:
        terms = " * ".join(
            f"CAST(({m} - {i}) AS HUGEINT)" if i == 0 else f"({m} - {i})"
            for i in range(k)
        )
        return f"({terms})"

    fn = falling("n")
    fm = falling("(n - c)")
    return f"""
    WITH samples AS ({samples_sql}),
    per AS (
      SELECT {problem_col} AS problem,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN {passed_sql} THEN 1 ELSE 0 END)
                  AS BIGINT) AS c
      FROM samples GROUP BY 1
    )
    SELECT problem, n, c,
           CAST((1000000 * ({fn} - {fm})) // {fn} AS BIGINT)
             AS pass_at_k_e6
    FROM per WHERE n >= {k}
    """


# ---------------------------------------------------------------------
# Krippendorff's alpha (nominal, exact integers)
# ---------------------------------------------------------------------


def krippendorff_alpha_nominal(
    ratings: DataFrame, unit_col: str, label_col: str
) -> DataFrame:
    """Krippendorff's alpha for NOMINAL data over a (unit, label)
    ratings table (one row per individual rating; raters anonymous —
    alpha only needs the per-unit label multiset). The
    inter-annotator-agreement gate of RLHF/eval labeling pipelines:
    cohen_kappa covers exactly two raters, alpha handles any number,
    missing ratings, and >2 labels (Krippendorff 2004).

    Exact-integer formulation: with n_uc = count of label c in unit u
    and m_u = ratings in unit u,

        Do ∝ Σ_u [ Σ_{c≠k} n_uc·n_uk / (m_u − 1) ]
        De ∝ Σ_{c≠k} n_c·n_k / (n − 1)

    Units with m_u < 2 are dropped (standard — they carry no
    coincidence information). To stay in integers across units with
    DIFFERENT m_u, each unit's disagreement is scaled by
    L = lcm{m_u − 1} — here computed exactly over the observed m
    domain (tiny). Output one row: ``(n_units, n_ratings, do_scaled,
    scale_l, de_num, alpha_e6)`` where
    alpha = 1 − (do_scaled·(n−1)) / (L·de_num), e6-quantized from
    exact BIGINTs — the only float op is that one division.

    Plan: two hash aggregates (unit-label counts → per-unit pair
    sums; label counts) + domain-sized reductions. One corpus scan.
    """
    # Materialize the (unit,label) counts once: FOUR consumers read
    # this lineage (the m-domain collect, the Do aggregate, the kept-
    # units semi-join, the label totals) and without the checkpoint
    # each re-ran the ratings-source scan + first aggregate from
    # scratch (measured 5 repeated 0.4-0.6 s jobs at sf0.1).
    ul = (
        ratings.groupBy(
            F.col(unit_col).alias("u"), F.col(label_col).alias("c")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_uc"))
        .localCheckpoint(eager=False)
    )
    per_unit = (
        ul.groupBy("u")
        .agg(
            F.sum("n_uc").cast("bigint").alias("m_u"),
            F.sum(F.expr("n_uc * n_uc")).cast("bigint").alias("sq"),
        )
        .where(F.col("m_u") >= 2)
        .localCheckpoint(eager=False)
    )
    # Σ_{c≠k} n_uc·n_uk = m_u² − Σ n_uc²
    m_domain = [
        r["m_u"]
        for r in per_unit.select("m_u").distinct().collect()
    ]
    import math

    scale_l = 1
    for m in m_domain:
        scale_l = math.lcm(scale_l, int(m) - 1)
    do_scaled = per_unit.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_units"),
        F.sum(
            F.expr(f"(m_u * m_u - sq) * ({scale_l} div (m_u - 1))")
        )
        .cast("bigint")
        .alias("do_scaled"),
    )
    kept_units = per_unit.select("u")
    lab = (
        ul.join(kept_units, "u")
        .groupBy("c")
        .agg(F.sum("n_uc").cast("bigint").alias("n_c"))
    )
    de = lab.agg(
        F.sum("n_c").cast("bigint").alias("n_ratings"),
        (
            F.sum("n_c") * F.sum("n_c") - F.sum(F.expr("n_c * n_c"))
        )
        .cast("bigint")
        .alias("de_num"),
    )
    # de_num = 0 (a single label across every unit) has no expected
    # disagreement to normalize by; observed disagreement is then also
    # 0 — define alpha = 1 (perfect agreement) instead of 0/0
    alpha = (
        "case when de_num = 0 then 1000000 else"
        " cast(floor((1.0d - (cast(do_scaled as double)"
        " * cast(n_ratings - 1 as double))"
        f" / (cast({scale_l} as double) * cast(de_num as double)))"
        " * 1e6 + 0.5d) as bigint) end"
    )
    return do_scaled.crossJoin(de).select(
        "n_units",
        "n_ratings",
        "do_scaled",
        F.lit(scale_l).cast("bigint").alias("scale_l"),
        "de_num",
        F.expr(alpha).alias("alpha_e6"),
    )


def krippendorff_oracle_sql(
    ratings_sql: str, unit_col: str, label_col: str, scale_l: int
) -> str:
    """DuckDB twin of :func:`krippendorff_alpha_nominal`. ``scale_l``
    must equal the Spark side's lcm over the observed (m_u − 1) domain
    — pass the same constant (the caller knows the rating design; a
    mismatch changes do_scaled AND scale_l consistently, leaving
    alpha identical, but the hash compares the scaled columns too)."""
    return f"""
    WITH ka_ul AS (
      SELECT {unit_col} AS u, {label_col} AS c, COUNT(*) AS n_uc
      FROM ({ratings_sql}) ka_src GROUP BY 1, 2
    ),
    ka_unit AS (
      SELECT u, SUM(n_uc) AS m_u, SUM(n_uc * n_uc) AS sq
      FROM ka_ul GROUP BY u HAVING SUM(n_uc) >= 2
    ),
    ka_do AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
             CAST(SUM((m_u * m_u - sq) * ({scale_l} // (m_u - 1)))
                  AS BIGINT) AS do_scaled
      FROM ka_unit
    ),
    ka_lab AS (
      SELECT c, SUM(n_uc) AS n_c FROM ka_ul
      JOIN ka_unit USING (u) GROUP BY c
    ),
    ka_de AS (
      SELECT CAST(SUM(n_c) AS BIGINT) AS n_ratings,
             CAST(SUM(n_c) * SUM(n_c) - SUM(n_c * n_c) AS BIGINT)
               AS de_num
      FROM ka_lab
    )
    SELECT n_units, n_ratings, do_scaled,
           CAST({scale_l} AS BIGINT) AS scale_l, de_num,
           CASE WHEN de_num = 0 THEN 1000000 ELSE
             CAST(FLOOR((1.0 - (CAST(do_scaled AS DOUBLE)
                  * CAST(n_ratings - 1 AS DOUBLE))
                  / (CAST({scale_l} AS DOUBLE)
                     * CAST(de_num AS DOUBLE)))
                  * 1e6 + 0.5) AS BIGINT) END AS alpha_e6
    FROM ka_do CROSS JOIN ka_de
    """


# ---------------------------------------------------------------------
# Average precision / area under the precision-recall curve
# ---------------------------------------------------------------------

def auc_pr(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Average precision (area under the PR curve, step convention)
    from exact integer block counting — ROC-AUC's better-behaved
    sibling under class imbalance, the metric retrieval/filter-model
    evals actually report.

    Ties are handled at the DISTINCT-SCORE block level: walking blocks
    in descending score order with cumulative counts (cum_n, cum_pos),

        AP = Σ_b pos_b · (cum_pos_b / cum_n_b) / P

    i.e. every positive in a block takes the precision at the block
    BOUNDARY (the deterministic tie convention both engines share; a
    per-row walk would be tie-order-dependent). Each block term
    ``pos_b · cum_pos_b / cum_n_b`` is a ratio of exact integers
    (IEEE-deterministic division), round-half-up e9-quantized
    (``floor(x*1e9 + 0.5)``) BEFORE the exact
    cross-block sum — the psi recipe — and the final /P is one double
    division, CASE-guarded NULL when the input has no positives.

    ``score_col`` must be integer-typed, ``label_col`` boolean.
    Scale shape: one hash aggregate onto the score DOMAIN, one
    domain-sized cumulative window (bounded input — the auc_exact
    plan), one reduce. Output one row:
    ``(n, n_pos, ap_num_e9, ap)``.

    Reference scope note: extension-layer operator (no analogue in the
    reference library, which has no eval surface).
    """
    from pyspark.sql import Window

    counts = df.groupBy(F.col(score_col).alias("v")).agg(
        F.count(F.when(F.col(label_col), 1)).alias("pos"),
        F.count(F.lit(1)).alias("t"),
    )
    w = Window.orderBy(F.desc("v")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = counts.select(
        "pos",
        F.sum("t").over(w).alias("cum_n"),
        F.sum("pos").over(w).alias("cum_pos"),
        F.sum("pos").over(wt).alias("p_tot"),
        F.sum("t").over(wt).alias("n_tot"),
    )
    term = (
        "cast(floor(cast(pos as double) * cast(cum_pos as double)"
        " / cast(cum_n as double) * 1e9 + 0.5d) as decimal(38,0))"
    )
    return (
        cum.groupBy("p_tot", "n_tot")
        .agg(F.sum(F.expr(term)).alias("ap_num"))
        .select(
            F.col("n_tot").cast("bigint").alias("n"),
            F.col("p_tot").cast("bigint").alias("n_pos"),
            F.col("ap_num").cast("bigint").alias("ap_num_e9"),
            F.expr(
                "case when p_tot > 0 then cast(ap_num as double)"
                " / (cast(p_tot as double) * 1e9) else null end"
            ).alias("ap"),
        )
    )


def auc_pr_oracle_sql(
    scored_sql: str, score_col: str, label_col: str
) -> str:
    """DuckDB twin of :func:`auc_pr` (same block convention)."""
    return f"""
    WITH pr_counts AS (
      SELECT {score_col} AS v,
             COUNT(*) FILTER ({label_col}) AS pos,
             COUNT(*) AS t
      FROM ({scored_sql}) pr_src GROUP BY 1
    ),
    pr_cum AS (
      SELECT pos,
             SUM(t) OVER (ORDER BY v DESC) AS cum_n,
             SUM(pos) OVER (ORDER BY v DESC) AS cum_pos,
             SUM(pos) OVER () AS p_tot,
             SUM(t) OVER () AS n_tot
      FROM pr_counts
    )
    SELECT CAST(n_tot AS BIGINT) AS n,
           CAST(p_tot AS BIGINT) AS n_pos,
           CAST(SUM(CAST(FLOOR(CAST(pos AS DOUBLE)
                * CAST(cum_pos AS DOUBLE) / CAST(cum_n AS DOUBLE)
                * 1e9 + 0.5) AS DECIMAL(38,0))) AS BIGINT) AS ap_num_e9,
           CASE WHEN p_tot > 0 THEN
             CAST(SUM(CAST(FLOOR(CAST(pos AS DOUBLE)
                  * CAST(cum_pos AS DOUBLE) / CAST(cum_n AS DOUBLE)
                  * 1e9 + 0.5) AS DECIMAL(38,0))) AS DOUBLE)
             / (CAST(p_tot AS DOUBLE) * 1e9) END AS ap
    FROM pr_cum GROUP BY p_tot, n_tot
    """


# ---------------------------------------------------------------------
# Bradley-Terry pairwise-preference strengths (MM, e9 fixed-point)
# ---------------------------------------------------------------------

BT_P0 = 10**9  # e9 fixed-point strength scale
# n*SCALE div (p_i+p_j) and W*SCALE: exact while n, W <= ~9.2e5 (int64
# headroom) — at larger corpora shrink the scale (precision trades
# linearly)
BT_TERM_SCALE = 10**13


def bradley_terry_strengths(
    matches: DataFrame,
    winner_col: str = "winner",
    a_col: str = "m_a",
    b_col: str = "m_b",
    iters: int = 3,
) -> DataFrame:
    """Bradley-Terry strength ranking from a pairwise-match table — the
    Elo/leaderboard aggregate of arena-style RLHF evals (Bradley &
    Terry 1952; MM iteration per Hunter 2004, Ann. Statist. 32(1)).

    ``iters`` rounds of p_i' = W_i / Σ_j n_ij / (p_i + p_j) in exact
    e9 fixed-point: every per-pair term is integer-floor-divided
    BEFORE the exact BIGINT sum (the pagerank recipe) so any engine
    reproduces the arithmetic bit-for-bit; zero-win and isolated
    models take CASE-guarded 0. Scale shape: ONE pass over the match
    table builds (pair, n) and (model, wins) aggregates; the MM loop
    then runs entirely on the model-pair DOMAIN (|models|² rows,
    broadcast-joined) — corpus-size-independent per iteration.

    Output: ``(model, strength_e9, wins, n_matches)``.

    Reference scope note: extension-layer operator (no analogue in the
    reference library, which has no eval surface).
    """
    m = matches.select(
        F.col(winner_col).alias("winner"),
        F.col(a_col).alias("m_a"),
        F.col(b_col).alias("m_b"),
    ).localCheckpoint(eager=False)
    pairs = (
        m.select(F.col("m_a").alias("m_i"), F.col("m_b").alias("m_j"))
        .unionAll(m.select(F.col("m_b").alias("m_i"), F.col("m_a").alias("m_j")))
        .groupBy("m_i", "m_j")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=False)
    )
    models = pairs.select(F.col("m_i").alias("m")).distinct()
    wins = (
        models.join(
            m.groupBy(F.col("winner").alias("m")).agg(
                F.count(F.lit(1)).cast("bigint").alias("w")
            ),
            "m",
            "left",
        )
        .select("m", F.coalesce("w", F.lit(0)).cast("bigint").alias("w"))
        .localCheckpoint(eager=False)
    )
    # Loud int64-headroom guard (ADVICE r9): n*BT_TERM_SCALE and
    # w*BT_TERM_SCALE wrap silently in non-ANSI Spark once per-pair
    # match counts exceed INT64_MAX/BT_TERM_SCALE (~9.2e5), while the
    # DuckDB oracle raises — the engines would diverge silently.
    max_count = 9223372036854775807 // BT_TERM_SCALE
    hot = (
        pairs.agg(F.max("n").alias("mn"))
        .crossJoin(wins.agg(F.max("w").alias("mw")))
        .first()
    )
    if hot is not None and max(hot["mn"] or 0, hot["mw"] or 0) > max_count:
        raise ValueError(
            f"bradley_terry_strengths: per-pair match count or win count "
            f"{max(hot['mn'], hot['mw'])} exceeds the e13 fixed-point "
            f"int64 headroom ({max_count}); pre-aggregate matches (e.g. "
            f"sample or bucket the match log per pair) or lower "
            f"BT_TERM_SCALE before ranking"
        )
    n_models = models.count()
    if n_models == 0:
        return models.select(
            F.col("m").alias("model"),
            F.lit(0).cast("bigint").alias("strength_e9"),
            F.lit(0).cast("bigint").alias("wins"),
            F.lit(0).cast("bigint").alias("n_matches"),
        )
    p = models.select(
        "m", F.lit(BT_P0 // n_models).cast("bigint").alias("p")
    )
    for _ in range(iters):
        pi = p.select(F.col("m").alias("m_i"), F.col("p").alias("p_i"))
        pj = p.select(F.col("m").alias("m_j"), F.col("p").alias("p_j"))
        denom = (
            pairs.join(F.broadcast(pi), "m_i")
            .join(F.broadcast(pj), "m_j")
            .select(
                F.col("m_i").alias("m"),
                F.expr(
                    f"case when p_i + p_j > 0 then "
                    f"(n * {BT_TERM_SCALE}) div (p_i + p_j) "
                    f"else 0L end"
                ).alias("t"),
            )
            .groupBy("m")
            .agg(F.sum("t").alias("denom"))
        )
        p = wins.join(F.broadcast(denom), "m", "left").select(
            "m",
            F.expr(
                f"case when coalesce(denom, 0L) > 0 then "
                f"(w * {BT_TERM_SCALE}) div denom else 0L end"
            )
            .cast("bigint")
            .alias("p"),
        )
    n_matches = pairs.groupBy(F.col("m_i").alias("m")).agg(
        F.sum("n").alias("n_matches")
    )
    return (
        p.join(wins, "m")
        .join(F.broadcast(n_matches), "m", "left")
        .select(
            F.col("m").alias("model"),
            F.col("p").alias("strength_e9"),
            F.col("w").alias("wins"),
            F.coalesce("n_matches", F.lit(0)).cast("bigint").alias("n_matches"),
        )
    )
