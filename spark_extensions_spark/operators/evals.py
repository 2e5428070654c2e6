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
