"""Corpus n-gram language-model scoring (CCNet-style quality signal).

Training-data pipelines score every document against a language model
and filter/bucket by perplexity (CCNet, Gopher, FineWeb all do a
variant). A full KenLM is out of scope for a pure-Spark engine, but the
distributed shape is identical for any order-n count-based LM: build
n-gram count tables over the corpus (shuffle on the n-gram key), derive
smoothed log-probabilities, then join occurrences back and aggregate a
per-document score. This module implements a bigram add-one-smoothed LM
trained on the scored corpus itself — the self-perplexity outliers are
exactly the junk/boilerplate/word-salad documents a curation pass
drops.

100 TB shape: tokenization and bigram extraction are row-local
(``transform`` over the token array, zero shuffle); the count tables
are two hash aggregates (bigram key, then unigram key — partial
aggregation makes these cheap); the score join shuffles occurrences on
the bigram key (AQE broadcasts the LM table when the vocabulary is
small). No driver state, no collect, no Python UDFs — every expression
is codegen'd.

Determinism (Spark vs DuckDB value-hash): the smoothed probability is
formed from exact integer counts with one double division and one
``ln``, rounded to 6 decimals per *distinct* bigram; per-document sums
run in DECIMAL (order-free). A 1-ulp ``ln`` divergence between engines
would need to land within 2e-15 of a rounding boundary to flip a hash
— negligible at corpus vocabulary sizes.

Reference scope note: the reference library has no LM surface — this is
part of the LLM-data-pipeline extension layer (SURVEY.md §7 M5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_extensions_spark.functions.text import TOKEN_PATTERN


def _tokens(text_col: str) -> F.Column:
    return F.expr(
        f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)"
    )


def bigram_occurrences(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Explode each document into its (w1, w2) bigram occurrences.

    Row-local: one ``transform`` over the token array + ``inline`` —
    no shuffle, no self-join on token position.
    """
    return df.select(
        F.col(id_col),
        _tokens(text_col).alias("__ws"),
    ).select(
        id_col,
        F.expr(
            "inline(transform(slice(__ws, 1, greatest(size(__ws) - 1, 0)),"
            " (w, i) -> struct(w AS w1, element_at(__ws, i + 2) AS w2)))"
        ),
    )


def bigram_lm_table(bigrams: DataFrame) -> DataFrame:
    """Add-one-smoothed bigram log-probability table.

    ``lp_e6 = floor(ln((c(w1,w2) + 1) / (c(w1·) + V)) * 1e6 + 0.5)``
    (integer 1e-6 units; ``round(ln, 6)`` is engine-nonportable — Spark
    rescales via BigDecimal, DuckDB in double) where V is the corpus
    vocabulary size. Two hash aggregates + one small join; the result
    is one row per distinct bigram (vocabulary-sized, not
    corpus-sized) — the broadcastable LM artifact.
    """
    c2 = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = (
        bigrams.select(F.col("w1").alias("w"))
        .unionAll(bigrams.select(F.col("w2").alias("w")))
        .agg(F.countDistinct("w").alias("v"))
    )
    return (
        c2.join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.expr(
                "cast(floor(ln(cast(c2 + 1 as double)"
                " / cast(c1 + v as double)) * 1000000.0d + 0.5d)"
                " as bigint)"
            ).alias("lp_e6"),
        )
    )


def bigram_lm_scores(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Score every document by average negative log-probability under
    the corpus's own add-one bigram LM.

    Returns ``(id_col, n_bigrams bigint, nll double)`` — ``nll`` NULL
    for documents with fewer than two tokens. High ``nll`` = improbable
    text (word salad, boilerplate soup) — the curation filter signal.
    """
    bigrams = bigram_occurrences(df, id_col, text_col)
    lm = bigram_lm_table(bigrams)
    scored = (
        bigrams.join(lm, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            # sum of integer units is exact; units/n is an exact-int
            # double division — fully deterministic on both engines
            F.expr(
                "floor(-cast(sum(lp_e6) as double) / count(1) + 0.5d)"
                " / 1000000.0d"
            ).alias("nll"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0))
            .cast("bigint")
            .alias("n_bigrams"),
            F.col("nll"),
        )
    )


def bigram_lm_scores_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB SQL computing exactly :func:`bigram_lm_scores`."""
    return f"""
    WITH words AS (
      SELECT {id_col},
             regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)
               AS ws
      FROM {table}
    ), tok AS (
      SELECT {id_col}, unnest(ws) AS w,
             unnest(range(1, length(ws) + 1)) AS pos
      FROM words
    ), big AS (
      SELECT {id_col},
             lag(w) OVER (PARTITION BY {id_col} ORDER BY pos) AS w1,
             w AS w2
      FROM tok QUALIFY w1 IS NOT NULL
    ), c2 AS (
      SELECT w1, w2, count(*) AS c2 FROM big GROUP BY w1, w2
    ), c1 AS (
      SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY w1
    ), v AS (
      SELECT count(DISTINCT w) AS v
      FROM (SELECT w1 AS w FROM big UNION ALL SELECT w2 FROM big)
    ), lp AS (
      SELECT w1, w2,
             CAST(FLOOR(LN(CAST(c2 + 1 AS DOUBLE) / CAST(c1 + v AS DOUBLE))
                        * 1e6 + 0.5) AS BIGINT) AS lp_e6
      FROM c2 JOIN c1 USING (w1) CROSS JOIN v
    ), sc AS (
      SELECT {id_col}, count(*) AS n_bigrams,
             FLOOR(-CAST(sum(lp_e6) AS DOUBLE) / count(*) + 0.5)
               / 1e6 AS nll
      FROM big JOIN lp USING (w1, w2) GROUP BY {id_col}
    )
    SELECT d.{id_col},
           CAST(COALESCE(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           sc.nll
    FROM {table} d LEFT JOIN sc USING ({id_col})
    """


def domain_mixture_weights(
    df: DataFrame,
    domain_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    eta: float = 1.0,
) -> DataFrame:
    """Per-domain training-mixture weights from LM excess loss — the
    static single-round form of the DoReMi recipe (Xie et al. 2023,
    "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
    Pretraining"): domains whose text the corpus LM finds harder
    (higher mean NLL over the corpus's own bigram LM) get upweighted
    by ``softmax(eta * (mean_nll - min(mean_nll)))``.

    Scale shape: :func:`bigram_lm_scores` (two hash aggs + broadcast
    LM join) → one groupBy(domain) (domain-cardinality rows out, a
    broadcastable table) → softmax over that tiny table.  No driver
    state beyond the domain table.

    Determinism: per-doc ``nll`` is already e6-quantized, so summation
    runs in exact integer units; the softmax exponent is fixed-point
    floored at 1e8 (``exp`` is libm — the raw value is never compared),
    and each share is one exact-integer double division.

    Output: ``(domain, n_docs bigint, mean_nll_e6 bigint,
    weight_share double)``; ``weight_share`` sums to 1 over domains.
    """
    scored = bigram_lm_scores(df, id_col, text_col)
    dom = df.select(F.col(id_col), F.col(domain_col).alias("__dom"))
    per_dom = (
        scored.filter(F.col("n_bigrams") > 0)
        .join(dom, id_col)
        .groupBy("__dom")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            # nll = k/1e6 for integer k; *1e6 + floor(+0.5) recovers k
            F.sum(
                F.expr("cast(floor(nll * 1000000.0d + 0.5d) as bigint)")
            ).alias("sum_nll_e6"),
        )
        .select(
            F.col("__dom").alias(domain_col),
            "n_docs",
            # exact-int double division, floored back to integer units
            F.expr(
                "cast(floor(cast(sum_nll_e6 as double) / cast(n_docs "
                "as double) + 0.5d) as bigint)"
            ).alias("mean_nll_e6"),
        )
    )
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # domain-cardinality rows only — the global window is over the tiny
    # aggregated table, never the corpus
    exc = F.col("mean_nll_e6") - F.min("mean_nll_e6").over(wt)
    w_e8 = F.expr(
        f"cast(floor(exp({float(eta)}d * cast(__exc as double) / 1e6)"
        " * 100000000.0d + 0.5d) as bigint)"
    )
    return (
        per_dom.withColumn("__exc", exc)
        .withColumn("__w_e8", w_e8)
        .withColumn("__tot", F.sum("__w_e8").over(wt))
        .select(
            domain_col,
            "n_docs",
            "mean_nll_e6",
            (
                F.col("__w_e8").cast("double")
                / F.col("__tot").cast("double")
            ).alias("weight_share"),
        )
    )


def domain_mixture_oracle_sql(
    table: str = "documents",
    domain_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    eta: float = 1.0,
) -> str:
    """DuckDB twin of :func:`domain_mixture_weights`."""
    lm = bigram_lm_scores_oracle_sql(table, id_col, text_col)
    return f"""
    WITH scored AS ({lm}),
    per_dom AS (
      SELECT t.{domain_col},
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CAST(FLOOR(s.nll * 1e6 + 0.5) AS BIGINT))
                  AS BIGINT) AS sum_nll_e6
      FROM scored s JOIN {table} t ON t.{id_col} = s.{id_col}
      WHERE s.n_bigrams > 0
      GROUP BY t.{domain_col}
    ),
    m AS (
      SELECT {domain_col}, n_docs,
             CAST(FLOOR(CAST(sum_nll_e6 AS DOUBLE)
                        / CAST(n_docs AS DOUBLE) + 0.5) AS BIGINT)
               AS mean_nll_e6
      FROM per_dom
    ),
    e AS (
      SELECT *,
             CAST(FLOOR(EXP({float(eta)} * CAST(mean_nll_e6
                    - MIN(mean_nll_e6) OVER () AS DOUBLE) / 1e6)
                  * 1e8 + 0.5) AS BIGINT) AS w_e8
      FROM m
    )
    SELECT {domain_col}, n_docs, mean_nll_e6,
           CAST(w_e8 AS DOUBLE) / CAST(SUM(w_e8) OVER () AS DOUBLE)
             AS weight_share
    FROM e
    """
