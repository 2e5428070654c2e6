"""Distributed multinomial Naive Bayes text classification.

Curation pipelines run TRAINED filters next to the heuristic ones:
fastText-style language ID, quality classifiers scoring "is this page
like Wikipedia", domain routers (CCNet, GPT-3's quality filter, C4's
langdetect gate are all trained classifiers). A multinomial NB over
token counts is the distributed-friendly baseline of that family: the
model IS two aggregate tables, training is a pair of hash aggregates
over the corpus, and inference is one join — no gradient loop, no
driver state, scale-limited only by vocabulary size.

Model (add-one smoothing, all in integer 1e-6 log units):

- prior_e6(c)  = floor(ln(n_docs_c / N) * 1e6 + 0.5)
- lp_e6(w, c)  = floor(ln((cnt(w,c) + 1) / (tok_c + V)) * 1e6 + 0.5)
- unk_e6(c)    = floor(ln(        1      / (tok_c + V)) * 1e6 + 0.5)
- score(d, c)  = prior_e6(c) + Σ_w k(d,w) · (lp_e6(w,c) or unk_e6(c))
- prediction   = argmax_c score, ties broken by class name (max) — a
  total order, so the result is deterministic on any partitioning.

Determinism follows operators/lm.py's proven pattern: ``ln`` touches
only per-distinct-(w,c) values and is immediately floor-quantized to
integer units; every per-document reduction is an exact integer sum
(`round(ln, n)` is engine-nonportable — NOTES.md).

Scale shape: training = two hash aggregates (token-class key, class
key) + one broadcastable vocabulary count. Inference joins document
token counts against the model on (w, class) after a small-side
crossJoin with the class list — a #classes-way amplification that is
the right trade for label spaces up to hundreds; for larger label
spaces pivot the model to one row per token with per-class columns and
join on the token alone.

Reference scope note: the reference has no ML surface — this is the
LLM-data-pipeline extension layer (SURVEY.md §7 M5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_extensions_spark.functions.text import TOKEN_PATTERN


def _token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w, k) bag-of-words counts — row-local explode + one agg."""
    from spark_extensions_spark.session import ensure_parallelism

    # the tokenize+explode+partial-agg runs in the scan's stage; widen
    # an unsplittable one-row-group input first (no-op at scale)
    df = ensure_parallelism(df)
    return (
        df.select(
            F.col(id_col),
            F.explode(
                F.expr(
                    f"regexp_extract_all(lower({text_col}),"
                    f" '{TOKEN_PATTERN}', 0)"
                )
            ).alias("w"),
        )
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("k"))
    )


def nb_train(
    df: DataFrame, id_col: str, text_col: str, label_col: str
) -> dict[str, DataFrame]:
    """Train the model; returns {"priors": (label, prior_e6, unk_e6),
    "likelihood": (w, label, lp_e6)} — both vocabulary/label-sized
    artifacts, persistable as ordinary tables."""
    toks = _token_counts(df, id_col, text_col).join(
        df.select(id_col, F.col(label_col).alias("__c")), id_col
    )
    # Materialize the (class, token) counts once: vocab (broadcast),
    # ctot (twice) and likelihood all read this lineage, and without
    # the checkpoint each consumer re-ran the corpus tokenize + both
    # aggregates from scratch (measured as four repeated ~0.7 s
    # single-task jobs at sf0.1).
    cw = (
        toks.groupBy("__c", "w")
        .agg(F.sum("k").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    ctot = cw.groupBy("__c").agg(F.sum("cnt").alias("tok_c"))
    vocab = cw.select("w").distinct().agg(F.count(F.lit(1)).alias("v"))
    ndocs = df.groupBy(F.col(label_col).alias("__c")).agg(
        F.count(F.lit(1)).alias("n_docs_c")
    )
    total = df.agg(F.count(F.lit(1)).alias("n_total"))
    priors = (
        ndocs.crossJoin(F.broadcast(total))
        .join(ctot, "__c")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col("__c").alias("label"),
            F.expr(
                "cast(floor(ln(cast(n_docs_c as double)"
                " / cast(n_total as double)) * 1000000.0d + 0.5d)"
                " as bigint)"
            ).alias("prior_e6"),
            F.expr(
                "cast(floor(ln(1.0d / cast(tok_c + v as double))"
                " * 1000000.0d + 0.5d) as bigint)"
            ).alias("unk_e6"),
        )
    )
    likelihood = (
        cw.join(ctot, "__c")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w",
            F.col("__c").alias("label"),
            F.expr(
                "cast(floor(ln(cast(cnt + 1 as double)"
                " / cast(tok_c + v as double)) * 1000000.0d + 0.5d)"
                " as bigint)"
            ).alias("lp_e6"),
        )
    )
    return {"priors": priors, "likelihood": likelihood}


def nb_predict(
    model: dict[str, DataFrame], df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Classify; returns (id, label, score_e6) with exactly one row per
    input document (argmax with class-name tie-break).  Documents whose
    text tokenizes to zero tokens never reach the token join, so they
    are re-attached by a left join and fall back to the argmax of the
    class priors alone (the likelihood sum over an empty feature set is
    0) — the contract stays one row per input document."""
    toks = _token_counts(df, id_col, text_col)
    classes = model["priors"]
    scored = (
        toks.crossJoin(F.broadcast(classes))
        .join(model["likelihood"], ["w", "label"], "left")
        .groupBy(id_col, "label")
        .agg(
            (
                F.first("prior_e6")
                + F.sum(
                    F.col("k") * F.coalesce(F.col("lp_e6"), F.col("unk_e6"))
                )
            ).alias("score_e6")
        )
    )
    best = scored.groupBy(id_col).agg(
        F.max(F.struct("score_e6", "label")).alias("__b")
    )
    prior_best = classes.agg(
        F.max(
            F.struct(F.col("prior_e6").alias("score_e6"), F.col("label"))
        ).alias("__fb")
    )
    return (
        df.select(id_col)
        .join(best, id_col, "left")
        .crossJoin(F.broadcast(prior_best))
        .select(
            id_col,
            F.coalesce(F.col("__b.label"), F.col("__fb.label")).alias(
                "label"
            ),
            F.coalesce(F.col("__b.score_e6"), F.col("__fb.score_e6"))
            .cast("bigint")
            .alias("score_e6"),
        )
    )


def nb_classify_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
) -> str:
    """DuckDB SQL computing exactly nb_train + nb_predict on ``table``
    (self-train, self-predict) plus a correctness flag."""
    return f"""
    WITH tok AS (
      SELECT {id_col}, unnest(
               regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)
             ) AS w
      FROM {table}
    ), tc AS (
      SELECT {id_col}, w, count(*) AS k FROM tok GROUP BY 1, 2
    ), lab AS (
      SELECT {id_col}, {label_col} AS c FROM {table}
    ), cw AS (
      SELECT lab.c, tc.w, CAST(sum(tc.k) AS BIGINT) AS cnt
      FROM tc JOIN lab USING ({id_col}) GROUP BY 1, 2
    ), ctot AS (
      SELECT c, CAST(sum(cnt) AS BIGINT) AS tok_c FROM cw GROUP BY c
    ), v AS (
      SELECT count(DISTINCT w) AS v FROM cw
    ), nd AS (
      SELECT c, count(*) AS n_docs_c FROM lab GROUP BY c
    ), nt AS (
      SELECT count(*) AS n_total FROM lab
    ), priors AS (
      SELECT nd.c AS label,
             CAST(FLOOR(LN(CAST(n_docs_c AS DOUBLE)
                           / CAST(n_total AS DOUBLE))
                        * 1e6 + 0.5) AS BIGINT) AS prior_e6,
             CAST(FLOOR(LN(1.0 / CAST(tok_c + v AS DOUBLE))
                        * 1e6 + 0.5) AS BIGINT) AS unk_e6
      FROM nd CROSS JOIN nt JOIN ctot ON nd.c = ctot.c CROSS JOIN v
    ), lp AS (
      SELECT cw.w, cw.c AS label,
             CAST(FLOOR(LN(CAST(cnt + 1 AS DOUBLE)
                           / CAST(tok_c + v AS DOUBLE))
                        * 1e6 + 0.5) AS BIGINT) AS lp_e6
      FROM cw JOIN ctot ON cw.c = ctot.c CROSS JOIN v
    ), scored AS (
      SELECT tc.{id_col}, p.label,
             CAST(any_value(p.prior_e6)
                  + sum(tc.k * COALESCE(lp.lp_e6, p.unk_e6))
               AS BIGINT) AS score_e6
      FROM tc CROSS JOIN priors p
      LEFT JOIN lp ON lp.w = tc.w AND lp.label = p.label
      GROUP BY 1, 2
    ), best AS (
      SELECT {id_col}, label, score_e6,
             ROW_NUMBER() OVER (PARTITION BY {id_col}
                                ORDER BY score_e6 DESC, label DESC) AS rn
      FROM scored
    ), prior_best AS (
      SELECT label, prior_e6 FROM priors
      ORDER BY prior_e6 DESC, label DESC LIMIT 1
    )
    SELECT d.{id_col},
           COALESCE(b.label, pb.label) AS pred_label,
           COALESCE(b.score_e6, pb.prior_e6) AS score_e6,
           (COALESCE(b.label, pb.label) = d.{label_col}) AS is_correct
    FROM {table} d
    LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING ({id_col})
    CROSS JOIN prior_best pb
    """


# ---------------------------------------------------------------------
# Exact-integer decision-stump split selection (Gini impurity)
# ---------------------------------------------------------------------


def gini_split(
    df: DataFrame,
    feature_cols: list[str],
    target: Column | str,
) -> DataFrame:
    """Decision-stump split selection over categorical features with
    EXACT integer arithmetic — the feature-ranking step of tree
    ensembles (CART, Breiman et al. 1984) and of data-curation rule
    mining ("which metadata field best predicts the quality label?").

    For a binary ``target`` and each candidate feature F, the weighted
    Gini impurity of splitting on F is

        G(F) = Σ_b (n_b/n)·(1 − (pos_b/n_b)² − (neg_b/n_b)²)
             = Σ_b (n_b² − pos_b² − neg_b²) / (n_b · n)

    Every numerator/denominator is an exact integer; each branch term
    runs through DECIMAL(38,0) (n_b² reaches 1e20 at 1e10 rows, ×1e12
    fixed-point reaches 1e32 — int64 dies, decimals don't) and the
    division is a DECIMAL ``div`` → exact BIGINT e12 fixed point, so
    the ranking is bit-reproducible on any engine — float impurities
    tie-break nondeterministically exactly when two features are
    nearly equally good, which is the common case on weak features.

    Scale shape: ONE pass — a row-local ``stack`` explodes the k
    features (k× amplification, k is tiny), one map-side-combinable
    hash aggregate on (feature, value) produces the DOMAIN-sized
    branch table, and everything downstream runs on that. No window
    over the corpus, no per-feature rescan.

    Output: one row per feature —
    ``(feature, n_branches, gini_e12, gain_e12)`` where gain is the
    root impurity minus G(F), both e12 fixed point, all BIGINT.
    """
    k = len(feature_cols)
    stack_args = ", ".join(
        f"'{c}', cast({c} as string)" for c in feature_cols
    )
    tgt = F.col(target) if isinstance(target, str) else target
    pairs = df.select(
        F.expr(f"stack({k}, {stack_args}) as (feature, val)"),
        tgt.cast("int").alias("__y"),
    )
    branches = pairs.groupBy("feature", "val").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n_b"),
        F.sum("__y").cast("decimal(38,0)").alias("pos_b"),
    )
    wtot = Window.partitionBy("feature")
    terms = branches.select(
        "feature",
        F.sum("n_b").over(wtot).cast("decimal(38,0)").alias("n"),
        F.sum("pos_b").over(wtot).cast("decimal(38,0)").alias("pos"),
        F.col("n_b"),
        F.col("pos_b"),
    ).select(
        "feature",
        "n",
        "pos",
        F.expr(
            "((n_b * n_b - pos_b * pos_b"
            " - (n_b - pos_b) * (n_b - pos_b))"
            " * cast(1000000000000 as decimal(38,0)))"
            " div (n_b * n)"
        ).alias("term_e12"),
    )
    return (
        terms.groupBy("feature", "n", "pos")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_branches"),
            F.sum("term_e12").cast("bigint").alias("gini_e12"),
        )
        .select(
            "feature",
            "n_branches",
            "gini_e12",
            (
                F.expr(
                    "((n * n - pos * pos - (n - pos) * (n - pos))"
                    " * cast(1000000000000 as decimal(38,0)))"
                    " div (n * n)"
                )
                - F.col("gini_e12")
            )
            .cast("bigint")
            .alias("gain_e12"),
        )
    )


def gini_split_oracle_sql(
    source_sql: str, feature_cols: list[str], target_sql: str
) -> str:
    """DuckDB twin of :func:`gini_split` — HUGEINT products and ``//``
    floor division mirror the Spark side's DECIMAL(38,0) ``div``
    exactly (both are exact-integer floor quotients for positive
    operands)."""
    sel = " UNION ALL ".join(
        f"SELECT '{c}' AS feature, CAST({c} AS VARCHAR) AS val,"
        f" CAST(({target_sql}) AS INT) AS y FROM src"
        for c in feature_cols
    )
    return f"""
    WITH src AS ({source_sql}),
    gs_pairs AS ({sel}),
    gs_branch AS (
      SELECT feature, val,
             CAST(COUNT(*) AS HUGEINT) AS n_b,
             CAST(SUM(y) AS HUGEINT) AS pos_b
      FROM gs_pairs GROUP BY 1, 2
    ),
    gs_tot AS (
      SELECT feature, SUM(n_b) AS n, SUM(pos_b) AS pos
      FROM gs_branch GROUP BY 1
    ),
    gs_terms AS (
      SELECT b.feature, t.n, t.pos,
             ((b.n_b * b.n_b - b.pos_b * b.pos_b
               - (b.n_b - b.pos_b) * (b.n_b - b.pos_b))
              * 1000000000000::HUGEINT) // (b.n_b * t.n) AS term_e12
      FROM gs_branch b JOIN gs_tot t USING (feature)
    )
    SELECT feature,
           CAST(COUNT(*) AS BIGINT) AS n_branches,
           CAST(SUM(term_e12) AS BIGINT) AS gini_e12,
           CAST(((MAX(n) * MAX(n) - MAX(pos) * MAX(pos)
                  - (MAX(n) - MAX(pos)) * (MAX(n) - MAX(pos)))
                 * 1000000000000::HUGEINT) // (MAX(n) * MAX(n))
                - SUM(term_e12) AS BIGINT) AS gain_e12
    FROM gs_terms GROUP BY feature
    """
