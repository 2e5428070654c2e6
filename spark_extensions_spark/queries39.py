"""t2 query registry, batch 39: classifier evaluation harness.

Registered into the shared registry (imported from queries38 at module
end). Same determinism rules as the queries.py docstring.

- ``eval_classifier_f1``: per-class precision / recall / F1 of the
  Naive-Bayes language classifier against the true labels — the
  model-quality gate that decides whether a learned filter replaces a
  heuristic one in the curation pipeline. Confusion counts are exact
  integers; the metrics are e6 fixed-point integer arithmetic, so the
  whole eval is hash-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_extensions_spark.queries import _register, _t
from spark_extensions_spark.operators.classify import (
    nb_classify_oracle_sql,
    nb_predict,
    nb_train,
)


def _f1_oracle() -> str:
    preds = nb_classify_oracle_sql("documents", "doc_id", "text", "lang")
    return f"""
    WITH preds AS (
      SELECT doc_id, pred_label FROM ({preds}) t
    ),
    rows_ AS (
      SELECT p.pred_label AS pred, d.lang AS truth
      FROM preds p JOIN documents d USING (doc_id)
    ),
    by_pred AS (
      SELECT pred AS label,
             CAST(COUNT(*) FILTER (pred = truth) AS BIGINT) AS tp,
             CAST(COUNT(*) FILTER (pred <> truth) AS BIGINT) AS fp
      FROM rows_ GROUP BY pred
    ),
    by_truth AS (
      SELECT truth AS label,
             CAST(COUNT(*) FILTER (pred <> truth) AS BIGINT) AS fn
      FROM rows_ GROUP BY truth
    ),
    conf AS (
      SELECT COALESCE(p.label, t.label) AS label,
             COALESCE(tp, 0) AS tp, COALESCE(fp, 0) AS fp,
             COALESCE(fn, 0) AS fn
      FROM by_pred p FULL OUTER JOIN by_truth t ON p.label = t.label
    ),
    pr AS (
      SELECT label, tp, fp, fn,
             CASE WHEN tp + fp = 0 THEN 0
                  ELSE (tp * 1000000) // (tp + fp) END AS precision_e6,
             CASE WHEN tp + fn = 0 THEN 0
                  ELSE (tp * 1000000) // (tp + fn) END AS recall_e6
      FROM conf
    )
    SELECT label, tp, fp, fn,
           CAST(precision_e6 AS BIGINT) AS precision_e6,
           CAST(recall_e6 AS BIGINT) AS recall_e6,
           CAST(CASE WHEN precision_e6 + recall_e6 = 0 THEN 0
                     ELSE (2 * precision_e6 * recall_e6)
                          // (precision_e6 + recall_e6) END AS BIGINT)
             AS f1_e6
    FROM pr
    """


@_register(
    "eval_classifier_f1",
    _f1_oracle(),
    doc="Classifier eval harness: per-class precision/recall/F1 of the "
    "distributed Naive-Bayes language classifier (operators/"
    "classify.py) against the true labels. Confusion counts come from "
    "two hash aggregates over the per-doc (truth, pred) pairs (by "
    "predicted class for tp/fp, by true class for fn) full-outer "
    "merged on the class — every stage is class- or doc-keyed, no "
    "driver state; the metrics are cross-multiplied e6 fixed-point "
    "INTEGER divisions (F1 computed from the e6 ints, same formula "
    "both engines), so the eval is hash-exact. The gate that decides "
    "whether a learned filter replaces a heuristic in the curation "
    "pipeline.",
)
def q_eval_classifier_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    model = nb_train(docs, "doc_id", "text", "lang")
    pred = nb_predict(model, docs, "doc_id", "text")
    # two aggregate branches (by pred, by truth) read the prediction
    # set — checkpoint it so the NB train+predict dataflow (inherently
    # join-heavy) executes ONCE instead of once per branch
    rows = (
        pred.join(docs.select("doc_id", "lang"), "doc_id")
        .select(F.col("label").alias("pred"), F.col("lang").alias("truth"))
        .localCheckpoint(eager=False)
    )
    by_pred = rows.groupBy(F.col("pred").alias("label")).agg(
        F.count(F.when(F.col("pred") == F.col("truth"), 1)).alias("tp"),
        F.count(F.when(F.col("pred") != F.col("truth"), 1)).alias("fp"),
    )
    by_truth = rows.groupBy(F.col("truth").alias("label")).agg(
        F.count(F.when(F.col("pred") != F.col("truth"), 1)).alias("fn")
    )
    conf = (
        by_pred.join(by_truth, "label", "full_outer")
        .select(
            "label",
            F.coalesce("tp", F.lit(0)).alias("tp"),
            F.coalesce("fp", F.lit(0)).alias("fp"),
            F.coalesce("fn", F.lit(0)).alias("fn"),
        )
    )
    pr = conf.select(
        "label",
        "tp",
        "fp",
        "fn",
        F.when(F.col("tp") + F.col("fp") == 0, F.lit(0))
        .otherwise(F.expr("(tp * 1000000) div (tp + fp)"))
        .alias("precision_e6"),
        F.when(F.col("tp") + F.col("fn") == 0, F.lit(0))
        .otherwise(F.expr("(tp * 1000000) div (tp + fn)"))
        .alias("recall_e6"),
    )
    return pr.select(
        "label",
        "tp",
        "fp",
        "fn",
        F.col("precision_e6").cast("bigint").alias("precision_e6"),
        F.col("recall_e6").cast("bigint").alias("recall_e6"),
        F.when(F.col("precision_e6") + F.col("recall_e6") == 0, F.lit(0))
        .otherwise(
            F.expr(
                "(2 * precision_e6 * recall_e6)"
                " div (precision_e6 + recall_e6)"
            )
        )
        .cast("bigint")
        .alias("f1_e6"),
    )

from spark_extensions_spark import queries40  # noqa: E402,F401  (registration side effect)
