"""t2 query registry, batch 41: generalized row-pattern matching.

Registered into the shared registry (imported from queries40 at module
end). Same determinism rules as the queries.py docstring.

- ``analytic_match_pattern``: the MATCH_RECOGNIZE-style variable-
  length pattern operator (``operators/patterns.py:match_pattern``) on
  the event stream — ``view click* purchase`` per user within 1 day.
  The fixed lead()-chain ``analytic_pattern_match`` is its degenerate
  exactly-one-middle case (equivalence pinned in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_extensions_spark.operators.evals import (
    auc_exact_oracle_sql,
    calibration_ece_oracle_sql,
    poisson_bootstrap_oracle_sql,
)
from spark_extensions_spark.operators.patterns import (
    match_pattern,
    match_pattern_oracle_sql,
)
from spark_extensions_spark.queries import _register, _t

_MP_WITHIN = 86_400  # seconds — purchases within a day of the view


@_register(
    "analytic_match_pattern",
    match_pattern_oracle_sql(
        "SELECT user_id, event_id, ts, event_type FROM events",
        ["user_id"],
        ["ts", "event_id"],
        "event_type = 'view'",
        "event_type = 'click'",
        "event_type = 'purchase'",
        "event_id",
        ts_col="ts",
        min_mid=0,
        within_seconds=_MP_WITHIN,
    ),
    doc="Generalized MATCH_RECOGNIZE-style pattern "
    "(operators/patterns.py:match_pattern): view → click* → purchase "
    "per user within 1 day, with a VARIABLE-length middle — the "
    "shape the fixed lead()-chain (analytic_pattern_match) cannot "
    "express. Pure window algebra: one shuffle on user_id, running "
    "non-B counts + last-A state via last(ignorenulls); exact "
    "integer span arithmetic and microsecond time bounds; oracle is "
    "the identical window recursion in DuckDB.",
)
def q_analytic_match_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")["events"]
    return match_pattern(
        ev,
        ["user_id"],
        ["ts", "event_id"],
        F.col("event_type") == "view",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
        "event_id",
        ts_col="ts",
        min_mid=0,
        within_seconds=_MP_WITHIN,
    )


# =====================================================================
# Exact AUC + calibration evals (classifier-quality layer)
# =====================================================================

# deterministic integer signal: distinct-word count "predicts" English
_AUC_SCORE_SPARK = (
    "size(array_distinct(regexp_extract_all(lower(text), '[a-z0-9]+', 0)))"
)
_AUC_SCORE_DUCK = (
    "len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')))"
)


@_register(
    "eval_auc_exact",
    auc_exact_oracle_sql(
        f"SELECT {_AUC_SCORE_DUCK} AS score, lang = 'en' AS y"
        " FROM documents",
        "score",
        "y",
    ),
    doc="Tie-aware ROC AUC (operators/evals.py:auc_exact) of a "
    "deterministic integer signal (distinct-word count) against the "
    "is-English label: exact integer pair counting over the score "
    "DOMAIN — one hash agg + a domain-sized cumulative window "
    "(bounded input), correct-pair numerator and counts are BIGINT, "
    "one final double division of exactly-representable ints "
    "(auc_e6). The eval every learned quality filter needs before "
    "it gates a corpus.",
)
def q_eval_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.operators.evals import auc_exact

    docs = _t(spark, sf_dir, "documents")["documents"]
    scored = docs.select(
        F.expr(_AUC_SCORE_SPARK).alias("score"),
        (F.col("lang") == "en").alias("y"),
    )
    return auc_exact(scored, "score", "y")


@_register(
    "eval_calibration",
    calibration_ece_oracle_sql(
        f"""SELECT CAST((1000 * s) // (s + 20) AS INT) AS conf_e3,
                   lang = 'en' AS y
            FROM (SELECT {_AUC_SCORE_DUCK} AS s, lang FROM documents)""",
        "conf_e3",
        "y",
        bins=10,
    ),
    doc="Reliability diagram + ECE numerators "
    "(operators/evals.py:calibration_ece): integer milli-unit "
    "confidences (a saturating transform of the distinct-word "
    "signal) bucketed into 10 equal-width bins; per-bin "
    "|1000·pos − Σconf_e3| is an EXACT integer (the per-bin "
    "divisions cancel), so the whole calibration table is "
    "hash-verified — ECE itself is Σ gap_e3 / (1000·N) downstream. "
    "One hash aggregate; no window at all.",
)
def q_eval_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.operators.evals import calibration_ece

    docs = _t(spark, sf_dir, "documents")["documents"]
    scored = docs.select(
        F.expr(
            f"cast(({_AUC_SCORE_SPARK} * 1000)"
            f" div ({_AUC_SCORE_SPARK} + 20) as int)"
        ).alias("conf_e3"),
        (F.col("lang") == "en").alias("y"),
    )
    return calibration_ece(scored, "conf_e3", "y", bins=10)


@_register(
    "eval_bootstrap_ci",
    poisson_bootstrap_oracle_sql(
        "SELECT doc_id, n_chars FROM documents",
        "doc_id",
        "n_chars",
        n_replicates=50,
    ),
    doc="Deterministic Poisson-bootstrap uncertainty for a corpus "
    "metric (operators/evals.py:poisson_bootstrap_replicates; "
    "Chamandy et al. 2012): 50 replicates of mean document length, "
    "each row weighted Poisson(1) via md5 inverse-CDF integer "
    "thresholds — reproducible on any cluster layout, no RNG state. "
    "One explode + ONE map-side-combinable aggregate: partial state "
    "collapses to B rows per partition before the shuffle, so "
    "shuffle volume is B×partitions regardless of corpus size. The "
    "B-row replicate table is fully hash-verified; the 2.5/97.5% "
    "quantiles of mean_e6 are the CI.",
)
def q_eval_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.operators.evals import (
        poisson_bootstrap_replicates,
    )

    docs = _t(spark, sf_dir, "documents")["documents"]
    return poisson_bootstrap_replicates(
        docs, "doc_id", "n_chars", n_replicates=50
    )


# =====================================================================
# Winnowing (rolling-hash fingerprint) dedup candidates
# =====================================================================

_WN_K, _WN_W, _WN_MIN = 5, 4, 3


def _winnow_oracle() -> str:
    from spark_extensions_spark.operators.dedup import (
        winnow_fingerprints_oracle_sql,
    )

    fps = winnow_fingerprints_oracle_sql(
        "SELECT doc_id, text FROM documents",
        "doc_id",
        "text",
        k=_WN_K,
        w=_WN_W,
    )
    # pair expansion as the naive fp-keyed self-join (the oracle runs
    # at sf0.01 scale; the LATERAL computed-bound slice form this
    # replaces is on the banned-construct list for graded oracles —
    # row-dependent slice bounds are a known cross-DuckDB-version
    # divergence class, NOTES.md round-5 post-mortem)
    return f"""
    WITH wn_fps AS ({fps})
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM wn_fps a JOIN wn_fps b
      ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= {_WN_MIN}
    """


@_register(
    "dedup_winnowing",
    _winnow_oracle(),
    doc="Winnowing fingerprint dedup (operators/dedup.py:"
    "winnow_fingerprints; Schleimer et al. 2003, the MOSS scheme): "
    "word 5-gram md5 hashes, every 4-hash window contributes its "
    "minimum, distinct selected values are the document fingerprint "
    "set (expected density 2/(w+1) of grams, DETERMINISTIC guarantee: "
    "shared runs >= w+k-1 words share a fingerprint — unlike "
    "probabilistic MinHash). Candidates = grouped row-local pair "
    "expansion over fingerprint posting lists, >= 3 shared. Per-doc "
    "partitioned window min — no single-partition stage; the "
    "fingerprint index is ~1/3 the size of the full shingle set.",
)
def q_dedup_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.operators.dedup import (
        winnow_candidates,
        winnow_fingerprints,
    )

    docs = _t(spark, sf_dir, "documents")["documents"]
    fps = winnow_fingerprints(docs, "doc_id", "text", k=_WN_K, w=_WN_W)
    return winnow_candidates(fps, "doc_id", min_shared=_WN_MIN)


@_register(
    "streaming_match_pattern",
    match_pattern_oracle_sql(
        "SELECT user_id, event_id, ts, event_type FROM events",
        ["user_id"],
        ["ts", "event_id"],
        "event_type = 'view'",
        "event_type = 'click'",
        "event_type = 'purchase'",
        "event_id",
        ts_col="ts",
        min_mid=0,
        within_seconds=_MP_WITHIN,
    ),
    doc="STREAMING CEP: the same view->click*->purchase pattern as "
    "analytic_match_pattern, detected by the stateful sequential "
    "recurrence (streaming/stateful.py:pattern_match_state, "
    "applyInPandasWithState — three longs of state per key, no "
    "buffered rows) over an availableNow replay. Shares the batch "
    "query's DuckDB window-recursion oracle verbatim: the streaming "
    "state machine is hash-equal to the batch window algebra, the "
    "strongest equivalence the harness can express.",
)
def q_streaming_match_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.queries2 import _events_stream_path
    from spark_extensions_spark.streaming import (
        read_stream_parquet,
        run_available_now,
    )
    from spark_extensions_spark.streaming.stateful import (
        pattern_match_state,
    )

    stream = read_stream_parquet(
        spark, _events_stream_path(spark, sf_dir)
    ).select(
        "user_id",
        "event_id",
        "ts",
        (F.col("event_type") == "view").alias("is_a"),
        (F.col("event_type") == "click").alias("is_b"),
        (F.col("event_type") == "purchase").alias("is_c"),
    )
    out = pattern_match_state(
        stream,
        "user_id",
        "ts",
        "event_id",
        "is_a",
        "is_b",
        "is_c",
        min_mid=0,
        within_seconds=_MP_WITHIN,
    )
    return run_available_now(out, output_mode="append", state_partitions=8)


# batch 42 registers at import time, same chain as queries40 -> 41
from spark_extensions_spark import queries42  # noqa: E402,F401  (registration side effect)
