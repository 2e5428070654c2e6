"""t2 query registry, batch 43: effect size, Lorenz curve, streaming
running distinct.

Registered into the shared registry (imported from queries42 at module
end). Same determinism rules as the queries.py docstring.

- ``stat_cramers_v``: chi-squared effect size — the scale-free
  association strength (chi² alone grows with n, so at corpus scale
  everything is "significant"); reuses the fixed-textual-order chi²
  terms plus one correctly-rounded sqrt.
- ``analytic_lorenz``: exact Lorenz curve deciles behind stat_gini —
  tie-block interpolation on the value domain, no row sort, all
  BIGINT outputs.
- ``streaming_running_distinct``: stateful streaming twin of the
  batch running COUNT(DISTINCT) window — per-key seen-value set in
  the state store (bounded by the value DOMAIN, not the event
  count), sharing the batch query's DuckDB oracle VERBATIM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_extensions_spark.operators.stats import (
    cramers_v_oracle_sql,
    lorenz_oracle_sql,
)
from spark_extensions_spark.queries import _register, _t

_CV_X = ["O", "F", "P"]
_CV_Y = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@_register(
    "stat_cramers_v",
    cramers_v_oracle_sql(
        "orders", "o_orderstatus", _CV_X, "o_orderpriority", _CV_Y
    ),
    doc="Cramér's V effect size over the orderstatus × orderpriority "
    "contingency table (operators/stats.py:cramers_v): "
    "V = sqrt(chi²/(n·min(r−1,c−1))) — the scale-free association "
    "strength a 100 TB drift gate can threshold where raw chi² "
    "cannot (it grows with n). Same one-aggregate-row plan and "
    "fixed-textual-order terms as stat_chi_squared; the extra math "
    "is one division + one correctly-rounded sqrt, engine-portable.",
)
def q_stat_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.operators.stats import cramers_v

    orders = _t(spark, sf_dir, "orders")["orders"]
    return cramers_v(
        orders, "o_orderstatus", _CV_X, "o_orderpriority", _CV_Y
    )


@_register(
    "analytic_lorenz",
    lorenz_oracle_sql("SELECT n_chars FROM documents", "n_chars", 10),
    doc="Exact Lorenz curve deciles of document lengths "
    "(operators/stats.py:lorenz_points) — the curve behind stat_gini "
    "('the shortest 30% of documents hold L(0.3) of the characters'). "
    "Band boundaries fall inside ONE tie block of the value domain, "
    "where every row carries the same value, so each cumulative mass "
    "is an exact BIGINT without any row-level sort: one hash "
    "aggregate, one domain-sized cumulative window, a 10-row band "
    "spine broadcast on. The concentration audit a data-mixing "
    "policy reads before capping domains.",
)
def q_analytic_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.operators.stats import lorenz_points

    docs = _t(spark, sf_dir, "documents")["documents"]
    return lorenz_points(docs, "n_chars", n_bands=10)


@_register(
    "streaming_running_distinct",
    """
    SELECT user_id, event_id,
           CAST(COUNT(DISTINCT event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS run_types
    FROM events
    """,
    doc="STREAMING running COUNT(DISTINCT event_type) per user "
    "(streaming/stateful.py:running_distinct_state, "
    "applyInPandasWithState): per-key state is the seen-type SET — "
    "bounded by the type DOMAIN, not the event count — emitted as "
    "one row per event over an availableNow replay. Shares the "
    "batch window form's DuckDB oracle VERBATIM (the state machine "
    "is hash-equal to both the batch first-occurrence algebra AND "
    "DuckDB's native distinct window), the strongest equivalence "
    "the harness expresses.",
)
def q_streaming_running_distinct(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from spark_extensions_spark.queries2 import _events_stream_path
    from spark_extensions_spark.streaming import (
        read_stream_parquet,
        run_available_now,
    )
    from spark_extensions_spark.streaming.stateful import (
        running_distinct_state,
    )

    stream = read_stream_parquet(
        spark, _events_stream_path(spark, sf_dir)
    ).select("user_id", "event_id", "ts", "event_type")
    out = running_distinct_state(
        stream, "user_id", "ts", "event_id", "event_type"
    )
    return run_available_now(out, output_mode="append", state_partitions=8)


# =====================================================================
# pass@k over per-user event samples
# =====================================================================

from spark_extensions_spark.operators.evals import pass_at_k_oracle_sql  # noqa: E402

_PAK_K = 5


@_register(
    "eval_pass_at_k",
    pass_at_k_oracle_sql(
        "SELECT user_id, event_type FROM events",
        "user_id",
        "event_type = 'purchase'",
        k=_PAK_K,
    ),
    doc="Unbiased pass@k estimator (operators/evals.py:pass_at_k; "
    "Chen et al. 2021): per problem (user) with n samples and c "
    "passes, 1 − C(n−c,k)/C(n,k) — both binomials are falling "
    "factorials over k consecutive integers divided by k!, EXACT in "
    "DECIMAL(38,0)/HUGEINT, emitted as e6 fixed point. The metric "
    "every best-of-n / verifier pipeline reports. ONE map-side-"
    "combinable aggregate + row-local closed-form math — no window, "
    "no join, no per-sample state.",
)
def q_eval_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.operators.evals import pass_at_k

    ev = _t(spark, sf_dir, "events")["events"]
    samples = ev.select(
        "user_id", (F.col("event_type") == "purchase").alias("passed")
    )
    return pass_at_k(samples, "user_id", "passed", k=_PAK_K)


# =====================================================================
# Count-Min sketch over document words
# =====================================================================

from spark_extensions_spark.operators.sketches import count_min_oracle_sql  # noqa: E402

_CM_D, _CM_W = 4, 64


@_register(
    "agg_count_min",
    count_min_oracle_sql(
        "SELECT UNNEST(regexp_extract_all(LOWER(text), '[a-z0-9]+'))"
        " AS term FROM documents",
        "term",
        d=_CM_D,
        w=_CM_W,
    ),
    doc="Count-Min sketch of the document word stream (operators/"
    "sketches.py:count_min_table; Cormode & Muthukrishnan 2005): "
    "4 md5-derived hash rows × 64 cells, every cell an EXACT count — "
    "the whole sketch table hash-checks, unlike engine-internal "
    "sketches (the rows-only HLL pair). Point estimates are "
    "min-over-rows downstream; merging shards is cell addition. "
    "Row-local ×4 expansion + ONE map-side-combinable aggregate: "
    "shuffle volume is 256·partitions regardless of corpus size.",
)
def q_agg_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.operators.sketches import count_min_table

    docs = _t(spark, sf_dir, "documents")["documents"]
    terms = docs.select(
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("term")
    )
    return count_min_table(terms, "term", d=_CM_D, w=_CM_W)


# =====================================================================
# Autocorrelation of the daily order-count series
# =====================================================================

from spark_extensions_spark.operators.timeseries import acf_oracle_sql  # noqa: E402


@_register(
    "ts_acf",
    acf_oracle_sql(
        "SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS v"
        " FROM orders GROUP BY 1",
        "d",
        "v",
        max_lag=14,
    ),
    doc="Sample autocorrelation of the daily order-count series at "
    "lags 1-14 (operators/timeseries.py:acf_exact): the rational "
    "mean clears exactly via u_t = n·x_t − S (Σu = 0), so every "
    "num/den is an exact BIGINT and acf is one final double "
    "division. The seasonality scan ts_decompose assumes — read "
    "acf(7) here first. One lead() window pass over the per-date "
    "aggregate (domain-sized bounded input) + a 14-row aggregate.",
)
def q_ts_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.operators.timeseries import acf_exact

    orders = _t(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("d")
    ).agg(F.count(F.lit(1)).alias("v"))
    return acf_exact(daily, "d", "v", max_lag=14)


# =====================================================================
# Bloom-prefiltered incremental exact dedup
# =====================================================================

from spark_extensions_spark.operators.sketches import (  # noqa: E402
    bloom_prefilter_dedup,
    bloom_prefilter_oracle_sql,
)

_BF_D, _BF_M = 3, 4096
_BF_HIST = "SELECT doc_id, md5(text) AS text_key FROM documents WHERE doc_id % 10 <> 0"
_BF_NEW = "SELECT doc_id, md5(text) AS text_key FROM documents WHERE doc_id % 10 = 0"


@_register(
    "dedup_bloom_incremental",
    bloom_prefilter_oracle_sql(
        _BF_NEW, _BF_HIST, "doc_id", "text_key", d=_BF_D, m=_BF_M
    ),
    doc="Bloom-prefiltered incremental exact dedup (operators/"
    "sketches.py:bloom_prefilter_dedup): the historical corpus is "
    "scanned ONCE into <= 4096 set bits (3 md5 hashes, "
    "deterministic — the filter itself hash-checks); each new batch "
    "does row-local hashing + broadcast bit-membership joins, and "
    "ONLY the maybe-dup subset pays the exact key join. False "
    "positives surface as maybe AND NOT confirmed (FPR ~ "
    "(1-e^{-dn/m})^d); Bloom never false-negatives, so confirmed => "
    "maybe (pinned). THE 100 TB ingest pattern: per-batch cost is "
    "independent of corpus size outside the FPR-bounded probe set.",
)
def q_dedup_bloom_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    keyed = docs.select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("text_key")
    )
    hist = keyed.where(F.expr("doc_id % 10 <> 0"))
    new = keyed.where(F.expr("doc_id % 10 = 0"))
    return bloom_prefilter_dedup(
        new, hist, "doc_id", "text_key", d=_BF_D, m=_BF_M
    )


# batch 44 registers at import time, same chain as queries42 -> 43
from spark_extensions_spark import queries44  # noqa: E402,F401  (registration side effect)
