"""t2 query registry, batch 18: LM scoring, token-budget sampling,
deterministic shuffle order, winsorization, time-series gap-fill.

Registered into the shared registry (imported from queries14 at module
end). Same determinism rules as the queries.py docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_extensions_spark.queries import _register, _t
from spark_extensions_spark.functions.text import token_count
from spark_extensions_spark.operators.lm import (
    bigram_lm_scores,
    bigram_lm_scores_oracle_sql,
)
from spark_extensions_spark.operators.sampling import (
    deterministic_shuffle,
    hash_bucket_duck,
    token_budget_cap,
)
from spark_extensions_spark.operators.timeseries import gapfill_grid


@_register(
    "lm_perplexity",
    bigram_lm_scores_oracle_sql("documents", "doc_id", "text"),
    doc="Corpus self-perplexity under an add-one bigram LM "
    "(operators/lm.py:bigram_lm_scores) — the CCNet/FineWeb quality "
    "signal. Bigram extraction is row-local (transform over the token "
    "array, no positional self-join); the LM table is two hash aggs; "
    "scoring shuffles occurrences on the bigram key (AQE broadcasts "
    "small vocabularies). Per-distinct-bigram log-probs rounded to 6dp "
    "then DECIMAL-summed per doc — order-free, engine-portable.",
)
def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    return bigram_lm_scores(docs, "doc_id", "text")


_TOKENS_DUCK = (
    "CAST(COALESCE(list_sum(list_transform("
    "regexp_extract_all(lower(text), '[a-z0-9]+'), "
    "w -> CAST(ceil(length(w) / 4.0) AS BIGINT))), 0) AS BIGINT)"
)


@_register(
    "sample_token_budget",
    f"""
    WITH toks AS (
      SELECT doc_id, source, {_TOKENS_DUCK} AS n_tokens FROM documents
    ), cum AS (
      SELECT doc_id, source, n_tokens,
             CAST(SUM(n_tokens) OVER (
               PARTITION BY source
               ORDER BY {hash_bucket_duck('doc_id', 'budget', 1 << 60)},
                        doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_tokens
      FROM toks
    )
    SELECT doc_id, source, n_tokens, cum_tokens
    FROM cum WHERE cum_tokens <= 3000
    """,
    doc="Token-budgeted subsampling (operators/sampling.py:"
    "token_budget_cap): training mixes are specified in tokens, not "
    "docs — take documents per source in deterministic md5 order until "
    "3000 tokens accumulate. One shuffle (window on source); selection "
    "is independent of input order and cluster layout.",
)
def q_sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    with_tok = docs.select(
        "doc_id", "source", token_count("text").alias("n_tokens")
    )
    return token_budget_cap(
        with_tok, "source", "doc_id", "n_tokens", budget=3000
    ).select("doc_id", "source", "n_tokens", "cum_tokens")


@_register(
    "sample_shuffle_index",
    f"""
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (
             ORDER BY {hash_bucket_duck('doc_id', 'shuffle', 1 << 60)},
                      doc_id
           ) - 1 AS BIGINT) AS shuffle_pos
    FROM documents
    """,
    doc="Deterministic global shuffle order (operators/sampling.py:"
    "deterministic_shuffle): reproducible pseudo-random training order "
    "via the two-phase sort-index — range partition on md5(key), local "
    "sort, per-partition monotonic ids offset by partition counts "
    "(driver sees one integer per partition). No single-partition "
    "global window; the oracle IS that global window, proving "
    "equivalence of the distributed shape.",
)
def q_sample_shuffle_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    return deterministic_shuffle(docs.select("doc_id"), "doc_id").select(
        "doc_id", "shuffle_pos"
    )


@_register(
    "feature_winsorize",
    """
    WITH bounds AS (
      SELECT c_mktsegment,
             FLOOR(quantile_cont(c_acctbal, 0.05) * 1e6 + 0.5)
               / 1e6 AS p05,
             FLOOR(quantile_cont(c_acctbal, 0.95) * 1e6 + 0.5)
               / 1e6 AS p95
      FROM customer GROUP BY c_mktsegment
    )
    SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal,
           least(greatest(c.c_acctbal, b.p05), b.p95) AS acctbal_clipped
    FROM customer c JOIN bounds b USING (c_mktsegment)
    """,
    doc="Per-group winsorization (outlier clipping to the exact "
    "5th/95th percentile): one small percentile aggregate per group, "
    "broadcast back, row-local clip. The feature-normalization pass a "
    "curation pipeline runs before model scoring; at 100 TB the bounds "
    "table is group-cardinality-sized, so the fact side never "
    "shuffles. Spark exact `percentile` == DuckDB quantile_cont "
    "(both linear interpolation), floor-quantized to 6dp before the "
    "clip (identical double ops on both engines).",
)
def q_feature_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")["customer"]
    bounds = c.groupBy("c_mktsegment").agg(
        F.expr(
            "floor(percentile(c_acctbal, 0.05) * 1000000.0d + 0.5d)"
            " / 1000000.0d"
        ).alias("p05"),
        F.expr(
            "floor(percentile(c_acctbal, 0.95) * 1000000.0d + 0.5d)"
            " / 1000000.0d"
        ).alias("p95"),
    )
    return (
        c.join(F.broadcast(bounds), "c_mktsegment")
        .select(
            "c_custkey",
            "c_mktsegment",
            "c_acctbal",
            F.least(
                F.greatest(F.col("c_acctbal"), F.col("p05")), F.col("p95")
            ).alias("acctbal_clipped"),
        )
    )


@_register(
    "ts_gapfill",
    """
    WITH bucketed AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket_ts,
             max(value) AS v
      FROM events GROUP BY user_id, date_trunc('hour', ts)
    ), spans AS (
      SELECT user_id, min(bucket_ts) AS lo, max(bucket_ts) AS hi
      FROM bucketed GROUP BY user_id
    ), grid AS (
      SELECT user_id,
             unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_ts
      FROM spans
    )
    SELECT g.user_id, g.bucket_ts,
           last_value(b.v IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.bucket_ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value,
           b.v IS NULL AS filled
    FROM grid g
    LEFT JOIN bucketed b
      ON g.user_id = b.user_id AND g.bucket_ts = b.bucket_ts
    """,
    doc="Per-key dense time grid + forward fill (operators/"
    "timeseries.py:gapfill_grid): hour buckets (max-aggregated — "
    "order-free, unlike a double avg), sequence() between each key's "
    "span (row-local explode after the min/max agg, so grid size is "
    "span/step per key, not event count), left join observed buckets, "
    "one last(ignorenulls) window pass. Grid and events hash-partition "
    "on the key; no driver state.",
)
def q_ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")["events"]
    return gapfill_grid(
        ev, "user_id", "ts", "value", step="1 hour", trunc_unit="hour"
    )


def _incremental_minhash_oracle() -> str:
    from spark_extensions_spark.queries import _minhash_bands_cte

    return f"""
    {_minhash_bands_cte()}
    SELECT DISTINCT n.doc_id AS new_id, i.doc_id AS index_id
    FROM bands n JOIN bands i
      ON n.band_idx = i.band_idx AND n.band_key = i.band_key
    WHERE n.doc_id % 10 = 0 AND i.doc_id % 10 <> 0
    """


@_register(
    "dedup_incremental",
    _incremental_minhash_oracle(),
    doc="Incremental near-dup check of a new ingest batch against the "
    "existing corpus (operators/dedup.py:"
    "minhash_lsh_candidates_incremental): only the new batch's LSH "
    "bands join the persisted corpus band index "
    "(minhash_band_table) — no corpus self-join, no batch re-pairing; "
    "with the index bucketed on the band key the corpus side never "
    "shuffles. THE daily-dedup shape at 100 TB. Batch = doc_id%10==0, "
    "index = the rest; oracle joins the same band CTE with the roles "
    "fixed.",
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.operators.dedup import (
        minhash_lsh_candidates_incremental,
    )

    docs = _t(spark, sf_dir, "documents")["documents"]
    new_batch = docs.filter(F.col("doc_id") % 10 == 0)
    index = docs.filter(F.col("doc_id") % 10 != 0)
    return minhash_lsh_candidates_incremental(
        new_batch, index, "doc_id", "text"
    )


def _url_variants_duck() -> str:
    return """
      SELECT doc_id,
             'https://' || source || '.org/doc/' || doc_id AS url
      FROM documents
      UNION ALL
      SELECT doc_id,
             'HTTPS://' || upper(source) || '.ORG/doc/' || doc_id
               || '/?utm_source=feed&fbclid=x17#top' AS url
      FROM documents
    """


def _url_oracle() -> str:
    from spark_extensions_spark.functions.url import url_canonicalize_duck

    return f"""
    WITH urls AS ({_url_variants_duck()})
    SELECT {url_canonicalize_duck('url')} AS canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_variants,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id
    FROM urls GROUP BY 1
    """


@_register(
    "url_canonical_dedup",
    _url_oracle(),
    doc="URL canonicalization dedup (functions/url.py:url_canonicalize): "
    "lowercase scheme/host, strip fragment + tracking params (utm_*, "
    "fbclid, …), sort surviving query params, trim trailing slash — "
    "then group by canonical URL. Two deterministic spellings per doc "
    "collapse to one canonical key. Row-local built-ins (parse_url + "
    "array HOFs), zero shuffle before the final dedup agg — the first "
    "pass of a crawl pipeline.",
)
def q_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.functions.url import url_canonicalize

    docs = _t(spark, sf_dir, "documents")["documents"]
    v1 = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".org/doc/"),
            F.col("doc_id"),
        ).alias("url"),
    )
    v2 = docs.select(
        "doc_id",
        F.concat(
            F.lit("HTTPS://"),
            F.upper(F.col("source")),
            F.lit(".ORG/doc/"),
            F.col("doc_id"),
            F.lit("/?utm_source=feed&fbclid=x17#top"),
        ).alias("url"),
    )
    urls = v1.unionByName(v2)
    return (
        urls.select(
            "doc_id", url_canonicalize("url").alias("canonical_url")
        )
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_variants"),
            F.min("doc_id").alias("keep_id"),
        )
    )


def _minhash_bands_cte_indented() -> str:
    """The bands CTE chain without the leading WITH, for splicing into a
    larger WITH list."""
    from spark_extensions_spark.queries import _minhash_bands_cte

    return _minhash_bands_cte().strip().removeprefix("WITH").strip()


def _gopher_oracle() -> str:
    from spark_extensions_spark.functions.text import STOPWORDS

    stop = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    ws = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    n = f"len({ws})"
    mean = (
        f"CASE WHEN {n} = 0 THEN 0.0 ELSE FLOOR("
        f"list_sum(list_transform({ws}, w -> length(w)))"
        f" / CAST({n} AS DOUBLE) * 1e6 + 0.5) / 1e6 END"
    )
    nsym = r"len(regexp_extract_all(text, '#|\.\.\.'))"
    sym = (
        f"CASE WHEN {n} = 0 THEN 0.0 "
        f"ELSE FLOOR({nsym} / CAST({n} AS DOUBLE)"
        f" * 1e6 + 0.5) / 1e6 END"
    )
    nalpha = f"len(list_filter({ws}, w -> regexp_matches(w, '[a-z]')))"
    alpha = (
        f"CASE WHEN {n} = 0 THEN 0.0 "
        f"ELSE FLOOR({nalpha} / CAST({n} AS DOUBLE)"
        f" * 1e6 + 0.5) / 1e6 END"
    )
    hits = f"len(list_intersect(list_distinct({ws}), [{stop}]))"
    gpass = (
        f"{n} >= 50 AND {n} <= 100000 AND ({mean}) >= 3.0 "
        f"AND ({mean}) <= 10.0 AND ({sym}) <= 0.1 "
        f"AND ({alpha}) > 0.8 AND ({hits}) >= 2"
    )
    return f"""
    SELECT doc_id,
           CAST({n} AS INT) AS n_words,
           {mean} AS mean_word_len,
           {sym} AS symbol_ratio,
           {alpha} AS alpha_word_ratio,
           CAST({hits} AS INT) AS stopword_hits,
           {gpass} AS gopher_pass
    FROM documents
    """


@_register(
    "text_gopher_rules",
    _gopher_oracle(),
    doc="Gopher-style quality rule battery (functions/text.py:"
    "gopher_rules — Rae et al. 2021 A1.1 thresholds): word-count "
    "range, mean word length, symbol-to-word ratio, alpha-word "
    "ratio, distinct-stopword hits, and the combined pass flag. All "
    "row-local exact-int arithmetic + one rounded double division per "
    "ratio; zero shuffle.",
)
def q_text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.functions.text import gopher_rules

    docs = _t(spark, sf_dir, "documents")["documents"]
    return docs.select("doc_id", *gopher_rules("text"))



@_register(
    "pipeline_incremental_ingest",
    f"""
    WITH batch AS (
      SELECT * FROM documents WHERE doc_id % 10 = 0
    ), gated AS (
      SELECT doc_id, text, source
      FROM batch
      WHERE len(regexp_extract_all(lower(text), '[a-z0-9]+')) >= 10
    ), canonical AS (
      SELECT MIN(doc_id) AS doc_id FROM gated GROUP BY md5(text)
    ), batch_dedup AS (
      SELECT g.doc_id, g.source FROM gated g
      JOIN canonical c ON g.doc_id = c.doc_id
    ),
    {_minhash_bands_cte_indented()}
    , hits AS (
      SELECT DISTINCT n.doc_id
      FROM bands n JOIN bands i
        ON n.band_idx = i.band_idx AND n.band_key = i.band_key
      WHERE n.doc_id % 10 = 0 AND i.doc_id % 10 <> 0
    ), accepted AS (
      SELECT b.doc_id, b.source FROM batch_dedup b
      WHERE NOT EXISTS (SELECT 1 FROM hits h WHERE h.doc_id = b.doc_id)
    ), corpus AS (
      SELECT doc_id, source, FALSE AS is_new
      FROM documents WHERE doc_id % 10 <> 0
      UNION ALL
      SELECT doc_id, source, TRUE AS is_new FROM accepted
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT)
             AS n_ingested,
           CAST(MIN(CASE WHEN is_new THEN doc_id END) AS BIGINT)
             AS first_new_id
    FROM corpus GROUP BY source
    """,
    doc="End-to-end incremental ingest, the composition the new "
    "operator families exist for: quality-gate the new batch -> "
    "within-batch exact dedup (keep-min) -> drop near-dups of the "
    "EXISTING corpus via the incremental LSH band join (no corpus "
    "self-join) -> union into the corpus -> per-source admission "
    "stats. Every stage is the 100 TB shape; the corpus is only ever "
    "touched by its (persistable) band index and the final union.",
)
def q_pipeline_incremental_ingest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from spark_extensions_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_candidates_incremental,
    )

    docs = _t(spark, sf_dir, "documents")["documents"]
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)

    gated = batch.filter(
        F.expr("size(regexp_extract_all(lower(text), '[a-z0-9]+', 0))")
        >= 10
    )
    keep = exact_dedup(gated, "text", "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    batch_dedup = gated.join(keep, "doc_id")

    hits = minhash_lsh_candidates_incremental(
        batch, corpus, "doc_id", "text"
    ).select(F.col("new_id").alias("doc_id")).distinct()
    accepted = batch_dedup.join(hits, "doc_id", "left_anti")

    combined = corpus.select(
        "doc_id", "source", F.lit(False).alias("is_new")
    ).unionByName(
        accepted.select("doc_id", "source", F.lit(True).alias("is_new"))
    )
    return combined.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("is_new"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_ingested"),
        F.min(F.when(F.col("is_new"), F.col("doc_id")))
        .cast("bigint")
        .alias("first_new_id"),
    )


from spark_extensions_spark import queries16  # noqa: E402,F401  (registration side effect)
