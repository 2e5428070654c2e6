"""t2 query registry, batch 45: round-7 wave 1 — Markov transitions,
exact-integer Gini stump, dataset card, dictionary keyword tagging.

Registered into the shared registry (imported from queries44 at module
end). Same determinism rules as the queries.py docstring.

- ``analytic_markov_chain``: event-type transition matrix from per-user
  event sequences — the session-flow model behind next-action
  prediction and funnel diagnostics.
- ``stat_gini_split``: decision-stump feature ranking by exact-integer
  Gini impurity decrease (operators/classify.py:gini_split).
- ``pipeline_dataset_card``: the per-language release statistics
  manifest (docs, dup rate, tokens, corpus share) every dataset ships
  with — one scan, all exact ints + fixed-point ratios.
- ``text_keyword_tag``: broadcast-dictionary phrase tagging (unigram +
  bigram), the Aho-Corasick-shaped keyword router of curation
  pipelines re-expressed as explode + broadcast join + one agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_extensions_spark.operators.classify import (
    gini_split,
    gini_split_oracle_sql,
)
from spark_extensions_spark.queries import _register, _t

# ------------------------------------------------------------------
# analytic_markov_chain
# ------------------------------------------------------------------


@_register(
    "analytic_markov_chain",
    """
    WITH seq AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      FROM events
    ),
    trans AS (
      SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_trans
      FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_type, to_type, n_trans,
           CAST(FLOOR(n_trans / CAST(SUM(n_trans) OVER (
                  PARTITION BY from_type) AS DOUBLE) * 1e6 + 0.5)
                AS BIGINT) AS prob_e6
    FROM trans
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences: one window shuffle on user_id (lead by event time), "
    "one map-side-combinable hash aggregate on the (from, to) pair, "
    "then row probabilities normalized over the DOMAIN-sized "
    "transition table (the per-from window runs over ≤|event_type|² "
    "rows at any corpus size). Counts are exact BIGINTs; the "
    "probability is one double division e6-quantized — the house "
    "fixed-point recipe.",
)
def q_analytic_markov_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")["events"]
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(wseq).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    trans = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_trans")
    )
    return trans.select(
        "from_type",
        "to_type",
        "n_trans",
        F.expr(
            "cast(floor(n_trans / cast(sum(n_trans) over "
            "(partition by from_type) as double) * 1e6 + 0.5d) as bigint)"
        ).alias("prob_e6"),
    )


# ------------------------------------------------------------------
# stat_gini_split
# ------------------------------------------------------------------

_GS_FEATURES = ["f_linestatus", "f_qty_bucket", "f_ship_month"]
_GS_SRC = (
    "SELECT l_linestatus AS f_linestatus,"
    " CAST(CAST(l_quantity AS BIGINT) // 10 AS VARCHAR) AS f_qty_bucket,"
    " CAST(EXTRACT(month FROM l_shipdate) AS VARCHAR) AS f_ship_month,"
    " l_returnflag FROM lineitem"
)


@_register(
    "stat_gini_split",
    gini_split_oracle_sql(_GS_SRC, _GS_FEATURES, "l_returnflag = 'R'"),
    doc="Decision-stump feature ranking by exact-integer Gini impurity "
    "decrease (operators/classify.py:gini_split; CART, Breiman 1984): "
    "which of {line status, quantity decile, ship month} best "
    "predicts a return. ONE row-local stack explode + one hash "
    "aggregate on (feature, value); every impurity term runs through "
    "DECIMAL(38,0) products and an exact integer division to e12 "
    "fixed point, so the ranking is bit-reproducible — float Gini "
    "tie-breaks nondeterministically exactly when features are close.",
)
def q_stat_gini_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    feats = li.select(
        F.col("l_linestatus").alias("f_linestatus"),
        F.expr("cast(cast(l_quantity as bigint) div 10 as string)").alias(
            "f_qty_bucket"
        ),
        F.expr("cast(month(l_shipdate) as string)").alias("f_ship_month"),
        "l_returnflag",
    )
    return gini_split(feats, _GS_FEATURES, F.col("l_returnflag") == "R")


# ------------------------------------------------------------------
# pipeline_dataset_card
# ------------------------------------------------------------------


@_register(
    "pipeline_dataset_card",
    """
    WITH card AS (
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT)
               AS n_dup_docs,
             CAST(SUM(LEN(string_split(text, ' '))) AS BIGINT)
               AS n_tokens,
             CAST(SUM(n_chars) AS BIGINT) AS n_chars
      FROM documents GROUP BY lang
    )
    SELECT lang, n_docs, n_dup_docs, n_tokens, n_chars,
           CAST(FLOOR(n_tokens / CAST(SUM(n_tokens) OVER () AS DOUBLE)
                * 1e6 + 0.5) AS BIGINT) AS tok_share_e6,
           CAST(FLOOR(n_tokens / CAST(n_docs AS DOUBLE) * 1e2 + 0.5)
                AS BIGINT) AS mean_tok_e2
    FROM card
    """,
    doc="The dataset-card statistics manifest a released corpus ships "
    "with (per-language doc/dup/token/char counts, corpus share, mean "
    "length): ONE hash aggregate over the corpus — the exact-dup count "
    "is COUNT(*) − COUNT(DISTINCT md5(text)) inside the same agg — "
    "then fixed-point shares over the DOMAIN-sized language table "
    "(the share window runs over |langs| rows at any corpus size).",
)
def q_pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    card = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (
            F.count(F.lit(1))
            - F.countDistinct(F.md5(F.col("text").cast("binary")))
        )
        .cast("bigint")
        .alias("n_dup_docs"),
        F.sum(F.size(F.split(F.col("text"), " ")))
        .cast("bigint")
        .alias("n_tokens"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
    )
    # bounded input: post-aggregate language table (|langs| rows)
    return card.select(
        "lang",
        "n_docs",
        "n_dup_docs",
        "n_tokens",
        "n_chars",
        F.expr(
            "cast(floor(n_tokens / cast(sum(n_tokens) over "
            "(rows between unbounded preceding and unbounded following)"
            " as double) * 1e6 + 0.5d) as bigint)"
        ).alias("tok_share_e6"),
        F.expr(
            "cast(floor(n_tokens / cast(n_docs as double) * 1e2 + 0.5d)"
            " as bigint)"
        ).alias("mean_tok_e2"),
    )


# ------------------------------------------------------------------
# text_keyword_tag
# ------------------------------------------------------------------

# (term, tag) dictionary: unigrams and bigrams over the corpus
# vocabulary. Real pipelines load thousands of these (PII terms, topic
# routers, blocklists); the plan shape is identical at that size
# because the dictionary side is broadcast.
_KT_DICT = [
    ("vector", "topic_vector"),
    ("stream", "topic_streaming"),
    ("dup", "flag_dup"),
    ("table scan", "op_scan"),
    ("hash join", "op_hashjoin"),
    ("sort merge", "op_sortmerge"),
    ("window window", "style_repeat"),
]


def _kt_oracle() -> str:
    vals = ", ".join(f"('{t}', '{g}')" for t, g in _KT_DICT)
    return f"""
    WITH kt_dict(term, tag) AS (VALUES {vals}),
    kt_words AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
      FROM documents
    ),
    kt_terms AS (
      SELECT doc_id, unnest(list_distinct(ws)) AS term FROM kt_words
      UNION ALL
      SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(ws) < 2 THEN []
                    ELSE list_transform(generate_series(0, len(ws) - 2),
                           i -> array_to_string(ws[i+1:i+2], ' '))
               END)) AS term
      FROM kt_words
    ),
    kt_hits AS (
      SELECT DISTINCT t.doc_id, d.tag
      FROM kt_terms t JOIN kt_dict d USING (term)
    )
    SELECT doc_id,
           array_to_string(list_sort(list(tag)), ',') AS tags_csv,
           CAST(COUNT(*) AS BIGINT) AS n_tags
    FROM kt_hits GROUP BY doc_id
    """


@_register(
    "text_keyword_tag",
    _kt_oracle(),
    doc="Dictionary phrase tagging — the keyword-router/blocklist stage "
    "of curation pipelines (Aho-Corasick semantics over a term list, "
    "re-expressed Spark-first): docs explode to their DISTINCT "
    "unigrams + bigrams (row-local), a BROADCAST hash join against "
    "the term->tag dictionary finds hits (the corpus is never "
    "shuffled on terms), and one doc-keyed aggregate assembles the "
    "sorted tag list. The dictionary side stays broadcastable into "
    "the tens of MBs — thousands of terms; collect_set+sort_array "
    "gives a canonical CSV independent of partitioning.",
)
def q_text_keyword_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    d = spark.createDataFrame(_KT_DICT, "term string, tag string")
    words = docs.select(
        "doc_id",
        F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").alias(
            "__ws"
        ),
    )
    from spark_extensions_spark.operators.dedup import shingles_from_words

    terms = words.select(
        "doc_id",
        F.explode(
            F.array_union(
                F.array_distinct(F.col("__ws")),
                F.array_distinct(shingles_from_words("__ws", 2)),
            )
        ).alias("term"),
    )
    hits = terms.join(F.broadcast(d), "term").select("doc_id", "tag").distinct()
    return hits.groupBy("doc_id").agg(
        F.array_join(F.sort_array(F.collect_set("tag")), ",").alias(
            "tags_csv"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_tags"),
    )


# batch 46 registers at import time, same chain as queries44 -> 45
from spark_extensions_spark import queries46  # noqa: E402,F401  (registration side effect)
