"""t2 query registry, batch 38: evaluation harnesses and budget
apportionment.

Registered into the shared registry (imported from queries37 at module
end). Same determinism rules as the queries.py docstring.

Three additions, each fully hash-checked against a DuckDB oracle:

- ``eval_ann_recall``: the ANN quality gate — per query, recall@k of
  the deterministic IVF path against exact brute-force ground truth,
  plus the first missed exact rank. Every index deployment runs this
  before trusting the approximate path.
- ``eval_ndcg``: nDCG@k of the BM25 ranking against a deterministic
  graded relevance label — the ranking-quality metric. log2 terms are
  e12 fixed-point quantized BEFORE summation (the proven stat_psi
  pattern), all outputs BIGINT.
- ``sample_budget_apportion``: largest-remainder (Hamilton) allocation
  of a fixed token budget across languages — exact integer
  apportionment: Σ alloc == budget by construction, no float rounding
  drift. The domain-mixing step between corpus stats and sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_extensions_spark.queries import _cosine_duck, _register, _t, EMB_DIM
from spark_extensions_spark.queries2 import _ann_ivf_oracle
from spark_extensions_spark.operators.sampling import (
    largest_remainder_alloc_sql,
)


# =====================================================================
# ANN recall harness: IVF vs exact ground truth
# =====================================================================

_EV_K = 5
_EV_LISTS, _EV_PROBE = 16, 4


def exact_topk_oracle(k: int, n_queries: int = 10) -> str:
    """Exact brute-force ground-truth top-``k`` (query set = vec_id <
    ``n_queries``) — the shared exact side of every ANN eval harness
    (recall, probe curve)."""
    return f"""
      SELECT query_id, neighbor_id, rank FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_cosine_duck('q.embedding', 'c.embedding', EMB_DIM)}
                          DESC, c.vec_id) AS rank
        FROM (SELECT * FROM embeddings WHERE vec_id < {n_queries}) q
        CROSS JOIN embeddings c
      ) WHERE rank <= {k}
    """


def exact_topk_spark(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """Spark twin of :func:`exact_topk_oracle` (same query set)."""
    from spark_extensions_spark.operators.similarity import (
        ann_bruteforce_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")["embeddings"]
    queries = emb.filter(F.col("vec_id") < 10)
    return ann_bruteforce_topk(
        emb, queries, "vec_id", "embedding", "vec_id", "embedding",
        k=k, dim=EMB_DIM,
    ).select("query_id", "neighbor_id", "rank")


def _eval_ann_recall_oracle() -> str:
    exact = exact_topk_oracle(_EV_K)
    return f"""
    WITH approx AS (
      SELECT query_id, neighbor_id
      FROM ({_ann_ivf_oracle(_EV_LISTS, _EV_PROBE, _EV_K)}) t
    ),
    exact AS ({exact})
    SELECT e.query_id,
           CAST(COUNT(a.neighbor_id) AS BIGINT) AS hits_at_k,
           CAST(COALESCE(MIN(CASE WHEN a.neighbor_id IS NULL
                                  THEN e.rank END), 0) AS INT)
             AS first_miss_rank
    FROM exact e
    LEFT JOIN approx a
      ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
    """


@_register(
    "eval_ann_recall",
    _eval_ann_recall_oracle(),
    doc="ANN quality gate (eval harness): per query, recall@5 of the "
    "deterministic IVF path (operators/similarity.py:ann_ivf_topk_det, "
    "16 lists / 4 probes) against exact brute-force ground truth "
    "(ann_bruteforce_topk), plus the first exact rank the index "
    "missed. Both rankings are bit-deterministic, so the recall "
    "numbers are exact integers — the approximate path is measured, "
    "not trusted. Plan: the exact side is one broadcast NLJ + window, "
    "the approx side the probed cell equi-join; the comparison is an "
    "id-keyed left join + one small aggregate. At 100 TB the harness "
    "runs on a query SAMPLE (queries are broadcast-small by contract) "
    "while both index paths stay corpus-partitioned.",
)
def q_eval_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.operators.similarity import (
        ann_ivf_topk_det,
    )

    emb = _t(spark, sf_dir, "embeddings")["embeddings"]
    queries = emb.filter(F.col("vec_id") < 10)
    exact = exact_topk_spark(spark, sf_dir, _EV_K)
    approx = ann_ivf_topk_det(
        emb, queries, "vec_id", "embedding", "vec_id", "embedding",
        k=_EV_K, dim=EMB_DIM, n_lists=_EV_LISTS, n_probe=_EV_PROBE,
    ).select("query_id", "neighbor_id", F.lit(1).alias("__hit"))
    j = exact.join(approx, ["query_id", "neighbor_id"], "left")
    return j.groupBy("query_id").agg(
        F.count("__hit").alias("hits_at_k"),
        F.coalesce(
            F.min(F.when(F.col("__hit").isNull(), F.col("rank"))),
            F.lit(0),
        )
        .cast("int")
        .alias("first_miss_rank"),
    )


# =====================================================================
# nDCG@k of the BM25 ranking against graded term-occurrence relevance
# =====================================================================

_NDCG_TERMS = ["data", "model", "training", "quality"]
_NDCG_K = 20

_REL_SPARK = (
    "least(aggregate(array("
    + ", ".join(
        f"size(filter(regexp_extract_all(lower(text), '[a-z0-9]+', 0),"
        f" t -> t = '{t}'))"
        for t in _NDCG_TERMS
    )
    + "), 0, (a, x) -> a + x), 3)"
)
_REL_DUCK = (
    "LEAST("
    + " + ".join(
        f"LEN(list_filter(regexp_extract_all(LOWER(text), '[a-z0-9]+'),"
        f" t -> t = '{t}'))"
        for t in _NDCG_TERMS
    )
    + ", 3)"
)


def _ndcg_oracle() -> str:
    from spark_extensions_spark.operators.retrieval import bm25_oracle_sql

    # per-position DCG term, e12 fixed-point BEFORE the sum (the
    # stat_psi libm pattern: an engine-ulp log2 difference flips a
    # floor only within 1e-16 of a boundary)
    term = (
        "CAST(FLOOR(CAST((1 << rel) - 1 AS DOUBLE)"
        " / LOG2(CAST(rank + 1 AS DOUBLE)) * 1e12 + 5e-1) AS BIGINT)"
    )
    return f"""
    WITH ranked AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM ({bm25_oracle_sql(_NDCG_TERMS, k=_NDCG_K)})
    ),
    labeled AS (
      SELECT r.rank, {_REL_DUCK} AS rel
      FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
    ),
    ideal AS (
      SELECT ROW_NUMBER() OVER (ORDER BY {_REL_DUCK} DESC, doc_id)
               AS rank,
             {_REL_DUCK} AS rel
      FROM documents
      QUALIFY rank <= {_NDCG_K}
    ),
    sums AS (
      SELECT (SELECT SUM({term}) FROM labeled) AS dcg_e12,
             (SELECT SUM({term}) FROM ideal) AS idcg_e12
    )
    SELECT CAST(dcg_e12 AS BIGINT) AS dcg_e12,
           CAST(idcg_e12 AS BIGINT) AS idcg_e12,
           CAST(FLOOR(CAST(dcg_e12 AS DOUBLE) / CAST(idcg_e12 AS DOUBLE)
                      * 1e6 + 5e-1) AS BIGINT) AS ndcg_e6
    FROM sums
    """


@_register(
    "eval_ndcg",
    _ndcg_oracle(),
    doc="Ranking-quality eval: nDCG@20 of the BM25 ranking against a "
    "deterministic graded relevance label (capped term-occurrence "
    "count). Each DCG term (2^rel-1)/log2(rank+1) is e12 fixed-point "
    "quantized BEFORE summation and the final nDCG is one double "
    "division of exactly-representable BIGINTs — the stat_psi libm "
    "recipe, so the metric is hash-exact across engines. IDCG comes "
    "from the corpus-wide ideal top-20 (deterministic tiebreak). "
    "Plan: BM25 is two hash aggregates + a broadcast term join; the "
    "ideal ranking is a TakeOrderedAndProject, never a global sort.",
)
def q_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.operators.retrieval import bm25_search

    docs = _t(spark, sf_dir, "documents")["documents"]
    top = bm25_search(docs, _NDCG_TERMS, k=_NDCG_K)
    # bounded input: `top` is the post-top-k result (≤ _NDCG_K = 20
    # rows) — the single-partition rank window is k-sized
    w = Window.orderBy(F.desc("score"), F.col("doc_id"))
    ranked = top.select(
        "doc_id", F.row_number().over(w).alias("rank")
    )
    labeled = ranked.join(
        docs.select("doc_id", F.expr(_REL_SPARK).alias("rel")), "doc_id"
    )
    ideal = (
        docs.select("doc_id", F.expr(_REL_SPARK).alias("rel"))
        .orderBy(F.desc("rel"), F.col("doc_id"))
        .limit(_NDCG_K)
        .select(
            "rel",
            # bounded input: post-limit(_NDCG_K) — the rank window
            # runs over ≤ 20 rows
            F.row_number()
            .over(Window.orderBy(F.desc("rel"), F.col("doc_id")))
            .alias("rank"),
        )
    )
    term = (
        "cast(floor(cast(shiftleft(1, rel) - 1 as double)"
        " / log2(cast(rank + 1 as double)) * 1e12 + 0.5d) as bigint)"
    )
    dcg = labeled.agg(F.sum(F.expr(term)).alias("dcg_e12"))
    idcg = ideal.agg(F.sum(F.expr(term)).alias("idcg_e12"))
    return (
        dcg.crossJoin(idcg)
        .select(
            F.col("dcg_e12").cast("bigint").alias("dcg_e12"),
            F.col("idcg_e12").cast("bigint").alias("idcg_e12"),
            F.expr(
                "cast(floor(cast(dcg_e12 as double)"
                " / cast(idcg_e12 as double) * 1e6 + 0.5d) as bigint)"
            ).alias("ndcg_e6"),
        )
    )


# =====================================================================
# Largest-remainder token-budget apportionment across languages
# =====================================================================

_AP_BUDGET = 100_000


@_register(
    "sample_budget_apportion",
    largest_remainder_alloc_sql(
        "SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS mass"
        " FROM documents GROUP BY lang",
        "lang",
        "mass",
        _AP_BUDGET,
    ),
    doc="Domain mixing: largest-remainder (Hamilton) apportionment of "
    "a fixed 100k-unit token budget across languages by corpus mass — "
    "exact integer math (cross-multiplied quotas, remainder-ranked "
    "top-ups), so Σ alloc == budget ALWAYS and the mix is bit-"
    "reproducible; float proportional shares drift and misallocate "
    "under rounding. ONE hash aggregate over the corpus; everything "
    "after runs on the domain-sized table (broadcast trivially). The "
    "step between corpus stats and pps/stratified sampling in a "
    "re-mixing pipeline.",
)
def q_sample_budget_apportion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from spark_extensions_spark.operators.sampling import (
        largest_remainder_alloc,
    )

    docs = _t(spark, sf_dir, "documents")["documents"]
    counts = docs.groupBy("lang").agg(
        F.sum("n_chars").cast("bigint").alias("mass")
    )
    return largest_remainder_alloc(counts, "lang", "mass", _AP_BUDGET)

from spark_extensions_spark import queries39  # noqa: E402,F401  (registration side effect)
