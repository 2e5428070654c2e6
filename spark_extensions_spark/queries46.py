"""t2 query registry, batch 46: round-7 wave 2 — link prediction and
asymmetric containment dedup.

Registered into the shared registry (imported from queries45 at module
end). Same determinism rules as the queries.py docstring.

- ``graph_link_predict``: common-neighbor / neighborhood-Jaccard link
  prediction on the part co-purchase graph
  (operators/graph.py:link_predict).
- ``dedup_containment``: quote/subset detection by n-gram containment
  with the rare-shingle candidate rule
  (operators/dedup.py:ngram_containment_pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spark_extensions_spark.operators.dedup import (
    ngram_containment_oracle_sql,
    ngram_containment_pairs,
)
from spark_extensions_spark.operators.graph import (
    link_predict_anchored,
    link_predict_anchored_oracle_sql,
)
from spark_extensions_spark.queries import _register, _t

_LP_MIN_COMMON = 3
_LP_TOP_K = 5
_LP_ANCHOR_PRED = "node % 97 = 0"  # ~1% of parts — the served query set


@_register(
    "graph_link_predict",
    link_predict_anchored_oracle_sql(
        "lineitem",
        "l_orderkey",
        "l_partkey",
        _LP_ANCHOR_PRED,
        min_common=_LP_MIN_COMMON,
        top_k=_LP_TOP_K,
    ),
    doc="Per-anchor common-neighbor link prediction (Liben-Nowell & "
    "Kleinberg 2003) on the part bought-together graph: top-5 "
    "recommendations for a ~1% anchor set, scored by neighborhood "
    "Jaccard e6 (operators/graph.py:link_predict_anchored). The "
    "SERVED shape, and the scale-honest one: global all-pairs CN "
    "costs Σ deg² in candidate GENERATION (measured 298M pair rows "
    "on the sf0.1 graph — 57s, no output cap helps); the anchored "
    "walk costs Σ_{{a}} Σ_{{u∈N(a)}} deg(u) — linear in the anchor "
    "set. One broadcast semi join, one equi join on the witness key, "
    "one hash agg, anti join vs existing edges, broadcast degree "
    "joins, per-anchor bounded rank window.",
)
def q_graph_link_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from spark_extensions_spark.operators.graph import canonical_edges
    from spark_extensions_spark.queries21 import _part_edges

    # one materialization of the co-purchase expansion + canonicalize:
    # the anchor-node scan and the operator's adjacency build both
    # consume it (lazily it re-ran as two identical 2.2 s jobs)
    edges = canonical_edges(
        _part_edges(spark, sf_dir), "src", "dst"
    ).localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    anchors = nodes.where(F.expr(_LP_ANCHOR_PRED))
    return link_predict_anchored(
        edges,
        anchors,
        "node",
        min_common=_LP_MIN_COMMON,
        top_k=_LP_TOP_K,
    )


@_register(
    "dedup_containment",
    ngram_containment_oracle_sql(
        "SELECT doc_id, text FROM documents", "doc_id", "text"
    ),
    doc="Asymmetric containment near-dup detection (Broder 1997): "
    "|A∩B| / min(|A|,|B|) over distinct 3-gram shingle sets — the "
    "quote/boilerplate case Jaccard dilutes away "
    "(operators/dedup.py:ngram_containment_pairs). Candidate-verify "
    "shape: row-local shingle-set arrays, candidates only from "
    "shingles with df <= 20 (frequent boilerplate shingles never "
    "expand pairs — that is the quadratic blow-up at corpus scale), "
    "exact row-local array_intersect verify on the bounded candidate "
    "set.",
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    return ngram_containment_pairs(
        docs.select("doc_id", "text"), "doc_id", "text"
    )


# batch 47 registers at import time, same chain as queries45 -> 46
from spark_extensions_spark import queries47  # noqa: E402,F401  (registration side effect)
