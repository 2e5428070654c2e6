"""Unit tests for the batch-21 operators: PageRank, RRF fusion,
duplicate spans, DSIR weights, embedding quantization."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_extensions_spark.operators.dedup import duplicate_spans
from spark_extensions_spark.operators.graph import PAGERANK_SCALE, pagerank
from spark_extensions_spark.operators.retrieval import rrf_fuse
from spark_extensions_spark.operators.sampling import dsir_weights
from spark_extensions_spark.operators.similarity import quantize_embeddings


def test_pagerank_two_node_cycle(spark):
    edges = spark.createDataFrame(
        [Row(src="a", dst="b"), Row(src="b", dst="a")]
    )
    out = {r["node"]: r["rank_scaled"] for r in pagerank(edges).collect()}
    # symmetric cycle: both nodes keep rank 1/2 (up to integer truncation)
    assert out["a"] == out["b"]
    assert abs(out["a"] - PAGERANK_SCALE // 2) <= 100


def test_pagerank_sink_gains_mass(spark):
    # star into 'hub': hub must outrank the leaves, and the result must
    # be identical under different input partitioning (pure int math).
    rows = [Row(src=f"leaf{i}", dst="hub") for i in range(5)] + [
        Row(src="hub", dst=f"leaf{i}") for i in range(5)
    ]
    e1 = spark.createDataFrame(rows).repartition(1)
    e8 = spark.createDataFrame(rows).repartition(8)
    r1 = {r["node"]: r["rank_scaled"] for r in pagerank(e1).collect()}
    r8 = {r["node"]: r["rank_scaled"] for r in pagerank(e8).collect()}
    assert r1 == r8
    assert r1["hub"] > r1["leaf0"]
    assert all(r1[f"leaf{i}"] == r1["leaf0"] for i in range(5))


def test_rrf_fuse_hand_case(spark):
    a = spark.createDataFrame([Row(doc_id=1, rank=1), Row(doc_id=2, rank=2)])
    b = spark.createDataFrame([Row(doc_id=2, rank=1), Row(doc_id=3, rank=2)])
    out = rrf_fuse(a, b, "doc_id", "rank", k0=60, k=10).collect()
    assert [r["doc_id"] for r in out] == [2, 1, 3]
    assert abs(out[0]["rrf_score"] - (1 / 62 + 1 / 61)) < 1e-15
    assert out[1]["rank_b"] is None and out[2]["rank_a"] is None


def test_duplicate_spans_finds_shared_passage(spark):
    shared = "x" * 10 + "the quick brown fox jumps over the lazy dog" + "y" * 10
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="AAA " * 20 + shared),
            Row(doc_id=2, text=shared + " BBB" * 20),
            Row(doc_id=3, text="unrelated content " * 10),
        ]
    )
    out = duplicate_spans(df, window=40, stride=10, min_docs=2).collect()
    assert len(out) >= 1
    assert all(r["n_docs"] == 2 for r in out)
    # earliest occurrence is doc 1 (it sorts before doc 2)
    assert all(r["first_doc"] == 1 for r in out)
    # a doc shorter than the window contributes nothing
    short = spark.createDataFrame([Row(doc_id=9, text="tiny")])
    assert duplicate_spans(short, window=40, stride=10, min_docs=1).count() == 0


def test_dsir_weights_favor_target_tokens(spark):
    corpus = spark.createDataFrame(
        [Row(doc_id=i, text="common filler words here") for i in range(8)]
        + [Row(doc_id=100 + i, text="medical clinical trial study") for i in range(2)]
    )
    target = corpus.filter(F.col("doc_id") >= 100)
    w = {
        r["doc_id"]: float(r["weight_e8"])
        for r in dsir_weights(corpus, target, "doc_id", "text").collect()
    }
    # target-domain docs must score higher than raw-domain docs
    assert min(w[100], w[101]) > max(w[i] for i in range(8))


def test_quantize_roundtrip_error_bound(spark):
    df = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[0.5, -1.0, 0.25, 0.125]),
            Row(vec_id=2, embedding=[2.0, 0.0, -2.0, 1.0]),
        ]
    )
    out = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    for r in out.values():
        assert r["n_dims"] == 4
        assert all(-127 <= c <= 127 for c in r["q"])
        # symmetric rounding: reconstruction error within half a step
        assert r["max_abs_err"] <= r["scale"] / 2 + 1e-12
    # max|x| maps to ±127 exactly
    assert out[2]["q"][0] == 127 and out[2]["q"][2] == -127
