"""Round-9 wave: verdict-r8 fixes.

- link_predict_anchored anchor-set broadcast guard (VERDICT r8 #4 /
  "what's wrong" #3): the served anchor set is counted once and the
  function refuses beyond ``_ANCHORS_BROADCAST_MAX``, naming the
  shuffle/IVF alternatives — mirroring hard_negatives.
- pagerank empty-graph branch emits the SAME column order as the main
  path (ADVICE r8), so positional consumers / unionAll bind identically.
"""

import pytest


def test_link_predict_anchored_refuses_oversized_anchor_set(
    spark, monkeypatch
):
    import spark_extensions_spark.operators.graph as g

    monkeypatch.setattr(g, "_ANCHORS_BROADCAST_MAX", 1)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 4), (3, 4)], "src int, dst int"
    )
    anchors = spark.createDataFrame([(1,), (2,)], "node int")
    with pytest.raises(ValueError, match="exceeds the broadcast bound"):
        g.link_predict_anchored(
            edges, anchors, "node", min_common=2, top_k=5
        )
    # the refusal message must name the alternatives a user would
    # reach for (pytest.raises so a no-raise regression FAILS here
    # rather than silently skipping the message assertions)
    with pytest.raises(ValueError) as ei:
        g.link_predict_anchored(edges, anchors, "node")
    assert "link_predict" in str(ei.value)
    assert "IVF" in str(ei.value)


def test_link_predict_anchored_unchanged_below_anchor_bound(spark):
    from spark_extensions_spark.operators.graph import (
        link_predict_anchored,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 4), (3, 4)], "src int, dst int"
    )
    anchors = spark.createDataFrame([(1,), (2,)], "node int")
    out = {
        (r["anchor"], r["candidate"]): r["common_neighbors"]
        for r in link_predict_anchored(
            edges, anchors, "node", min_common=2, top_k=5
        ).collect()
    }
    assert out == {(1, 3): 2, (2, 4): 2}


def test_bpe_merges_oracle_matches_trainer_on_hand_corpus(spark):
    """The unrolled-CTE DuckDB oracle and the real trainer agree
    round-by-round on the classic Sennrich corpus (low/lower/newest/
    widest) — merge pairs, tie-breaks, AND selection-time counts."""
    import duckdb

    from spark_extensions_spark.functions.tokenizer import (
        bpe_train_stats,
        word_frequencies,
    )
    from spark_extensions_spark.queries51 import _bpm_oracle

    corpus = (
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    docs = spark.createDataFrame(
        [(0, " ".join(corpus))], "doc_id int, text string"
    )
    wf = word_frequencies(docs, "text").filter("freq >= 2").collect()
    stats = bpe_train_stats(
        [(r["word"], r["freq"]) for r in wf], 3
    )
    con = duckdb.connect()
    text = " ".join(corpus)
    con.execute(
        f"CREATE VIEW documents AS SELECT 0 AS doc_id, '{text}' AS text"
    )
    oracle = con.execute(_bpm_oracle(3)).fetchall()
    assert [(le, ri, c) for le, ri, c in stats] == [
        (row[1], row[2], row[3]) for row in sorted(oracle)
    ]
    # pin the textbook result so both engines are checked against a
    # third, hand-derivable source (9 = 6 newest + 3 widest)
    assert stats[0] == ("e", "s", 9)
    assert stats[1] == ("es", "t", 9)
    assert stats[2] == ("est", "</w>", 9)


def test_aqe_skew_join_split_fires_on_hot_key(spark):
    """Plan-pin for the skew defense the Zipf audit relies on
    (tools/skew_evidence.py): a hot-key sort-merge join under
    fixture-scaled thresholds must show SortMergeJoin(skew=true) with
    a skewed AQEShuffleRead in the FINAL adaptive plan. Executes the
    DataFrame's own QueryExecution (count() would build a separate
    aggregate plan and leave this one unfinal)."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(120_000).select(
            F.when(F.col("id") < 100_000, F.lit(7))
            .otherwise(F.col("id") % 50)
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(50).select(
            F.col("id").alias("k"), F.col("id").alias("w")
        )
        j = left.join(right, "k").select("v", "w")
        n = j.rdd.count()
        assert n == 120_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:1500]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_pagerank_empty_graph_column_order_matches_main_path(spark):
    from spark_extensions_spark.operators.graph import pagerank

    empty = spark.createDataFrame([], "src int, dst int")
    nonempty = spark.createDataFrame([(1, 2)], "src int, dst int")
    cols_empty = pagerank(empty, iterations=1).columns
    cols_main = pagerank(nonempty, iterations=1).columns
    assert cols_empty == cols_main == ["node", "rank_scaled", "rank"]
    # the branches must union positionally without mis-binding
    u = pagerank(empty, iterations=1).union(pagerank(nonempty, iterations=1))
    rows = u.collect()
    assert {r["node"] for r in rows} == {1, 2}
    assert all(r["rank_scaled"] >= 0 for r in rows)
