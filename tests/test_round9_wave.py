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


def test_bradley_terry_matches_python_recompute(spark, sf_dir):
    """Independent pure-Python recompute of the e9 fixed-point MM
    recursion over the same deterministic match table; also sanity:
    strengths order consistently with win RATE on this fixture."""
    import duckdb

    from spark_extensions_spark.queries51 import (
        _BT_ITERS,
        _BT_P0,
        _BT_TERM_SCALE,
        _bt_matches_sql,
        q_eval_bradley_terry,
    )

    got = {
        r["model"]: (r["strength_e9"], r["wins"], r["n_matches"])
        for r in q_eval_bradley_terry(spark, sf_dir).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    m = con.execute(_bt_matches_sql()).fetchall()
    pairs: dict[tuple[str, str], int] = {}
    wins: dict[str, int] = {}
    for winner, a, b in m:
        pairs[(a, b)] = pairs.get((a, b), 0) + 1
        pairs[(b, a)] = pairs.get((b, a), 0) + 1
        wins[winner] = wins.get(winner, 0) + 1
    models = sorted({k for k, _ in pairs})
    p = {mm: _BT_P0 // len(models) for mm in models}
    for _ in range(_BT_ITERS):
        nxt = {}
        for mi in models:
            denom = sum(
                (n * _BT_TERM_SCALE) // (p[mi] + p[mj])
                for (a, mj), n in pairs.items()
                if a == mi and p[mi] + p[mj] > 0
            )
            w = wins.get(mi, 0)
            nxt[mi] = (w * _BT_TERM_SCALE) // denom if denom > 0 else 0
        p = nxt
    want = {
        mm: (
            p[mm],
            wins.get(mm, 0),
            sum(n for (a, _), n in pairs.items() if a == mm),
        )
        for mm in models
    }
    assert got == want
    # more wins per match -> higher strength (monotone on this fixture)
    rate = {mm: wins.get(mm, 0) / want[mm][2] for mm in models}
    by_rate = sorted(models, key=lambda mm: rate[mm])
    by_strength = sorted(models, key=lambda mm: got[mm][0])
    assert by_rate == by_strength


def test_zipf_fixture_generator_shape_and_fk_integrity(spark, tmp_path):
    """Pin tools/make_sf1.py --zipf, which the round-9 skew audit rides
    on: FK integrity must survive the re-draw (every drawn key exists
    in its dimension), the head must be Zipf-shaped (monotone counts,
    hot key far above uniform), and the hot day must absorb ~25% of
    events with time-of-day preserved."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
        ),
    )
    from make_sf1 import STRIDES, apply_zipf_skew, zipf_rank  # noqa: E402

    from pyspark.sql import functions as F

    from spark_extensions_spark.session import load_tables

    src = "/root/testdata/sf0.001"
    t = load_tables(spark, src, "orders", "customer", "events")
    per_copy = {"customer": t["customer"].count(), "part": 1}
    k = 1  # single copy: stride math degenerates to identity ranges
    orders = apply_zipf_skew("orders", t["orders"], per_copy, k, 1.1)
    counts = (
        orders.groupBy("o_custkey")
        .count()
        .orderBy(F.desc("count"), "o_custkey")
        .limit(5)
        .collect()
    )
    head = [r["count"] for r in counts]
    assert head == sorted(head, reverse=True)
    n_orders = t["orders"].count()
    uniform = n_orders / per_copy["customer"]
    assert head[0] > 10 * uniform, "hot key must dwarf the uniform rate"
    # FK integrity: every drawn key exists in customer
    orphans = orders.join(
        t["customer"],
        orders.o_custkey == t["customer"].c_custkey,
        "left_anti",
    ).count()
    assert orphans == 0
    # events hot day ~25%, time-of-day preserved
    ev = apply_zipf_skew("events", t["events"], per_copy, k, 1.1)
    byday = (
        ev.groupBy(F.to_date("ts").alias("d"))
        .count()
        .orderBy(F.desc("count"))
        .limit(1)
        .collect()[0]
    )
    n_ev = t["events"].count()
    assert str(byday["d"]) == "2024-03-15"
    assert 0.15 < byday["count"] / n_ev < 0.35
    moved = ev.where(F.to_date("ts") == "2024-03-15")
    orig = t["events"].select(
        "event_id", F.date_format("ts", "HH:mm:ss").alias("tod")
    )
    mism = (
        moved.select(
            "event_id", F.date_format("ts", "HH:mm:ss").alias("tod2")
        )
        .join(orig, "event_id")
        .where(F.col("tod") != F.col("tod2"))
        .count()
    )
    assert mism == 0, "time-of-day must be preserved on the hot day"
    # alpha=1 log-form limit stays in-domain
    r = spark.range(1000).select(
        zipf_rank((F.col("id") % 100) / 100.0, 50, 1.0).alias("rk")
    )
    lo, hi = r.agg(F.min("rk"), F.max("rk")).collect()[0]
    assert 0 <= lo and hi <= 49


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
