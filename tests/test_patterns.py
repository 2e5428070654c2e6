"""match_pattern (operators/patterns.py): hand-built micro cases for
the A B{min,max} C semantics, the fixed-chain equivalence pin, and the
within-bound arithmetic."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from spark_extensions_spark.operators.patterns import match_pattern


def _mk(spark, rows):
    """rows: (user, pos-as-seconds, id, type)."""
    data = [
        (u, datetime(2024, 1, 1, 0, 0, s, tzinfo=timezone.utc), i, t)
        for u, s, i, t in rows
    ]
    return spark.createDataFrame(
        data, "user_id int, ts timestamp, event_id int, event_type string"
    )


def _match(df, min_mid=0, max_mid=None, within=None):
    out = match_pattern(
        df,
        ["user_id"],
        ["ts", "event_id"],
        F.col("event_type") == "A",
        F.col("event_type") == "B",
        F.col("event_type") == "C",
        "event_id",
        ts_col="ts",
        min_mid=min_mid,
        max_mid=max_mid,
        within_seconds=within,
    )
    return sorted(
        (r["user_id"], r["start_id"], r["end_id"], r["n_mid"])
        for r in out.collect()
    )


def test_star_middle_and_zero_middle(spark):
    df = _mk(
        spark,
        [
            (1, 0, 1, "A"), (1, 1, 2, "B"), (1, 2, 3, "B"), (1, 3, 4, "C"),
            (2, 0, 5, "A"), (2, 1, 6, "C"),
        ],
    )
    assert _match(df) == [(1, 1, 4, 2), (2, 5, 6, 0)]


def test_non_b_row_breaks_the_run(spark):
    df = _mk(
        spark,
        [
            (1, 0, 1, "A"), (1, 1, 2, "B"), (1, 2, 3, "X"), (1, 3, 4, "C"),
        ],
    )
    assert _match(df) == []


def test_latest_a_binds_and_first_c_wins(spark):
    # a1 a2 b c1 c2: c1 binds a2 (latest A); a2 consumed, c2 has no
    # eligible A left between (a2..c2 contains c1 which is non-B)
    df = _mk(
        spark,
        [
            (1, 0, 1, "A"), (1, 1, 2, "A"), (1, 2, 3, "B"),
            (1, 3, 4, "C"), (1, 4, 5, "C"),
        ],
    )
    assert _match(df) == [(1, 2, 4, 1)]


def test_quantifier_bounds(spark):
    df = _mk(
        spark,
        [
            (1, 0, 1, "A"), (1, 1, 2, "B"), (1, 2, 3, "B"), (1, 3, 4, "C"),
            (2, 0, 5, "A"), (2, 1, 6, "C"),
        ],
    )
    # B+ excludes the zero-middle match
    assert _match(df, min_mid=1) == [(1, 1, 4, 2)]
    # B{1,1} excludes the two-middle match too
    assert _match(df, min_mid=1, max_mid=1) == []
    # B{0,1}: only the zero-middle
    assert _match(df, max_mid=1) == [(2, 5, 6, 0)]


def test_within_seconds_bound(spark):
    df = _mk(
        spark,
        [
            (1, 0, 1, "A"), (1, 30, 2, "C"),
            (2, 0, 3, "A"), (2, 31, 4, "C"),
        ],
    )
    assert _match(df, within=30) == [(1, 1, 2, 0)]


def test_fixed_chain_is_the_exactly_one_middle_case(spark):
    """analytic_pattern_match (lead()-chain view→click→purchase
    triple) must equal match_pattern with min_mid=max_mid=1 on the
    real fixture — the generalization theorem for the degenerate
    case."""
    from spark_extensions_spark.queries import registry
    from spark_extensions_spark.session import load_tables

    sf_dir = "/root/testdata/sf0.01"
    fixed = {q.name: q for q in registry()}["analytic_pattern_match"]
    chain = sorted(
        (r["user_id"], r["start_id"], r["end_id"])
        for r in fixed.spark(spark, sf_dir).collect()
    )
    ev = load_tables(spark, sf_dir, "events")["events"]
    gen = match_pattern(
        ev,
        ["user_id"],
        ["ts", "event_id"],
        F.col("event_type") == "view",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
        "event_id",
        min_mid=1,
        max_mid=1,
    )
    got = sorted(
        (r["user_id"], r["start_id"], r["end_id"]) for r in gen.collect()
    )
    assert got == chain
    assert len(got) > 0


def test_single_window_shuffle(spark):
    """Scale pin: the whole pattern match plans exactly one exchange
    on the partition key — no join, no extra shuffle."""
    df = _mk(spark, [(1, 0, 1, "A"), (1, 1, 2, "C")])
    out = match_pattern(
        df,
        ["user_id"],
        ["ts", "event_id"],
        F.col("event_type") == "A",
        F.col("event_type") == "B",
        F.col("event_type") == "C",
        "event_id",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 2  # main + dedup
    assert "SinglePartition" not in plan
    assert "Join" not in plan


def test_winnowing_guarantee_and_density(spark):
    """Schleimer et al. 2003: two documents sharing a run of at least
    w+k-1 words MUST share a fingerprint (deterministic, unlike
    MinHash); unrelated documents share none; selected density is a
    small fraction of the gram count."""
    from spark_extensions_spark.operators.dedup import (
        winnow_candidates,
        winnow_fingerprints,
    )

    k, w = 5, 4
    shared = "the quick brown fox jumps over the lazy dog again"  # 10 words >= w+k-1=8
    rows = [
        (1, "alpha beta gamma " + shared + " delta epsilon"),
        (2, shared + " zeta eta theta iota kappa"),
        (3, "completely different words about cooking pasta tonight "
            "with garlic tomatoes basil and plenty of parmesan cheese"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    fps = winnow_fingerprints(df, "doc_id", "text", k=k, w=w)
    by_doc = {
        d: {r["fp"] for r in g}
        for d, g in __import__("itertools").groupby(
            sorted(fps.collect(), key=lambda r: r["doc_id"]),
            key=lambda r: r["doc_id"],
        )
    }
    assert by_doc[1] & by_doc[2], "guarantee violated: shared run, no shared fp"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])
    # density: selected distinct fps well under the gram count
    n_grams_1 = len(rows[0][1].split()) - k + 1
    assert len(by_doc[1]) < n_grams_1
    cands = winnow_candidates(fps, "doc_id", min_shared=1).collect()
    assert [(r["id_a"], r["id_b"]) for r in cands] == [(1, 2)]


def test_streaming_pattern_state_carries_across_batches(spark, tmp_path):
    """pattern_match_state must carry open-A state ACROSS micro-batches:
    the A arrives in batch 0, the closing C in batch 1 (files split by
    time, one file per trigger). Result equals the batch operator."""
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_extensions_spark.streaming import (
        read_stream_parquet,
        run_available_now,
    )
    from spark_extensions_spark.streaming.stateful import (
        pattern_match_state,
    )

    rows1 = [  # batch 0: A then B — leaves an OPEN a per user
        (1, 1, "2024-01-01T00:00:00", "A"),
        (1, 2, "2024-01-01T00:00:01", "B"),
        (2, 10, "2024-01-01T00:00:00", "A"),
    ]
    rows2 = [  # batch 1: the closers (and one breaker)
        (1, 3, "2024-01-01T00:00:02", "C"),
        (2, 11, "2024-01-01T00:00:01", "X"),
        (2, 12, "2024-01-01T00:00:02", "C"),
    ]
    src = str(tmp_path / "src")
    os.makedirs(src)

    def write(rows, name, mtime):
        tbl = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array(
                    [pd_ts(r[2]) for r in rows], pa.timestamp("us", tz="UTC")
                ),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
            }
        )
        p = os.path.join(src, name)
        pq.write_table(tbl, p)
        os.utime(p, (mtime, mtime))

    import datetime as _dt

    def pd_ts(s):
        return _dt.datetime.fromisoformat(s).replace(
            tzinfo=_dt.timezone.utc
        )

    now = _time.time()
    write(rows1, "b0.parquet", now - 60)
    write(rows2, "b1.parquet", now + 60)
    schema = spark.read.parquet(src).schema
    stream = read_stream_parquet(
        spark, src, schema, max_files_per_trigger=1
    ).select(
        "user_id",
        "event_id",
        "ts",
        (F.col("event_type") == "A").alias("is_a"),
        (F.col("event_type") == "B").alias("is_b"),
        (F.col("event_type") == "C").alias("is_c"),
    )
    out = run_available_now(
        pattern_match_state(
            stream, "user_id", "ts", "event_id", "is_a", "is_b", "is_c"
        ),
        output_mode="append",
        state_partitions=2,
    )
    got = sorted(
        (r["user_id"], r["start_id"], r["end_id"], r["n_mid"])
        for r in out.collect()
    )
    # user 1: A(1) B(2) | C(3) -> match with the A from the PREVIOUS
    # batch; user 2: the X breaker in batch 1 invalidates A(10)
    assert got == [(1, 1, 3, 1)]
    # equals the batch operator on the unioned data
    all_rows = [
        (u, pd_ts(ts), i, t) for u, i, ts, t in rows1 + rows2
    ]
    bdf = spark.createDataFrame(
        all_rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    batch = sorted(
        (r["user_id"], r["start_id"], r["end_id"], r["n_mid"])
        for r in match_pattern(
            bdf,
            ["user_id"],
            ["ts", "event_id"],
            F.col("event_type") == "A",
            F.col("event_type") == "B",
            F.col("event_type") == "C",
            "event_id",
        ).collect()
    )
    assert got == batch


def test_streaming_pattern_null_mid_matches_batch(spark, tmp_path):
    """Review regression (round 6): a NULL mid-predicate row must NOT
    break the open run — the batch non-B counter adds 1 only on a
    definite False (three-valued logic), and the state machine must
    agree. Pre-fix, bool(None) coerced to False and invalidated the A."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_extensions_spark.streaming import (
        read_stream_parquet,
        run_available_now,
    )
    from spark_extensions_spark.streaming.stateful import (
        pattern_match_state,
    )
    import datetime as _dt

    def ts(s):
        return _dt.datetime(2024, 1, 1, 0, 0, s, tzinfo=_dt.timezone.utc)

    rows = [
        (1, 1, ts(0), "A"), (1, 2, ts(1), None), (1, 3, ts(2), "C"),
        (2, 4, ts(0), "A"), (2, 5, ts(1), "B"), (2, 6, ts(2), "C"),
    ]
    bdf = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    batch = sorted(
        (r["user_id"], r["start_id"], r["end_id"], r["n_mid"])
        for r in match_pattern(
            bdf,
            ["user_id"],
            ["ts", "event_id"],
            F.col("event_type") == "A",
            F.col("event_type") == "B",
            F.col("event_type") == "C",
            "event_id",
        ).collect()
    )
    assert batch == [(1, 1, 3, 1), (2, 4, 6, 1)]  # NULL row did not break
    src = str(tmp_path / "src")
    os.makedirs(src)
    tbl = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us", tz="UTC")),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(src, "b.parquet"))
    schema = spark.read.parquet(src).schema
    stream = read_stream_parquet(spark, src, schema).select(
        "user_id",
        "event_id",
        "ts",
        (F.col("event_type") == "A").alias("is_a"),
        (F.col("event_type") == "B").alias("is_b"),
        (F.col("event_type") == "C").alias("is_c"),
    )
    out = run_available_now(
        pattern_match_state(
            stream, "user_id", "ts", "event_id", "is_a", "is_b", "is_c"
        ),
        output_mode="append",
        state_partitions=2,
    )
    got = sorted(
        (r["user_id"], r["start_id"], r["end_id"], r["n_mid"])
        for r in out.collect()
    )
    assert got == batch


def test_streaming_pattern_rejects_non_integral_ids(spark):
    import pytest as _pytest

    from spark_extensions_spark.streaming.stateful import (
        pattern_match_state,
    )

    df = spark.readStream.format("rate").load().selectExpr(
        "value AS user_id",
        "timestamp AS ts",
        "CAST(value AS STRING) AS event_id",
        "true AS is_a", "true AS is_b", "true AS is_c",
    )
    with _pytest.raises(TypeError, match="integral id_col"):
        pattern_match_state(
            df, "user_id", "ts", "event_id", "is_a", "is_b", "is_c"
        )


def test_pattern_scan_vec_equals_loop_randomized():
    """The vectorized anchor-group evaluation must be exactly the row
    loop on every sequence shape: A∧C rows, C∧break rows, NULL
    predicates, carried state (open anchor from a prior batch), every
    (min_mid, max_mid, within) combination (VERDICT r6 #7)."""
    import random

    import numpy as np

    from spark_extensions_spark.streaming.stateful import (
        _pattern_scan_loop,
        _pattern_scan_vec,
    )

    rng = random.Random(47)
    for case in range(400):
        n = rng.randint(0, 24)
        is_a = np.array([rng.random() < 0.3 for _ in range(n)], bool)
        is_c = np.array([rng.random() < 0.3 for _ in range(n)], bool)
        brk = np.array([rng.random() < 0.25 for _ in range(n)], bool)
        ids = np.arange(100, 100 + n, dtype="int64")
        ts = np.cumsum(
            np.array([rng.randint(0, 5) for _ in range(n)], "int64")
        ) * 1_000_000
        if rng.random() < 0.5:
            prior = (7, -3_000_000, rng.randint(0, 3))
        else:
            prior = (None, None, None)
        min_mid = rng.choice([0, 1, 2])
        max_mid = rng.choice([None, 1, 3])
        within = rng.choice([None, 4_000_000, 0])
        got = _pattern_scan_vec(
            ids, ts, is_a, is_c, brk, prior, min_mid, max_mid, within
        )
        want = _pattern_scan_loop(
            ids, ts, is_a, is_c, brk, prior, min_mid, max_mid, within
        )
        assert got == want, (case, prior, min_mid, max_mid, within,
                             is_a.tolist(), is_c.tolist(), brk.tolist())


def test_tri_masks_null_semantics():
    import pandas as pd

    from spark_extensions_spark.streaming.stateful import (
        _tri_false,
        _tri_true,
    )

    s = pd.Series([True, False, None, float("nan")], dtype=object)
    assert _tri_true(s).tolist() == [True, False, False, False]
    assert _tri_false(s).tolist() == [False, True, False, False]
