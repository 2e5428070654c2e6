"""Unit tests for operators/incremental.py (CDC diff, upsert, SCD2)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_extensions_spark.operators.incremental import (
    merge_upsert,
    scd2_apply,
    scd2_init,
    snapshot_diff,
)


def _snaps(spark):
    old = spark.createDataFrame(
        [
            Row(k=1, v="a", w=10),   # unchanged
            Row(k=2, v="b", w=20),   # updated (v)
            Row(k=3, v="c", w=30),   # deleted
            Row(k=4, v=None, w=40),  # null-safe unchanged
        ]
    )
    new = spark.createDataFrame(
        [
            Row(k=1, v="a", w=10),
            Row(k=2, v="B", w=20),
            Row(k=4, v=None, w=40),
            Row(k=5, v="e", w=50),   # inserted
        ]
    )
    return old, new


def test_snapshot_diff_iud(spark):
    old, new = _snaps(spark)
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {2: "U", 3: "D", 5: "I"}


def test_snapshot_diff_column_payload(spark):
    old, new = _snaps(spark)
    rows = {
        r["k"]: r
        for r in snapshot_diff(old, new, ["k"], ["v"]).collect()
    }
    assert rows[2]["old_v"] == "b" and rows[2]["new_v"] == "B"
    assert rows[3]["new_v"] is None and rows[5]["old_v"] is None


def test_snapshot_diff_null_key_present_both_sides(spark):
    """A NULL business key present on both sides must classify like any
    other key (the eqNullSafe join supports NULL keys): changed → 'U',
    unchanged → dropped — not misread as absent ('D'/'I')."""
    old = spark.createDataFrame(
        [Row(k=None, v="x"), Row(k=1, v="a")], "k int, v string"
    )
    new_changed = spark.createDataFrame(
        [Row(k=None, v="y"), Row(k=1, v="a")], "k int, v string"
    )
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old, new_changed, ["k"]).collect()
    }
    assert got == {None: "U"}

    new_same = spark.createDataFrame(
        [Row(k=None, v="x"), Row(k=1, v="a")], "k int, v string"
    )
    assert snapshot_diff(old, new_same, ["k"]).count() == 0


def test_scd2_null_key_update_closes_and_reopens(spark):
    """scd2_apply on a NULL-keyed open row with changed tracked values
    must emit close-out + new open (not a garbage all-null open row)."""
    hist = scd2_init(
        spark.createDataFrame([Row(k=None, v="x")], "k int, v string"),
        ["k"],
        ["v"],
        load_version=1,
    )
    snap = spark.createDataFrame([Row(k=None, v="y")], "k int, v string")
    out = scd2_apply(hist, snap, ["k"], ["v"], load_version=2).collect()
    by_state = {(r["is_current"], r["v"]): r for r in out}
    assert len(out) == 2
    closed = by_state[(False, "x")]
    assert closed["valid_from"] == 1 and closed["valid_to"] == 2
    opened = by_state[(True, "y")]
    assert opened["valid_from"] == 2 and opened["valid_to"] is None


def test_merge_upsert_source_wins(spark):
    old, new = _snaps(spark)
    merged = {r["k"]: r for r in merge_upsert(old, new, ["k"]).collect()}
    assert set(merged) == {1, 2, 3, 4, 5}
    assert merged[2]["v"] == "B"      # updated from source
    assert merged[3]["v"] == "c"      # untouched target-only row


def test_scd2_lifecycle_and_idempotence(spark):
    old, new = _snaps(spark)
    hist1 = scd2_init(old, ["k"], ["v", "w"], load_version=1)
    hist2 = scd2_apply(hist1, new, ["k"], ["v", "w"], load_version=2)
    rows = sorted(
        hist2.collect(), key=lambda r: (r["k"], r["valid_from"])
    )
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r["k"], []).append(r)
    # unchanged (incl. null-safe): one open row from load 1
    for k in (1, 4):
        (r,) = by_key[k]
        assert r["is_current"] and r["valid_to"] is None
        assert r["valid_from"] == 1
    # updated: closed v1 + open v2
    r_old, r_new = by_key[2]
    assert (r_old["v"], r_old["valid_to"], r_old["is_current"]) == (
        "b", 2, False,
    )
    assert (r_new["v"], r_new["valid_from"], r_new["is_current"]) == (
        "B", 2, True,
    )
    assert r_new["valid_to"] is None
    # deleted: closed only
    (r3,) = by_key[3]
    assert not r3["is_current"] and r3["valid_to"] == 2
    # inserted: open at v2
    (r5,) = by_key[5]
    assert r5["is_current"] and r5["valid_from"] == 2

    # idempotence: re-applying the same snapshot changes nothing
    hist3 = scd2_apply(hist2, new, ["k"], ["v", "w"], load_version=3)
    a = sorted(map(tuple, hist2.collect()))
    b = sorted(map(tuple, hist3.collect()))
    assert a == b


def test_scd2_as_of_round_trip(spark):
    from spark_extensions_spark.operators.incremental import scd2_as_of

    old, new = _snaps(spark)
    hist1 = scd2_init(old, ["k"], ["v", "w"], load_version=1)
    hist2 = scd2_apply(hist1, new, ["k"], ["v", "w"], load_version=2)
    # as-of load 1 == the original snapshot; as-of load 2 == the new one
    as1 = sorted(map(tuple, scd2_as_of(hist2, 1).collect()))
    as2 = sorted(map(tuple, scd2_as_of(hist2, 2).collect()))
    assert as1 == sorted(map(tuple, old.collect()))
    assert as2 == sorted(map(tuple, new.collect()))


def test_scd2_closed_rows_pass_through(spark):
    old, new = _snaps(spark)
    hist1 = scd2_init(old, ["k"], ["v", "w"], load_version=1)
    hist2 = scd2_apply(hist1, new, ["k"], ["v", "w"], load_version=2)
    closed_before = {
        tuple(r)
        for r in hist2.filter(~F.col("is_current")).collect()
    }
    hist3 = scd2_apply(hist2, new, ["k"], ["v", "w"], load_version=3)
    closed_after = {
        tuple(r)
        for r in hist3.filter(~F.col("is_current")).collect()
    }
    assert closed_before <= closed_after


def test_scd2_apply_changes_lifecycle(spark):
    from spark_extensions_spark.operators.incremental import (
        scd2_apply_changes,
        scd2_init,
    )

    base = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k bigint, v double"
    )
    hist = scd2_init(base, ["k"], ["v"], 1)
    changes = spark.createDataFrame(
        [
            (2, 25.0, "U"),   # changed -> close + reopen
            (3, 30.0, "U"),   # same value -> no-op
            (4, 40.0, "I"),   # brand new
            (1, None, "D"),   # delete -> close
            (99, None, "D"),  # delete of unseen key -> no-op
        ],
        "k bigint, v double, op string",
    )
    out = scd2_apply_changes(hist, changes, ["k"], ["v"], 2)
    rows = {(r.k, r.valid_from, r.valid_to): r for r in out.collect()}
    assert rows[(1, 1, 2)].is_current is False        # deleted
    assert (1, 2, None) not in rows
    assert rows[(2, 1, 2)].is_current is False        # closed
    assert rows[(2, 2, None)].v == 25.0               # reopened
    assert rows[(3, 1, None)].is_current is True      # untouched no-op
    assert rows[(4, 2, None)].v == 40.0               # inserted
    assert not any(r.k == 99 for r in out.collect())
    # untouched key 3 keeps exactly one open row
    assert sum(1 for (k, _, vt) in rows if k == 3) == 1


def test_scd2_changes_compose_with_snapshot_diff(spark):
    from spark_extensions_spark.operators.incremental import (
        scd2_apply,
        scd2_apply_changes,
        scd2_init,
        snapshot_diff,
    )
    from pyspark.sql import functions as F

    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k bigint, v double"
    )
    new = spark.createDataFrame(
        [(1, 10.0), (2, 99.0), (4, 44.0)], "k bigint, v double"
    )
    hist = scd2_init(old, ["k"], ["v"], 1)
    # change-set path: diff then apply
    diff = snapshot_diff(old, new, ["k"], ["v"]).select(
        "k",
        F.col("new_v").alias("v"),
        F.col("change_type").alias("op"),
    )
    via_changes = scd2_apply_changes(hist, diff, ["k"], ["v"], 2)
    # snapshot path: apply the full snapshot directly
    via_snapshot = scd2_apply(hist, new, ["k"], ["v"], 2)
    a = sorted(map(tuple, via_changes.collect()))
    b = sorted(map(tuple, via_snapshot.collect()))
    assert a == b


def test_agg_refresh_retraction(spark):
    """Signed-delta maintenance: inserts fold in, deletes retract, a
    fully-retracted key disappears; maintained state equals recompute."""
    from spark_extensions_spark.operators.incremental import (
        agg_partials,
        agg_refresh,
    )
    from pyspark.sql import functions as F

    base_facts = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 5.0), (3, 7.0)], "k int, v double"
    )
    measures = {"s": "cast(v as decimal(18,2))"}
    base = agg_partials(base_facts, ["k"], measures)
    inserts = agg_partials(
        spark.createDataFrame([(2, 2.0), (4, 9.0)], "k int, v double"),
        ["k"],
        measures,
    )
    # retract ONE of k=1's facts and ALL of k=3
    deletes = agg_partials(
        spark.createDataFrame([(1, 20.0), (3, 7.0)], "k int, v double"),
        ["k"],
        measures,
        weight=F.lit(-1),
    )
    out = agg_refresh(base, inserts.unionByName(deletes), ["k"])
    got = {
        r["k"]: (r["__n"], float(r["s"]))
        for r in out.collect()
    }
    assert got == {1: (1, 10.0), 2: (2, 7.0), 4: (1, 9.0)}  # k=3 gone


def test_apply_cdc_batch_versions(spark, tmp_path):
    """Versioned CDC state: upsert/delete per batch, last-writer-wins
    inside a batch, _CURRENT pointer repoints atomically."""
    from spark_extensions_spark.operators.incremental import (
        apply_cdc_batch,
        read_cdc_state,
    )

    state = str(tmp_path / "state")
    b1 = spark.createDataFrame(
        [(1, "U", 10, 1.0), (1, "U", 11, 2.0), (2, "U", 12, 3.0),
         (3, "U", 13, 4.0)],
        "k int, op string, seq long, v double",
    )
    apply_cdc_batch(b1, state, keys=["k"], order_col="seq")
    s1 = {r["k"]: (r["seq"], r["v"]) for r in
          read_cdc_state(spark, state).collect()}
    assert s1 == {1: (11, 2.0), 2: (12, 3.0), 3: (13, 4.0)}

    b2 = spark.createDataFrame(
        [(2, "D", 20, None), (3, "U", 21, 9.0), (4, "U", 22, 7.0),
         (4, "D", 23, None)],
        "k int, op string, seq long, v double",
    )
    apply_cdc_batch(b2, state, keys=["k"], order_col="seq")
    s2 = {r["k"]: (r["seq"], r["v"]) for r in
          read_cdc_state(spark, state).collect()}
    # 2 deleted, 3 updated, 4's delete wins over its own insert
    assert s2 == {1: (11, 2.0), 3: (21, 9.0)}


def test_backfill_idempotent(spark, tmp_path):
    """backfill_partitions fills exactly the missing partitions and a
    re-run is a no-op."""
    from pyspark.sql import functions as F

    from spark_extensions_spark.operators.incremental import (
        backfill_partitions,
        existing_partitions,
    )

    src = spark.createDataFrame(
        [(i, f"p{i % 4}") for i in range(40)], "id int, p string"
    )
    sink = str(tmp_path / "sink")
    src.filter(F.col("p").isin("p0", "p1")).write.partitionBy("p").parquet(
        sink
    )
    done = backfill_partitions(src, sink, "p")
    assert done == ["p2", "p3"]
    assert existing_partitions(sink, "p") == {"p0", "p1", "p2", "p3"}
    assert spark.read.parquet(sink).count() == 40
    # idempotency: second run processes nothing and changes nothing
    assert backfill_partitions(src, sink, "p") == []
    assert spark.read.parquet(sink).count() == 40


def test_apply_cdc_batch_conflict_detection(spark, tmp_path):
    """Optimistic concurrency: a commit that raced past another
    writer's publish is rejected instead of silently losing it."""
    import pytest as _pytest

    from spark_extensions_spark.operators import incremental as inc

    state = str(tmp_path / "state")
    mk = lambda rows: spark.createDataFrame(
        rows, "k int, op string, seq long, v double"
    )
    inc.apply_cdc_batch(mk([(1, "U", 1, 1.0)]), state, ["k"], "seq")

    # simulate a concurrent writer landing between snapshot-read and
    # publish by patching the version check's first read
    real = inc._current_version
    calls = {"n": 0}

    def racing(sd):
        v = real(sd)
        if calls["n"] == 0:
            calls["n"] += 1
            # concurrent writer commits AFTER our snapshot read
            inc.apply_cdc_batch(mk([(2, "U", 2, 5.0)]), sd, ["k"], "seq")
        return v

    inc._current_version, saved = racing, inc._current_version
    try:
        with _pytest.raises(inc.ConcurrentStateUpdateError):
            inc.apply_cdc_batch(mk([(3, "U", 3, 9.0)]), state, ["k"], "seq")
    finally:
        inc._current_version = saved
    # the concurrent writer's commit survived untouched
    got = {r["k"] for r in inc.read_cdc_state(spark, state).collect()}
    assert got == {1, 2}


def test_cdc_state_versions_and_vacuum(spark, tmp_path):
    """Commit log grows per apply; time travel reads any retained
    version; vacuum removes old snapshots (and orphans) but never the
    retained tail, and rewrites the log accordingly."""
    import os

    from spark_extensions_spark.operators import incremental as inc

    state = str(tmp_path / "state")
    mk = lambda rows: spark.createDataFrame(
        rows, "k int, op string, seq long, v double"
    )
    # n_buckets=1: every apply rewrites the single bucket, so old
    # versions share nothing and vacuum can delete them outright (the
    # bucket-sharing retention rule has its own test below)
    inc.apply_cdc_batch(mk([(1, "U", 1, 1.0)]), state, ["k"], "seq",
                        n_buckets=1)
    inc.apply_cdc_batch(mk([(2, "U", 2, 2.0)]), state, ["k"], "seq")
    inc.apply_cdc_batch(mk([(1, "D", 3, 0.0)]), state, ["k"], "seq")
    assert len(inc.state_versions(state)) == 3
    v0 = {r["k"] for r in inc.read_cdc_state_version(spark, state, 0).collect()}
    v1 = {r["k"] for r in inc.read_cdc_state_version(spark, state, 1).collect()}
    v2 = {r["k"] for r in inc.read_cdc_state_version(spark, state, 2).collect()}
    assert (v0, v1, v2) == ({1}, {1, 2}, {2})
    # orphan: a version dir that never committed
    os.makedirs(os.path.join(state, "v-orphandeadbeef"))
    removed = inc.vacuum_state(state, keep=2)
    assert removed == 2  # v0 snapshot + orphan
    assert len(inc.state_versions(state)) == 2
    # retained versions still read; current unchanged
    assert {r["k"] for r in inc.read_cdc_state(spark, state).collect()} == {2}
    assert {
        r["k"] for r in inc.read_cdc_state_version(spark, state, 0).collect()
    } == {1, 2}  # old index 1 is the new index 0 after log rewrite


def test_cdc_state_bucketed_cow_prunes_rewrites(spark, tmp_path):
    """The state is hash-bucketed; a batch rewrites ONLY the buckets it
    touches (the new version dir holds just those), untouched buckets
    are shared by manifest reference, and vacuum keeps shared dirs
    alive while any retained manifest points into them."""
    import json
    import os

    from spark_extensions_spark.operators import incremental as inc

    state = str(tmp_path / "bstate")
    mk = lambda rows: spark.createDataFrame(
        rows, "k int, op string, seq long, v double"
    )
    # seed 64 keys across 16 buckets
    inc.apply_cdc_batch(
        mk([(k, "U", 1, float(k)) for k in range(64)]),
        state, ["k"], "seq", n_buckets=16,
    )
    v0 = inc._current_version(state)
    m0 = inc._read_manifest(state and v0)
    assert m0["n_buckets"] == 16
    n_seeded = len(m0["buckets"])  # xxhash may leave a bucket empty
    assert n_seeded >= 12

    # a single-key batch touches exactly one bucket
    inc.apply_cdc_batch(mk([(7, "U", 2, 700.0)]), state, ["k"], "seq")
    v1 = inc._current_version(state)
    m1 = inc._read_manifest(v1)
    rewritten = [
        b for b, p in m1["buckets"].items() if p.startswith(v1)
    ]
    shared = [b for b, p in m1["buckets"].items() if p.startswith(v0)]
    assert len(rewritten) == 1  # only key 7's bucket
    assert len(shared) == n_seeded - 1  # everything else shared from v0

    # state correctness across the shared/rewritten seam
    got = {
        r["k"]: r["v"]
        for r in inc.read_cdc_state(spark, state).collect()
    }
    assert len(got) == 64 and got[7] == 700.0 and got[8] == 8.0

    # delete the key again: its bucket empties and leaves the manifest
    inc.apply_cdc_batch(mk([(7, "D", 3, 0.0)]), state, ["k"], "seq")
    got2 = {
        r["k"] for r in inc.read_cdc_state(spark, state).collect()
    }
    assert 7 not in got2 and len(got2) == 63

    # vacuum keep=1 must retain v0 (its buckets are still referenced
    # by the live manifest) — nothing breaks after removal pass
    inc.vacuum_state(state, keep=1)
    assert os.path.isdir(v0)
    got3 = {
        r["k"] for r in inc.read_cdc_state(spark, state).collect()
    }
    assert got3 == got2

    # time travel over the retained tail still resolves
    vs = inc.state_versions(state)
    assert all(
        inc.read_cdc_state_version(spark, state, i).count() >= 63
        for i in range(len(vs))
    )


def test_cdc_vacuum_transitive_reference_chain(spark, tmp_path):
    """Retention must be TRANSITIVE: a version kept only because a
    retained manifest points into it is itself listed in the log, so
    the versions its OWN manifest references must survive too.

    Chain: bucket bX touched at v1, retouched at v3; bucket bY touched
    at v2.  After vacuum(keep=1) the core {v3} references v2 (bY) and
    v0; v2's manifest references v1 (bX) — without the fixpoint, v1 is
    deleted while v2 stays log-listed, and reading v2 hits missing
    parquet paths."""
    import os

    from spark_extensions_spark.operators import incremental as inc

    state = str(tmp_path / "chain")
    mk = lambda rows: spark.createDataFrame(
        rows, "k int, op string, seq long, v double"
    )
    inc.apply_cdc_batch(
        mk([(k, "U", 1, float(k)) for k in range(64)]),
        state, ["k"], "seq", n_buckets=16,
    )
    # two keys in distinct buckets (same JVM-side xxhash64 bucketing
    # apply_cdc_batch uses)
    import pyspark.sql.functions as F

    bmap = {
        r["k"]: r["b"]
        for r in spark.createDataFrame([(k,) for k in range(64)], "k int")
        .select("k", F.pmod(F.xxhash64(F.col("k")), F.lit(16)).alias("b"))
        .collect()
    }
    kx = 0
    ky = next(k for k in range(1, 64) if bmap[k] != bmap[kx])
    inc.apply_cdc_batch(mk([(kx, "U", 2, 1000.0)]), state, ["k"], "seq")
    v1 = inc._current_version(state)
    inc.apply_cdc_batch(mk([(ky, "U", 3, 2000.0)]), state, ["k"], "seq")
    v2 = inc._current_version(state)
    m2 = inc._read_manifest(v2)
    # the chain premise: v2's manifest must reference v1's dir
    assert any(p.startswith(v1) for p in m2["buckets"].values())
    inc.apply_cdc_batch(mk([(kx, "U", 4, 3000.0)]), state, ["k"], "seq")

    inc.vacuum_state(state, keep=1)
    # every log-listed version must be FULLY readable (the fixpoint
    # guarantee) — pre-fix this raised on missing v1 parquet paths
    vs = inc.state_versions(state)
    assert v2 in vs and os.path.isdir(v1)
    for i in range(len(vs)):
        got = {
            r["k"]: r["v"]
            for r in inc.read_cdc_state_version(spark, state, i).collect()
        }
        assert len(got) == 64
    # the v2 snapshot sees kx's v1 value through the shared bucket
    i2 = vs.index(v2)
    got2 = {
        r["k"]: r["v"]
        for r in inc.read_cdc_state_version(spark, state, i2).collect()
    }
    assert got2[kx] == 1000.0 and got2[ky] == 2000.0


def test_join_delta_refresh_identity(spark):
    from spark_extensions_spark.operators.incremental import (
        join_delta_refresh,
    )

    a = spark.createDataFrame([(1, "a"), (2, "b")], "k int, va string")
    da = spark.createDataFrame([(3, "c")], "k int, va string")
    b = spark.createDataFrame([(1, "X"), (3, "Y")], "k int, vb string")
    db = spark.createDataFrame([(2, "Z")], "k int, vb string")
    base = a.join(b, "k")
    delta = join_delta_refresh(a, da, b, db, "k")
    got = sorted(
        (r.k, r.va, r.vb) for r in base.unionByName(delta).collect()
    )
    want = sorted(
        (r.k, r.va, r.vb)
        for r in a.unionByName(da).join(b.unionByName(db), "k").collect()
    )
    assert got == want


def test_read_cdc_changes_versions(spark, tmp_path):
    from spark_extensions_spark.operators.incremental import (
        apply_cdc_batch,
        read_cdc_changes,
    )

    state = str(tmp_path / "state")
    b1 = spark.createDataFrame(
        [(1, "U", 10), (2, "U", 11)], "k int, op string, v int"
    )
    b2 = spark.createDataFrame(
        [(1, "U", 20), (3, "U", 21), (2, "D", 22)],
        "k int, op string, v int",
    )
    apply_cdc_batch(b1, state, ["k"], "v")
    apply_cdc_batch(b2, state, ["k"], "v")
    cf = read_cdc_changes(spark, state, 0, 1, ["k"])
    got = {
        r.k: (r.change_type, r.old_v, r.new_v, r.version)
        for r in cf.collect()
    }
    assert got == {
        1: ("U", 10, 20, 1),
        2: ("D", 11, None, 1),
        3: ("I", None, 21, 1),
    }


def test_scd2_point_in_time_join(spark):
    from spark_extensions_spark.operators.incremental import (
        scd2_point_in_time_join,
    )

    hist = spark.createDataFrame(
        [
            (1, "old", 1, 2, False),
            (1, "new", 2, None, True),
            (2, "gone", 1, 2, False),
        ],
        "k int, attr string, valid_from bigint, valid_to bigint, "
        "is_current boolean",
    )
    facts = spark.createDataFrame(
        [(10, 1, 1), (11, 1, 2), (12, 2, 2), (13, 3, 1)],
        "fid int, k int, ver bigint",
    )
    out = {
        r.fid: r.attr
        for r in scd2_point_in_time_join(
            facts, hist, "k", "k", "ver"
        ).collect()
    }
    # fact at v1 sees the old slice, v2 the new; deleted key and
    # never-existing key enrich to NULL
    assert out == {10: "old", 11: "new", 12: None, 13: None}
