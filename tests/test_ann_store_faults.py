"""Crash-point fault injection for the persisted ANN index lifecycle
(VERDICT r9 #7) — operators/ann_store.py.

Same two properties as test_fault_injection.py, at every publish
boundary of the index store:

1. ATOMICITY — serving reads (read_index / serving_codebook) see
   either entirely the pre-operation version or entirely the
   committed one, never a blend (no uncommitted segment, no unflipped
   manifest, no new codebook with old codes);
2. CONVERGENCE — replaying the interrupted operation yields exactly
   the no-crash end state, with one copy of every row.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import spark_extensions_spark.operators.ann_store as st


def _emb(spark, sf_dir):
    from spark_extensions_spark.session import load_tables

    return load_tables(spark, sf_dir, "embeddings")["embeddings"]


def _base_batch(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    return (
        emb.filter(F.col("vec_id") % 10 != 0),
        emb.filter(F.col("vec_id") % 10 == 0),
    )


def _rows(spark, index_dir):
    return sorted(
        (r["id"], r["list_id"])
        for r in st.read_index(spark, index_dir).collect()
    )


@pytest.fixture()
def published(spark, sf_dir, tmp_path):
    base, batch = _base_batch(spark, sf_dir)
    d = str(tmp_path / "idx")
    st.publish_base(base, d, "vec_id", "embedding", 4)
    return d, base, batch


def test_refresh_crash_after_segment(spark, published):
    d, base, batch = published
    before = _rows(spark, d)
    cb_before = st.serving_codebook(d)
    with pytest.raises(RuntimeError, match="injected"):
        st.refresh(batch, d, "b1", "vec_id", "embedding",
                   fail_after="segment")
    # ATOMICITY: the uncommitted segment is invisible to serving
    assert _rows(spark, d) == before
    assert st.serving_codebook(d) == cb_before
    # CONVERGENCE: replay rewrites the segment and publishes once
    st.refresh(batch, d, "b1", "vec_id", "embedding")
    got = _rows(spark, d)
    assert len(got) == len(before) + batch.count()
    assert len(got) == len(set(got)), "duplicate rows after replay"


def test_refresh_crash_after_manifest(spark, published):
    d, base, batch = published
    before = _rows(spark, d)
    with pytest.raises(RuntimeError, match="injected"):
        st.refresh(batch, d, "b1", "vec_id", "embedding",
                   fail_after="manifest")
    # pointer never flipped — serving still the base version
    assert _rows(spark, d) == before
    st.refresh(batch, d, "b1", "vec_id", "embedding")
    got = _rows(spark, d)
    assert len(got) == len(before) + batch.count()
    assert len(got) == len(set(got)), "duplicate rows after replay"


def test_refresh_replay_after_commit_is_noop(spark, published):
    d, base, batch = published
    st.refresh(batch, d, "b1", "vec_id", "embedding")
    committed = _rows(spark, d)
    v = st.current_version(d)
    assert st.refresh(batch, d, "b1", "vec_id", "embedding") is None
    assert _rows(spark, d) == committed
    assert st.current_version(d) == v


@pytest.mark.parametrize("boundary", ["codebook", "segment", "manifest"])
def test_rebuild_crash_keeps_old_serving(spark, published, boundary):
    d, base, batch = published
    st.refresh(batch, d, "b1", "vec_id", "embedding")
    before = _rows(spark, d)
    cb_before = st.serving_codebook(d)
    full = base.unionByName(batch)
    with pytest.raises(RuntimeError, match="injected"):
        st.rebuild(full, d, "vec_id", "embedding", 8, "r1",
                   fail_after=boundary)
    # old codebook + old segments still serve — never a blend
    assert _rows(spark, d) == before
    assert st.serving_codebook(d) == cb_before
    # replay converges to the retrained index
    st.rebuild(full, d, "vec_id", "embedding", 8, "r1")
    assert len(st.serving_codebook(d)) == 8
    got = _rows(spark, d)
    assert len(got) == full.count()
    assert len(got) == len(set(got))


def test_vacuum_removes_only_orphans(spark, published):
    d, base, batch = published
    with pytest.raises(RuntimeError, match="injected"):
        st.refresh(batch, d, "crashed", "vec_id", "embedding",
                   fail_after="segment")
    before = _rows(spark, d)
    removed = st.vacuum_orphans(d)
    assert len(removed) == 1 and "seg_crashed" in removed[0]
    # every referenced segment survives — serving unchanged
    assert _rows(spark, d) == before


def test_serving_query_consistent_across_refresh(spark, sf_dir, published):
    """End-to-end: top-k served against the store equals the inline
    persisted-index query on the same corpus + codebook."""
    from spark_extensions_spark.operators.similarity import (
        ann_ivf_query_index,
    )

    d, base, batch = published
    st.refresh(batch, d, "b1", "vec_id", "embedding")
    idx = st.read_index(spark, d).select(
        F.col("id").alias("vec_id"), F.col("vec").alias("embedding"),
        "list_id",
    )
    cents = st.serving_codebook(d)
    queries = _emb(spark, sf_dir).filter(F.col("vec_id") < 3)
    served = ann_ivf_query_index(
        idx, cents, queries, "vec_id", "embedding", "vec_id",
        "embedding", k=5, n_probe=2,
    )
    rows = served.collect()
    assert len(rows) > 0
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
