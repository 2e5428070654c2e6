"""Tests for the round-7 composed release flagship
(queries44.pipeline_release_v2): full oracle twin at sf0.001 plus the
stage invariants the manifest aggregate alone cannot show."""

from __future__ import annotations

import duckdb
import pytest

from spark_extensions_spark.queries44 import (
    _RG2_B,
    _RG2_BUDGET,
    _RG2_SHARDS,
    _release_v2_oracle,
    q_pipeline_release_v2,
)
from spark_extensions_spark.testing import compare_result_sets


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    yield con
    con.close()


def test_release_v2_matches_oracle(spark, sf_dir, duck):
    sdf = q_pipeline_release_v2(spark, sf_dir)
    cols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    drel = duck.sql(_release_v2_oracle())
    drows = drel.fetchall()
    problems = compare_result_sets(cols, srows, drel.columns, drows)
    assert not problems, problems
    assert len(srows) > 5  # several (lang, shard) manifest rows


def test_release_v2_manifest_invariants(spark, sf_dir, duck):
    rows = {
        r["pack_key"]: r for r in q_pipeline_release_v2(spark, sf_dir).collect()
    }
    langs = {k.split("|")[0] for k in rows}
    shards = {int(k.split("|")[1]) for k in rows}
    assert langs >= {"en", "de"}  # the gate keeps a multilingual mix
    assert shards <= set(range(_RG2_SHARDS))
    for r in rows.values():
        assert 1 <= r["n_bins"] <= r["n_chunks"]
        # a bin never exceeds the pack budget unless a single oversized
        # chunk forced it — chunks are <= 64 tokens, so never here
        assert r["n_tokens"] <= r["n_bins"] * _RG2_B
    # chunk overlap (stride < window) re-counts tokens, so the packed
    # total can exceed the Hamilton budget, but the BUDGET bounds the
    # pre-chunk selection: with W=64,S=48 inflation is < W/S = 4/3 + one
    # window per doc; 2x is a safe structural ceiling
    assert sum(r["n_tokens"] for r in rows.values()) < 2 * _RG2_BUDGET


def test_release_v2_drops_prior_release_dups(spark, sf_dir, duck):
    # every text_key in the prior release (hist cut) must be absent
    # from the released batch: re-derive the released doc set by
    # running the oracle chain up to rg2_kept in DuckDB and check
    # against hist text keys
    sql = _release_v2_oracle()
    head, _ = sql.rsplit("SELECT pack_key,", 1)
    leaked = duck.sql(
        head
        + """
        SELECT COUNT(*) FROM rg2_kept k
        JOIN (SELECT doc_id, lang, text FROM documents) d USING (doc_id)
        JOIN (SELECT DISTINCT text_key FROM rg2_hist) h
          ON md5(d.text) = h.text_key
        """
    ).fetchone()[0]
    assert leaked == 0
