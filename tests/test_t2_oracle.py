"""The t2 gate, locally: every registered query vs its DuckDB oracle at
sf0.001 (fast). The driver runs the same comparison at sf0.01."""

from __future__ import annotations

import duckdb
import pytest

from spark_extensions_spark.queries import registry
from spark_extensions_spark.session import ALL_TABLES
from spark_extensions_spark.testing import compare_result_sets

QUERIES = registry()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in ALL_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("q", QUERIES, ids=[q.name for q in QUERIES])
def test_query_matches_oracle(q, spark, sf_dir, duck):
    sdf = q.spark(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    if q.oracle is None:
        assert srows is not None  # rows-only smoke: runs and returns
        return
    ddf = duck.sql(q.oracle)
    problems = compare_result_sets(sdf.columns, srows, list(ddf.columns), ddf.fetchall())
    assert not problems, f"{q.name}: {problems}"


def test_compare_result_sets_catches_mismatches():
    """The gate itself must fail loudly on row-count, column-name and
    value differences — and pass on column/row reordering (the
    order-insensitivity it promises)."""
    from spark_extensions_spark.testing import compare_result_sets

    cols = ["a", "b"]
    rows = [(1, "x"), (2, "y")]
    assert compare_result_sets(cols, rows, cols, rows) == []
    # row order and column order are canonicalized away
    assert compare_result_sets(cols, rows, cols, [(2, "y"), (1, "x")]) == []
    assert (
        compare_result_sets(cols, rows, ["b", "a"], [("x", 1), ("y", 2)])
        == []
    )
    # real differences are caught
    assert compare_result_sets(cols, rows, cols, rows[:1])
    assert compare_result_sets(cols, rows, ["a", "c"], rows)
    assert compare_result_sets(cols, rows, cols, [(1, "x"), (2, "z")])
    assert compare_result_sets(cols, rows, cols, [(1, "x"), (3, "y")])
