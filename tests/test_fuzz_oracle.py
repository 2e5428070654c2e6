"""Differential fuzzing of the relational core (VERDICT r5 #2).

``tools/fuzz_oracle.py`` generates seed-pinned random query trees over
the proven-portable construct subset and runs each from ONE shared SQL
text on Spark and DuckDB, comparing row counts, column names, and an
order-insensitive value hash. The curated oracle registry proves the
queries we wrote; this probes the compositions we didn't.

Any divergence reproduces standalone:
``python tools/fuzz_oracle.py /root/testdata/sf0.01 --case <i> --seed <s>``
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from fuzz_oracle import gen_case, run_fuzz  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


def test_fuzz_generation_is_seed_pinned():
    """Same (seed, index) must always yield byte-identical SQL —
    otherwise a divergence found in CI can't be reproduced."""
    for i in (0, 1, 17, 499):
        assert gen_case("fuzz-r6", i) == gen_case("fuzz-r6", i)
    # distinct indexes actually vary the query
    assert len({gen_case("fuzz-r6", i) for i in range(25)}) > 15


@pytest.mark.slow
def test_fuzz_500_cases_no_divergence(spark):
    """The graded invariant: 500 seed-pinned random query trees agree
    between Spark and DuckDB, exactly."""
    n_pass, failures = run_fuzz(SF_DIR, 500, seed="fuzz-r6")
    msg = "\n".join(
        f"case {i}: {p}\n  SQL: {sql}" for i, sql, p in failures[:5]
    )
    assert not failures, f"{len(failures)} divergences:\n{msg}"
    assert n_pass == 500


def test_fuzz_smoke_40_cases_no_divergence(spark):
    """Fast default-profile twin of the 500-case gate: the first 40
    seed-pinned query trees (same generator prefix, same comparison);
    the full sweep runs under ``-m slow``."""
    n_pass, failures = run_fuzz(SF_DIR, 40, seed="fuzz-r6")
    msg = "\n".join(
        f"case {i}: {p}\n  SQL: {sql}" for i, sql, p in failures[:5]
    )
    assert not failures, f"{len(failures)} divergences:\n{msg}"
    assert n_pass == 40


def test_fuzz_harness_catches_real_divergence(spark):
    """Mutation check: a KNOWN engine divergence must FAIL the compare
    — ANSI Spark truncates double→int casts toward zero while DuckDB
    rounds half away, so CAST(-7/2 AS INT) is -3 vs -4. If this passes
    the harness, the comparator has no teeth."""
    import duckdb

    from spark_extensions_spark.testing import compare_result_sets

    sql = "SELECT CAST(CAST(-7 AS DOUBLE) / 2 AS INT) AS c0"
    srows = [tuple(r) for r in spark.sql(sql).collect()]
    con = duckdb.connect()
    drows = con.sql(sql).fetchall()
    problems = compare_result_sets(["c0"], srows, ["c0"], drows)
    assert problems, (srows, drows)


@pytest.mark.parametrize("seed", ["fuzz-r6-b", "fuzz-r6-c"])
@pytest.mark.slow
def test_fuzz_alternate_seeds_spot(seed, spark):
    """Two additional 60-case spot sweeps on fresh seeds, so the green
    bar isn't an artifact of one lucky master seed."""
    n_pass, failures = run_fuzz(SF_DIR, 60, seed=seed)
    msg = "\n".join(
        f"case {i}: {p}\n  SQL: {sql}" for i, sql, p in failures[:5]
    )
    assert not failures, f"{len(failures)} divergences:\n{msg}"
    assert n_pass == 60


def test_known_divergence_empty_cube(spark):
    """Engine divergence the ROLLUP/CUBE fuzz shape FOUND (round 6):
    GROUP BY CUBE over an EMPTY input — DuckDB (and Postgres) emit the
    empty-grouping-set grand-total row with count 0, Spark emits zero
    rows. Pinned so a future Spark behavior change surfaces here; the
    fuzz shape normalizes it away with HAVING COUNT(*) > 0."""
    import duckdb

    sql = (
        "SELECT lang AS g0, CAST(COUNT(*) AS BIGINT) AS a0 "
        "FROM documents WHERE 1 = 0 GROUP BY CUBE(lang)"
    )
    from spark_extensions_spark.session import load_tables

    load_tables(
        spark, SF_DIR, "documents"
    )["documents"].createOrReplaceTempView("documents")
    srows = spark.sql(sql).collect()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    drows = con.sql(sql).fetchall()
    assert len(srows) == 0          # Spark: no rows at all
    assert drows == [(None, 0)]     # DuckDB: the grand-total row
    # the normalized form agrees
    sql_norm = sql + " HAVING COUNT(*) > 0"
    assert len(spark.sql(sql_norm).collect()) == 0
    assert con.sql(sql_norm).fetchall() == []


@pytest.mark.parametrize(
    "profile",
    [
        "null_dense", "empty_mixed", "single_row",
        "single_value", "extreme_ints", "neg_keys",
    ],
)
@pytest.mark.slow
def test_fuzz_adversarial_input_profiles(profile, spark):
    """VERDICT r6 #5: the same shape families over adversarially
    transformed inputs — NULL-dense columns, half-empty relations,
    single-row tables, single-valued columns, int64-edge numerics,
    negative/zero keys. Each profile is one portable view text applied
    verbatim on both engines; 100 pinned cases per profile.

    Reproduce standalone: python tools/fuzz_oracle.py <sf> 100
    --seed fuzz-r7-adv --profile <profile> [--case <i>]"""
    from fuzz_oracle import run_fuzz

    n_pass, failures = run_fuzz(
        SF_DIR, 100, seed="fuzz-r7-adv", profile=profile
    )
    msg = "\n".join(
        f"case {i}: {p}\n  SQL: {sql}" for i, sql, p in failures[:5]
    )
    assert not failures, f"[{profile}] {len(failures)} divergences:\n{msg}"
    assert n_pass == 100


def test_fuzz_adversarial_profiles_smoke(spark):
    """Fast default-profile twin of the 6x100 adversarial sweep: the
    first 12 cases of every profile; the full sweep runs under
    ``-m slow``."""
    for profile in (
        "null_dense", "empty_mixed", "single_row",
        "single_value", "extreme_ints", "neg_keys",
    ):
        n_pass, failures = run_fuzz(
            SF_DIR, 12, seed="fuzz-r7-adv", profile=profile
        )
        msg = "\n".join(
            f"case {i}: {p}\n  SQL: {sql}" for i, sql, p in failures[:3]
        )
        assert not failures, f"[{profile}] {len(failures)}:\n{msg}"
        assert n_pass == 12


def test_profile_views_are_portable_and_key_stable(spark):
    """Every profile view must parse on both engines AND preserve the
    shape determinism contract: the table's unique key stays unique and
    non-NULL under every transform (top-k / window shapes ORDER BY it)."""
    import duckdb

    from fuzz_oracle import PROFILES, TABLES, profile_view_sql
    from spark_extensions_spark.session import load_tables

    tables = load_tables(spark, SF_DIR, *TABLES.keys())
    con = duckdb.connect()
    for name, df in tables.items():
        df.createOrReplaceTempView(f"{name}__base")
        con.sql(
            f"CREATE VIEW {name}__base AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{name}.parquet')"
        )
    for profile in PROFILES:
        for name, t in TABLES.items():
            view = profile_view_sql(profile, name)
            s = spark.sql(view)
            d = con.sql(view)
            assert s.columns == list(d.columns), (profile, name)
            if t["key"]:
                check = (
                    f"SELECT CAST(COUNT(*) AS BIGINT) AS n, "
                    f"CAST(COUNT(DISTINCT {t['key']}) AS BIGINT) AS d, "
                    f"CAST(COUNT({t['key']}) AS BIGINT) AS nn "
                    f"FROM ({view}) v"
                )
                n, dk, nn = spark.sql(check).collect()[0]
                assert n == dk == nn, (profile, name, n, dk, nn)
