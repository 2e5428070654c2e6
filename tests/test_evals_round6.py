"""Round-6 eval operators: exact AUC, calibration ECE, Poisson
bootstrap — hand-computed references and invariants."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from spark_extensions_spark.operators.evals import (
    _POIS1_THRESH,
    auc_exact,
    calibration_ece,
    poisson_bootstrap_replicates,
)


def _auc_reference(pairs):
    """Tie-aware AUC by brute-force pair enumeration."""
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    num = 0.0
    for p in pos:
        for n in neg:
            if p > n:
                num += 1.0
            elif p == n:
                num += 0.5
    return num / (len(pos) * len(neg))


def test_auc_matches_bruteforce(spark):
    pairs = [
        (5, True), (3, True), (3, False), (2, False), (1, False),
        (4, True), (4, False), (0, True),
    ]
    df = spark.createDataFrame(pairs, "score int, y boolean")
    row = auc_exact(df, "score", "y").collect()[0]
    want = _auc_reference(pairs)
    assert row["n_pos"] == 4 and row["n_neg"] == 4
    got = row["correct2"] / (2 * row["n_pos"] * row["n_neg"])
    assert got == want
    assert row["auc_e6"] == math.floor(want * 1e6 + 0.5)


def test_auc_perfect_and_random(spark):
    perfect = spark.createDataFrame(
        [(10, True), (11, True), (1, False), (2, False)],
        "score int, y boolean",
    )
    assert auc_exact(perfect, "score", "y").collect()[0]["auc_e6"] == 1_000_000
    all_tied = spark.createDataFrame(
        [(7, True), (7, False), (7, True), (7, False)],
        "score int, y boolean",
    )
    assert auc_exact(all_tied, "score", "y").collect()[0]["auc_e6"] == 500_000


def test_calibration_ece_hand_case(spark):
    # bin width 100 milli-units over 10 bins
    rows = [
        (950, True), (950, True), (950, False),   # bin 9: conf .95, acc 2/3
        (50, False), (50, False),                  # bin 0: conf .05, acc 0
        (1000, True),                              # conf 1000 clamps to bin 9
    ]
    df = spark.createDataFrame(rows, "conf_e3 int, y boolean")
    got = {
        r["bin"]: (r["n"], r["pos"], r["sum_conf_e3"], r["gap_e3"])
        for r in calibration_ece(df, "conf_e3", "y", bins=10).collect()
    }
    assert set(got) == {0, 9}
    assert got[0] == (2, 0, 100, abs(1000 * 0 - 100))
    assert got[9] == (4, 3, 3850, abs(1000 * 3 - 3850))
    # ECE reconstruction: sum(gap)/1000/N
    ece = sum(v[3] for v in got.values()) / (1000 * 6)
    by_hand = (2 / 6) * abs(0 - 0.05) + (4 / 6) * abs(3 / 4 - 3850 / 4000)
    assert abs(ece - by_hand) < 1e-12


def test_poisson_thresholds_match_cdf():
    """The integer thresholds are floor(1e6 * PoissonCDF(k; λ=1))."""
    cdf = 0.0
    for k, t in enumerate(_POIS1_THRESH):
        cdf += math.exp(-1) / math.factorial(k)
        assert t == math.floor(cdf * 1e6), (k, t)


def test_bootstrap_replicates_invariants(spark):
    rows = [(i, 100 + (i * 37) % 50) for i in range(400)]
    df = spark.createDataFrame(rows, "id int, v int")
    reps = poisson_bootstrap_replicates(
        df, "id", "v", n_replicates=30
    ).collect()
    assert len(reps) == 30
    true_mean = sum(v for _, v in rows) / len(rows)
    means = [r["mean_e6"] / 1e6 for r in reps]
    # Poisson(1) weights: effective n near the input size, replicate
    # means scattered tightly around the true mean
    for r in reps:
        assert 300 <= r["n_eff"] <= 500
        assert r["sum_wv"] > 0
    avg = sum(means) / len(means)
    assert abs(avg - true_mean) < 2.0
    assert len(set(r["mean_e6"] for r in reps)) > 5  # replicates differ
    # deterministic: same salt = same replicates
    again = poisson_bootstrap_replicates(
        df, "id", "v", n_replicates=30
    ).collect()
    assert sorted(map(tuple, reps)) == sorted(map(tuple, again))
    # different salt = different resample
    other = poisson_bootstrap_replicates(
        df, "id", "v", n_replicates=30, salt="other"
    ).collect()
    assert sorted(map(tuple, other)) != sorted(map(tuple, reps))


def test_bootstrap_partial_aggregation_plan(spark):
    """Scale pin: the replicate aggregate must have a partial phase
    (map-side combine) so shuffle volume is B×partitions, not B×rows."""
    df = spark.createDataFrame([(1, 10), (2, 20)], "id int, v int")
    out = poisson_bootstrap_replicates(df, "id", "v", n_replicates=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan


def test_auc_single_class_returns_null_not_crash(spark):
    """Review regression (round 6): single-class input used to throw
    DIVIDE_BY_ZERO under ANSI Spark while the oracle returned NULL."""
    import duckdb

    from spark_extensions_spark.operators.evals import (
        auc_exact_oracle_sql,
    )

    df = spark.createDataFrame(
        [(1, True), (2, True)], "score int, y boolean"
    )
    row = auc_exact(df, "score", "y").collect()[0]
    assert (row["n_pos"], row["n_neg"], row["auc_e6"]) == (2, 0, None)
    con = duckdb.connect()
    drow = con.sql(
        auc_exact_oracle_sql(
            "SELECT 1 AS score, TRUE AS y UNION ALL SELECT 2, TRUE",
            "score",
            "y",
        )
    ).fetchall()[0]
    assert (drow[0], drow[1], drow[3]) == (2, 0, None)
