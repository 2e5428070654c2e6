"""Drift / two-sample statistics vs numpy twins (operators/stats.py)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from spark_extensions_spark.operators.stats import (
    chi_squared,
    group_ols,
    ks_statistic,
    tvd_drift,
    welch_ttest,
)

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def toy(spark):
    rng = np.random.RandomState(7)
    rows = []
    for i in range(400):
        grp = "a" if i % 2 == 0 else "b"
        # b is shifted: drift the KS/t tests must detect
        val = float(np.round(rng.normal(50 if grp == "a" else 55, 10), 2))
        cat = ["x", "y", "z"][i % 3 if grp == "a" else (i + 1) % 3]
        flag = ["F", "O"][(i // 3) % 2]
        rows.append((i, grp, val, cat, flag))
    return spark.createDataFrame(
        rows, "id bigint, grp string, val double, cat string, flag string"
    )


def test_ks_matches_numpy(toy):
    row = ks_statistic(toy, "val", "grp", "a", "b", round_to=0).first()
    pdf = toy.toPandas()
    a = np.round(pdf[pdf.grp == "a"].val.values)
    b = np.round(pdf[pdf.grp == "b"].val.values)
    xs = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), xs, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), xs, side="right") / len(b)
    d_ref = np.max(np.abs(fa - fb))
    assert row.n_a == len(a) and row.n_b == len(b)
    assert abs(row.d_stat - d_ref) < 1e-12
    assert row.d_stat > 0.1  # the shift is detectable


def test_ks_identical_samples_is_zero(spark):
    df = spark.range(100).select(
        F.col("id"),
        ((F.col("id") / F.lit(2)).cast("bigint") % 10)
        .cast("double")
        .alias("val"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("grp"),
    )
    row = ks_statistic(df, "val", "grp", "a", "b", allow_unbounded_domain=True).first()
    assert row.d_stat == 0.0


def test_tvd_matches_numpy(toy):
    row = tvd_drift(toy, "cat", F.col("grp") == "a").first()
    pdf = toy.toPandas()
    cats = sorted(pdf.cat.unique())
    pa = np.array([(pdf[pdf.grp == "a"].cat == c).sum() for c in cats])
    pb = np.array([(pdf[pdf.grp == "b"].cat == c).sum() for c in cats])
    ref = 0.5 * np.abs(pa / pa.sum() - pb / pb.sum()).sum()
    assert abs(row.tvd - ref) < 1e-12
    assert 0.0 <= row.tvd <= 1.0


def test_tvd_no_drift_is_zero(spark):
    df = spark.range(200).select(
        ((F.col("id") / F.lit(2)).cast("bigint") % 4)
        .cast("string")
        .alias("cat"),
        (F.col("id") % 2 == 0).alias("is_a"),
    )
    row = tvd_drift(df, "cat", F.col("is_a")).first()
    assert row.tvd == 0.0


def test_chi2_matches_numpy(toy):
    row = chi_squared(toy, "cat", ["x", "y", "z"], "flag", ["F", "O"]).first()
    pdf = toy.toPandas()
    obs = np.array(
        [
            [((pdf.cat == c) & (pdf.flag == f)).sum() for f in ["F", "O"]]
            for c in ["x", "y", "z"]
        ],
        dtype=float,
    )
    n = obs.sum()
    exp = obs.sum(1, keepdims=True) * obs.sum(0, keepdims=True) / n
    ref = ((obs - exp) ** 2 / exp).sum()
    assert abs(row.chi2 - ref) < 1e-9
    assert row.dof == 2
    assert row.n == len(pdf)


def test_welch_matches_numpy(toy):
    row = welch_ttest(toy, "val", "grp", "a", "b").first()
    pdf = toy.toPandas()
    a = pdf[pdf.grp == "a"].val.values
    b = pdf[pdf.grp == "b"].val.values
    va, vb = a.var(ddof=1), b.var(ddof=1)
    ref = (a.mean() - b.mean()) / math.sqrt(va / len(a) + vb / len(b))
    assert abs(row.t_stat - ref) < 1e-9
    # the b-sample is shifted +5: strongly negative t
    assert row.t_stat < -3


def test_ols_matches_numpy(spark):
    rng = np.random.RandomState(3)
    rows = []
    for g, (slope, icpt) in {"g1": (2.5, 10.0), "g2": (-1.0, 3.0)}.items():
        for _ in range(200):
            x = float(np.round(rng.uniform(0, 100), 2))
            y = float(np.round(slope * x + icpt + rng.normal(0, 5), 2))
            rows.append((g, x, y))
    df = spark.createDataFrame(rows, "grp string, x double, y double")
    out = {r.grp: r for r in group_ols(df, "grp", "x", "y").collect()}
    pdfa = np.array([(x, y) for g, x, y in rows if g == "g1"])
    ref_slope, ref_icpt = np.polyfit(pdfa[:, 0], pdfa[:, 1], 1)
    assert abs(out["g1"].slope - ref_slope) < 1e-6
    assert abs(out["g1"].intercept - ref_icpt) < 1e-6
    assert 0.9 < out["g1"].r2 <= 1.0
    assert out["g2"].slope < 0


def test_mannwhitney_matches_scipy_formula(toy):
    from spark_extensions_spark.operators.stats import mannwhitney_u

    row = mannwhitney_u(toy, "val", "grp", "a", "b", allow_unbounded_domain=True).first()
    pdf = toy.toPandas()
    a = pdf[pdf.grp == "a"].val.values
    b = pdf[pdf.grp == "b"].val.values
    import numpy as np

    combined = np.concatenate([a, b])
    order = combined.argsort(kind="mergesort")
    ranks = np.empty(len(combined))
    # average ranks with ties
    sorted_v = combined[order]
    i = 0
    while i < len(sorted_v):
        j = i
        while j + 1 < len(sorted_v) and sorted_v[j + 1] == sorted_v[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2 + 1
        i = j + 1
    r_a = ranks[: len(a)].sum()
    u_ref = r_a - len(a) * (len(a) + 1) / 2
    assert abs(row.u_a - u_ref) < 1e-9
    # the b sample is shifted +5: strong negative z
    assert row.z < -3
    assert row.n_a == len(a) and row.n_b == len(b)


def test_mannwhitney_identical_samples(spark):
    df = spark.range(200).select(
        ((F.col("id") / F.lit(2)).cast("bigint") % 10)
        .cast("double")
        .alias("val"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("grp"),
    )
    row = mannwhitney_u_import(df)
    assert abs(row.u_a - 100 * 100 / 2) < 1e-9  # E[U] under H0
    assert abs(row.z) < 1e-9


def mannwhitney_u_import(df):
    from spark_extensions_spark.operators.stats import mannwhitney_u

    return mannwhitney_u(df, "val", "grp", "a", "b", allow_unbounded_domain=True).first()


def test_psi_detects_shift_and_zero_when_identical(spark):
    from spark_extensions_spark.operators.stats import psi_drift

    same = spark.range(400).select(
        ((F.col("id") / F.lit(2)).cast("bigint") % 4)
        .cast("string")
        .alias("cat"),
        (F.col("id") % 2 == 0).alias("is_a"),
    )
    r = psi_drift(same, "cat", F.col("is_a")).first()
    assert abs(r.psi) < 1e-9

    shifted = spark.range(400).select(
        F.when(F.col("id") % 2 == 0, (F.col("id") % 4))
        .otherwise((F.col("id") % 2))
        .cast("string")
        .alias("cat"),
        (F.col("id") % 2 == 0).alias("is_a"),
    )
    r2 = psi_drift(shifted, "cat", F.col("is_a")).first()
    assert r2.psi > 0.25  # major distribution change


def test_pps_systematic_properties(spark):
    from spark_extensions_spark.operators.sampling import pps_systematic

    df = spark.range(1, 2001).select(
        F.col("id"), (F.col("id") % 97 + 1).cast("bigint").alias("w")
    )
    out = pps_systematic(df, "id", "w", 100).collect()
    # ~k rows selected (systematic PPS takes exactly k when no w > W/k)
    assert 99 <= len(out) <= 101
    # deterministic: second run identical
    out2 = pps_systematic(df, "id", "w", 100).collect()
    assert {r.id for r in out} == {r.id for r in out2}
    # heavy rows (w >= W/k) are always taken
    big = spark.createDataFrame(
        [(999999, 1_000_000)], "id bigint, w bigint"
    ).unionAll(df)
    picked = {r.id for r in pps_systematic(big, "id", "w", 50).collect()}
    assert 999999 in picked
