"""Round-6 wave-3 operators: exact Kendall tau-b, additive seasonal
decomposition, BLEU components, 2-D skyline, running distinct —
hand-computed references and invariants."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from spark_extensions_spark.operators.evals import bleu_counts
from spark_extensions_spark.operators.skyline import skyline_2d
from spark_extensions_spark.operators.stats import kendall_tau
from spark_extensions_spark.operators.timeseries import decompose_additive


# ---------------------------------------------------------------------
# Kendall tau-b
# ---------------------------------------------------------------------


def _kendall_reference(pts):
    """Brute-force pair counts."""
    nc = nd = tx = ty = txy = 0
    for (x1, y1), (x2, y2) in combinations(pts, 2):
        if x1 == x2 and y1 == y2:
            txy += 1
        elif x1 == x2:
            tx += 1
        elif y1 == y2:
            ty += 1
        elif (x1 - x2) * (y1 - y2) > 0:
            nc += 1
        else:
            nd += 1
    return nc, nd, tx, ty, txy


def test_kendall_matches_bruteforce(spark):
    pts = [
        (1, 3), (1, 3), (1, 7), (2, 2), (2, 9), (3, 9),
        (3, 1), (4, 4), (4, 4), (5, 1), (5, 12), (6, 6),
    ]
    nc, nd, tx, ty, txy = _kendall_reference(pts)
    df = spark.createDataFrame(pts, "x int, y int")
    row = kendall_tau(df, "x", "y").collect()[0]
    assert row["concordant"] == nc
    assert row["discordant"] == nd
    # the operator reports ties_x/ties_y as ALL pairs sharing that
    # coordinate (tau-b marginal convention: ties-in-both included)
    assert row["ties_x"] == tx + txy
    assert row["ties_y"] == ty + txy
    assert row["ties_xy"] == txy
    n = len(pts)
    n0 = n * (n - 1) // 2
    assert row["n_pairs"] == n0
    # pair-count partition identity
    assert nc + nd + tx + ty + txy == n0
    want = (nc - nd) / (
        ((n0 - (tx + txy)) * (n0 - (ty + txy))) ** 0.5
    )
    assert abs(row["tau_b"] - want) < 1e-12


def test_kendall_degenerate_constant_column(spark):
    df = spark.createDataFrame(
        [(1, 5), (1, 7), (1, 9)], "x int, y int"
    )
    row = kendall_tau(df, "x", "y").collect()[0]
    assert row["concordant"] == 0 and row["discordant"] == 0
    assert row["tau_b"] is None  # zero denominator factor -> NULL


def test_kendall_perfect_monotone(spark):
    df = spark.createDataFrame(
        [(i, 10 * i) for i in range(8)], "x int, y int"
    )
    row = kendall_tau(df, "x", "y").collect()[0]
    assert row["tau_b"] == 1.0
    rev = spark.createDataFrame(
        [(i, -3 * i) for i in range(8)], "x int, y int"
    )
    assert kendall_tau(rev, "x", "y").collect()[0]["tau_b"] == -1.0


# ---------------------------------------------------------------------
# Additive decomposition
# ---------------------------------------------------------------------


def test_decompose_identity_and_edges(spark):
    import datetime as dt

    base = dt.date(1992, 1, 6)  # a Monday; pos = days since 1992-01-01
    vals = [10, 12, 9, 14, 11, 8, 13, 10, 15, 9, 12, 11, 9, 14, 10]
    rows = [
        (base + dt.timedelta(days=i), v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "d date, v long")
    out = decompose_additive(df, "d", "v", period=7)
    got = {r["d"]: r for r in out.collect()}
    assert len(got) == len(vals)
    # edges (first/last 3 rows) have no full window -> NULL trend
    for i in (0, 1, 2, len(vals) - 3, len(vals) - 2, len(vals) - 1):
        assert got[rows[i][0]]["trend_x7"] is None
        assert got[rows[i][0]]["resid_num"] is None
    # interior: trend_x7 is the exact 7-sum; the residual identity
    # 7*v - trend = seas_num/seas_den + resid_num/(7*seas_den) holds
    # exactly after clearing denominators
    for i in range(3, len(vals) - 3):
        r = got[rows[i][0]]
        assert r["trend_x7"] == sum(vals[i - 3 : i + 4])
        det = 7 * r["v"] - r["trend_x7"]
        assert det * r["seas_den"] == r["seas_num"] + r["resid_num"]
    # seasonal indexes: one (num, den) pair per position, consistent
    seas = {(r["pos"], r["seas_num"], r["seas_den"]) for r in got.values()
            if r["seas_num"] is not None}
    assert len({p for p, _, _ in seas}) == len(seas)


def test_decompose_rejects_even_period(spark):
    import pytest

    df = spark.createDataFrame([("1992-01-01", 1)], "d string, v long")
    with pytest.raises(ValueError):
        decompose_additive(df, "d", "v", period=4)


# ---------------------------------------------------------------------
# BLEU components
# ---------------------------------------------------------------------


def test_bleu_hand_case(spark):
    # classic clipping example: hypothesis repeats "the"
    ref = "the cat is on the mat"
    hyp = "the the the the the the the"
    df = spark.createDataFrame([(1, ref, hyp)], "id long, r string, h string")
    row = bleu_counts(df, "id", "r", "h", max_n=2).collect()[0]
    assert row["ref_len"] == 6 and row["hyp_len"] == 7
    # unigram matches clipped at ref count of "the" (=2); total = 7
    assert row["match_1"] == 2 and row["total_1"] == 7
    assert row["p_1_e6"] == (2 * 1_000_000) // 7
    # "the the" never occurs in the reference
    assert row["match_2"] == 0 and row["total_2"] == 6
    assert row["p_2_e6"] == 0


def test_bleu_identical_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "a b c d", "a b c d"), (2, "a b", "")],
        "id long, r string, h string",
    )
    rows = {r["id"]: r for r in
            bleu_counts(df, "id", "r", "h", max_n=2).collect()}
    assert rows[1]["p_1_e6"] == 1_000_000
    assert rows[1]["p_2_e6"] == 1_000_000
    assert rows[2]["match_1"] == 0 and rows[2]["total_1"] == 0
    assert rows[2]["p_1_e6"] == 0  # empty hypothesis -> 0, not NULL


# ---------------------------------------------------------------------
# 2-D skyline
# ---------------------------------------------------------------------


def _skyline_reference(pts):
    out = []
    for p in pts:
        dominated = any(
            q[0] <= p[0] and q[1] >= p[1] and (q[0] < p[0] or q[1] > p[1])
            for q in pts
        )
        if not dominated:
            out.append(p)
    return sorted(out)


def test_skyline_matches_bruteforce(spark):
    import random

    rng = random.Random(42)
    pts = [(rng.randrange(50), rng.randrange(100)) for _ in range(400)]
    df = spark.createDataFrame(pts, "x int, y int")
    got = sorted(
        (r["x"], r["y"]) for r in skyline_2d(df, "x", "y").collect()
    )
    assert got == _skyline_reference(pts)


def test_skyline_keeps_duplicate_frontier_points(spark):
    pts = [(1, 10), (1, 10), (2, 5), (0, 3)]
    df = spark.createDataFrame(pts, "x int, y int")
    got = sorted(
        (r["x"], r["y"]) for r in skyline_2d(df, "x", "y").collect()
    )
    # (2,5) dominated by (1,10); (0,3) survives (smaller x);
    # both copies of (1,10) survive (ties don't dominate each other)
    assert got == [(0, 3), (1, 10), (1, 10)]


def test_skyline_worst_case_all_survive(spark):
    # under (min x, max y) the worst case is y increasing with x:
    # no point dominates any other, the frontier is the whole set
    pts = [(i, i) for i in range(30)]
    df = spark.createDataFrame(pts, "x int, y int")
    assert skyline_2d(df, "x", "y").count() == 30
    # and the single-dominator case collapses to one row
    one = [(0, 100)] + [(i, 100 - i) for i in range(1, 30)]
    df1 = spark.createDataFrame(one, "x int, y int")
    assert skyline_2d(df1, "x", "y").count() == 1


# ---------------------------------------------------------------------
# Running COUNT(DISTINCT) window
# ---------------------------------------------------------------------


def test_running_distinct_equals_prefix_set_size(spark):
    import random

    rng = random.Random(7)
    rows = [
        (u, i, rng.choice("abcde"))
        for u in range(5)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "user_id int, seq int, t string")
    from pyspark.sql import Window

    w_run = (
        Window.partitionBy("user_id")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    got = (
        df.withColumn(
            "__f",
            F.when(
                F.row_number().over(
                    Window.partitionBy("user_id", "t").orderBy("seq")
                )
                == 1,
                1,
            ).otherwise(0),
        )
        .select(
            "user_id", "seq", F.sum("__f").over(w_run).alias("rd")
        )
        .collect()
    )
    by_user: dict[int, list] = {}
    for u, i, t in rows:
        by_user.setdefault(u, []).append((i, t))
    want = {}
    for u, seq in by_user.items():
        seen = set()
        for i, t in sorted(seq):
            seen.add(t)
            want[(u, i)] = len(seen)
    for r in got:
        assert r["rd"] == want[(r["user_id"], r["seq"])]


# ---------------------------------------------------------------------
# Spearman rho
# ---------------------------------------------------------------------


def _spearman_reference(pts):
    """Pearson on average ranks, brute force."""
    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while (
                j + 1 < len(order)
                and vals[order[j + 1]] == vals[order[i]]
            ):
                j += 1
            r = (i + j) / 2 + 1
            for k in range(i, j + 1):
                ranks[order[k]] = r
            i = j + 1
        return ranks

    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(pts)
    mx = sum(rx) / n
    my = sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    dx = sum((a - mx) ** 2 for a in rx)
    dy = sum((b - my) ** 2 for b in ry)
    return num / (dx * dy) ** 0.5


def test_spearman_matches_bruteforce(spark):
    from spark_extensions_spark.operators.stats import spearman_rho

    pts = [
        (1, 3), (1, 3), (1, 7), (2, 2), (2, 9), (3, 9),
        (3, 1), (4, 4), (4, 4), (5, 1), (5, 12), (6, 6),
    ]
    df = spark.createDataFrame(pts, "x int, y int")
    row = spearman_rho(df, "x", "y").collect()[0]
    assert row["n"] == len(pts)
    assert abs(row["rho_s"] - _spearman_reference(pts)) < 1e-12


def test_spearman_monotone_and_degenerate(spark):
    from spark_extensions_spark.operators.stats import spearman_rho

    mono = spark.createDataFrame(
        [(i, i * i) for i in range(9)], "x int, y int"
    )
    assert spearman_rho(mono, "x", "y").collect()[0]["rho_s"] == 1.0
    const = spark.createDataFrame(
        [(1, 5), (1, 9), (1, 2)], "x int, y int"
    )
    assert spearman_rho(const, "x", "y").collect()[0]["rho_s"] is None


# ---------------------------------------------------------------------
# CUSUM change-point
# ---------------------------------------------------------------------


def test_cusum_finds_injected_level_shift(spark):
    import datetime as dt

    from spark_extensions_spark.operators.timeseries import (
        cusum_changepoint,
    )

    base = dt.date(2020, 1, 1)
    # level shift from 10 to 30 at index 40 of 80
    rows = [
        (base + dt.timedelta(days=i), 10 if i < 40 else 30)
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "d date, v long")
    got = cusum_changepoint(df, "d", "v").collect()[0]
    # max |C_k| lands exactly on the last pre-shift observation
    assert got["cp_k"] == 40
    assert got["cp_date"] == base + dt.timedelta(days=39)
    assert got["n"] == 80 and got["total"] == 40 * 10 + 40 * 30
    # hand value: C_40 = n*P_40 - 40*S = 80*400 - 40*1600
    assert got["c_abs_max"] == abs(80 * 400 - 40 * 1600)


def test_cusum_constant_series_ties_to_earliest(spark):
    import datetime as dt

    from spark_extensions_spark.operators.timeseries import (
        cusum_changepoint,
    )

    base = dt.date(2020, 1, 1)
    rows = [(base + dt.timedelta(days=i), 5) for i in range(10)]
    df = spark.createDataFrame(rows, "d date, v long")
    got = cusum_changepoint(df, "d", "v").collect()[0]
    assert got["c_abs_max"] == 0 and got["cp_date"] == base


# ---------------------------------------------------------------------
# Benford audit
# ---------------------------------------------------------------------


def test_benford_digit_extraction_and_spine(spark):
    from spark_extensions_spark.operators.quality import (
        BENFORD_E6,
        benford_audit,
    )

    vals = [1.5, 19.0, 123.0, 2.0, 0.4, -7.0, 900.0, 95.2, 9999.0]
    df = spark.createDataFrame([(v,) for v in vals], "amt double")
    rows = {r["digit"]: r for r in benford_audit(df, "amt").collect()}
    assert set(rows) == set(range(1, 10))  # full spine, absent = 0
    # 0.4 and -7.0 excluded; digits: 1,1,1,2,9,9,9 -> total 7
    assert rows[1]["cnt"] == 3 and rows[2]["cnt"] == 1
    assert rows[9]["cnt"] == 3 and rows[5]["cnt"] == 0
    assert rows[1]["total"] == 7
    assert rows[1]["observed_e6"] == (3 * 1_000_000) // 7
    assert rows[1]["expected_e6"] == BENFORD_E6[0] == 301030
    assert rows[1]["dev_e6"] == (3 * 1_000_000) // 7 - 301030
    assert sum(r["cnt"] for r in rows.values()) == 7


# ---------------------------------------------------------------------
# t-closeness
# ---------------------------------------------------------------------


def test_t_closeness_hand_case(spark):
    from spark_extensions_spark.operators.privacy import (
        t_closeness_classes,
    )

    # two classes over sensitive domain {a, b, c}; global: a=4, b=2,
    # c=2 of N=8. class X = (a,a,b,c): perfectly proportional -> 0.
    # class Y = (a,a,b,c) too; make Y skewed instead: (a,a,a,a)
    rows = (
        [("X", "a")] * 2 + [("X", "b"), ("X", "c")] + [("Y", "a")] * 4
    )
    # global: a=6, b=1, c=1, N=8
    df = spark.createDataFrame(rows, "q string, s string")
    got = {r["q"]: r for r in
           t_closeness_classes(df, ["q"], "s", t_e6=200_000).collect()}
    # class X: N_c=4. terms: |2*8-6*4|=8, |1*8-1*4|=4, |1*8-1*4|=4
    # present_mass=8 -> absent=0; tvd_num=16, tvd_den=64 -> TVD=0.25
    assert got["X"]["tvd_num"] == 16 and got["X"]["tvd_den"] == 64
    assert got["X"]["t_ok"] is False  # 0.25 > 0.2
    # class Y: |4*8-6*4|=8; absent mass=(8-6)*4=8; num=16, den=64
    assert got["Y"]["tvd_num"] == 16 and got["Y"]["tvd_den"] == 64
    # brute-force cross-check: TVD(Y) = .5*(|1-6/8|+|0-1/8|+|0-1/8|)
    assert abs(16 / 64 - 0.5 * (abs(1 - 6 / 8) + 1 / 8 + 1 / 8)) < 1e-12


def test_t_closeness_uniform_class_is_zero(spark):
    from spark_extensions_spark.operators.privacy import (
        t_closeness_classes,
    )

    rows = [("X", "a"), ("X", "b"), ("Y", "a"), ("Y", "b")]
    df = spark.createDataFrame(rows, "q string, s string")
    for r in t_closeness_classes(df, ["q"], "s").collect():
        assert r["tvd_num"] == 0 and r["t_ok"] is True


# ---------------------------------------------------------------------
# Gini
# ---------------------------------------------------------------------


def _gini_reference(vals):
    xs = sorted(vals)
    n = len(xs)
    s = sum(xs)
    return sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs)) / (
        n * s
    )


def test_gini_matches_bruteforce_with_ties(spark):
    from spark_extensions_spark.operators.stats import gini_exact

    vals = [1, 1, 2, 3, 3, 3, 10, 50, 50, 0, 7]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    row = gini_exact(df, "v").collect()[0]
    assert row["n"] == len(vals) and row["total"] == sum(vals)
    assert abs(row["gini"] - _gini_reference(vals)) < 1e-12


def test_gini_extremes(spark):
    from spark_extensions_spark.operators.stats import gini_exact

    equal = spark.createDataFrame([(5,)] * 10, "v long")
    assert gini_exact(equal, "v").collect()[0]["gini"] == 0.0
    # all mass on one row of n: G = (n-1)/n
    conc = spark.createDataFrame([(0,)] * 9 + [(100,)], "v long")
    assert abs(gini_exact(conc, "v").collect()[0]["gini"] - 0.9) < 1e-12
    zero = spark.createDataFrame([(0,), (0,)], "v long")
    assert gini_exact(zero, "v").collect()[0]["gini"] is None


# ---------------------------------------------------------------------
# Sliding COUNT(DISTINCT)
# ---------------------------------------------------------------------


def test_sliding_distinct_matches_bruteforce(spark):
    import random

    from spark_extensions_spark.operators.windows import (
        sliding_count_distinct,
    )

    rng = random.Random(11)
    rows = [
        (u, i, rng.choice("abcdefg"))
        for u in range(4)
        for i in range(60)
    ]
    k = 7
    df = spark.createDataFrame(rows, "u int, seq int, t string")
    got = {
        (r["u"], r["seq"]): r["win_distinct"]
        for r in sliding_count_distinct(
            df, ["u"], ["seq"], "t", k=k
        ).collect()
    }
    by_u: dict[int, list] = {}
    for u, i, t in rows:
        by_u.setdefault(u, []).append((i, t))
    for u, seq in by_u.items():
        seq.sort()
        for j in range(len(seq)):
            frame = {t for _, t in seq[max(0, j - k + 1) : j + 1]}
            assert got[(u, seq[j][0])] == len(frame)


def test_sliding_distinct_edges(spark):
    import pytest

    from spark_extensions_spark.operators.windows import (
        sliding_count_distinct,
    )

    df = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "a"), (1, 3, "b")], "u int, seq int, t string"
    )
    # k=1: every frame is a single row -> always 1
    got = sliding_count_distinct(df, ["u"], ["seq"], "t", k=1).collect()
    assert all(r["win_distinct"] == 1 for r in got)
    with pytest.raises(ValueError):
        sliding_count_distinct(df, ["u"], ["seq"], "t", k=0)


# ---------------------------------------------------------------------
# Review-fix regressions (round-6 wave-3 code review)
# ---------------------------------------------------------------------


def test_gini_huge_values_no_int64_overflow(spark):
    """Per-term v*cnt*(2B+cnt-n) must multiply in DECIMAL: with
    v ~ 5e17 the int64 product overflows (ANSI Spark throws)."""
    from spark_extensions_spark.operators.stats import gini_exact

    vals = [500_000_000_000_000_000] * 3 + [100_000_000_000_000_000] * 7
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    row = gini_exact(df, "v").collect()[0]
    assert abs(row["gini"] - _gini_reference(vals)) < 1e-12


def test_decompose_custom_column_names(spark):
    """The trend window must order by the RENAMED column, not the
    caller's name (resolution broke for date_col != 'd')."""
    import datetime as dt

    from spark_extensions_spark.operators.timeseries import (
        decompose_additive,
    )

    base = dt.date(1993, 5, 1)
    rows = [
        (base + dt.timedelta(days=i), 10 + (i % 3)) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "order_date date, cnt long")
    out = decompose_additive(df, "order_date", "cnt", period=7).collect()
    assert len(out) == 10  # resolves and runs


def test_decompose_pre_anchor_dates_positive_pos(spark):
    """pmod, not %: dates BEFORE the anchor must land in the same
    0..period-1 position space as dates after it."""
    import datetime as dt

    from spark_extensions_spark.operators.timeseries import (
        decompose_additive,
    )

    base = dt.date(1991, 12, 20)  # before the 1992-01-01 anchor
    rows = [(base + dt.timedelta(days=i), 5) for i in range(21)]
    df = spark.createDataFrame(rows, "d date, v long")
    got = decompose_additive(df, "d", "v", period=7).collect()
    poses = {r["pos"] for r in got}
    assert poses == set(range(7))
    assert all(0 <= r["pos"] < 7 for r in got)


def test_sliding_distinct_excludes_nulls(spark):
    from spark_extensions_spark.operators.windows import (
        sliding_count_distinct,
    )

    rows = [
        (1, 1, None), (1, 2, "a"), (1, 3, None), (1, 4, "b"),
        (1, 5, "a"), (1, 6, None),
    ]
    df = spark.createDataFrame(rows, "u int, seq int, t string")
    got = {
        r["seq"]: r["win_distinct"]
        for r in sliding_count_distinct(df, ["u"], ["seq"], "t", k=3).collect()
    }
    # frames (k=3): {N}=0, {N,a}=1, {N,a,N}=1, {a,N,b}=2, {N,b,a}=2,
    # {b,a,N}=2 — NULLs never counted, NULL rows still present
    assert got == {1: 0, 2: 1, 3: 1, 4: 2, 5: 2, 6: 2}


def test_sliding_distinct_null_partition_key(spark):
    """Window.partitionBy groups NULL keys into ONE real partition;
    the delta join must use null-safe equality or every row in the
    NULL-key partition gets win_distinct=0 (ADVICE r6, medium)."""
    from spark_extensions_spark.operators.windows import (
        sliding_count_distinct,
    )

    rows = [
        (None, 1, "a"), (None, 2, "b"), (None, 3, "a"),
        (1, 1, "x"), (1, 2, "x"),
    ]
    df = spark.createDataFrame(rows, "u int, seq int, t string")
    got = {
        (r["u"], r["seq"]): r["win_distinct"]
        for r in sliding_count_distinct(df, ["u"], ["seq"], "t", k=2).collect()
    }
    # NULL-key partition frames (k=2): {a}=1, {a,b}=2, {b,a}=2
    assert got == {
        (None, 1): 1, (None, 2): 2, (None, 3): 2,
        (1, 1): 1, (1, 2): 1,
    }


def test_skyline_null_coordinates_excluded(spark):
    from spark_extensions_spark.operators.skyline import skyline_2d

    pts = [(1, 10), (None, 99), (2, None), (0, 3)]
    df = spark.createDataFrame(pts, "x int, y int")
    got = sorted(
        (r["x"], r["y"]) for r in skyline_2d(df, "x", "y").collect()
    )
    assert got == [(0, 3), (1, 10)]


def test_t_closeness_null_sensitive_is_a_category(spark):
    from spark_extensions_spark.operators.privacy import (
        t_closeness_classes,
    )

    # class X is ALL-NULL sensitive; the old equi-join dropped it
    rows = [("X", None), ("X", None), ("Y", "a"), ("Y", None)]
    df = spark.createDataFrame(rows, "q string, s string")
    got = {r["q"]: r for r in
           t_closeness_classes(df, ["q"], "s").collect()}
    assert set(got) == {"X", "Y"}
    # global: NULL=3, a=1 of N=4. class X (2 rows, all NULL):
    # |2*4-3*2|=2, absent a: 1*2=2 -> num=4, den=16 -> TVD=0.25
    assert got["X"]["tvd_num"] == 4 and got["X"]["tvd_den"] == 16
    # class Y (a=1, NULL=1): |1*4-1*2| + |1*4-3*2| = 2+2 -> num 4
    assert got["Y"]["tvd_num"] == 4 and got["Y"]["tvd_den"] == 16
    # brute-force: TVD(X) = .5*(|1-3/4| + |0-1/4|) = .25
    assert abs(4 / 16 - 0.25) < 1e-15


def test_t_closeness_null_quasi_is_a_class(spark):
    from spark_extensions_spark.operators.privacy import (
        t_closeness_classes,
    )

    rows = [(None, "a"), (None, "b"), ("Q", "a")]
    df = spark.createDataFrame(rows, "q string, s string")
    got = t_closeness_classes(df, ["q"], "s").collect()
    assert len(got) == 2
    assert any(r["q"] is None and r["class_size"] == 2 for r in got)


# ---------------------------------------------------------------------
# Cramér's V
# ---------------------------------------------------------------------


def test_cramers_v_hand_case(spark):
    from spark_extensions_spark.operators.stats import cramers_v

    # 2x2 table: perfect association -> V = 1
    rows = [("a", "x")] * 5 + [("b", "y")] * 5
    df = spark.createDataFrame(rows, "u string, w string")
    r = cramers_v(df, "u", ["a", "b"], "w", ["x", "y"]).collect()[0]
    assert abs(r["v"] - 1.0) < 1e-12 and r["dof"] == 1
    # independence -> V = 0
    rows = [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")] * 3
    df = spark.createDataFrame(rows, "u string, w string")
    r = cramers_v(df, "u", ["a", "b"], "w", ["x", "y"]).collect()[0]
    assert abs(r["v"]) < 1e-12


def test_cramers_v_identifier_unsafe_categories(spark):
    """Category values like '1-URGENT' must not break the generated
    aliases (review of the first verify failure)."""
    from spark_extensions_spark.operators.stats import cramers_v

    rows = [("1-URGENT", "A B"), ("2-HIGH", "C/D"), ("1-URGENT", "C/D")]
    df = spark.createDataFrame(rows, "u string, w string")
    r = cramers_v(
        df, "u", ["1-URGENT", "2-HIGH"], "w", ["A B", "C/D"]
    ).collect()[0]
    assert r["n"] == 3 and r["dof"] == 1


# ---------------------------------------------------------------------
# Lorenz curve
# ---------------------------------------------------------------------


def _lorenz_reference(vals, n_bands):
    xs = sorted(vals)
    n, total = len(xs), sum(xs)
    out = []
    for k in range(1, n_bands + 1):
        n_k = (n * k) // n_bands
        out.append((k, n_k, sum(xs[:n_k]), total))
    return out


def test_lorenz_matches_bruteforce_with_ties(spark):
    from spark_extensions_spark.operators.stats import lorenz_points

    vals = [1, 1, 1, 2, 3, 3, 10, 10, 10, 10, 50, 0, 7]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = [
        (r["band"], r["n_k"], r["l_num"], r["l_den"])
        for r in lorenz_points(df, "v", n_bands=10)
        .orderBy("band")
        .collect()
    ]
    assert got == _lorenz_reference(vals, 10)


def test_lorenz_final_band_is_total(spark):
    from spark_extensions_spark.operators.stats import lorenz_points

    vals = [5, 5, 5, 5]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    rows = {r["band"]: r for r in lorenz_points(df, "v", 4).collect()}
    assert rows[4]["l_num"] == rows[4]["l_den"] == 20
    # uniform values -> Lorenz is the diagonal: L(k/4) = k/4
    for k in range(1, 5):
        assert rows[k]["l_num"] * 4 == rows[k]["l_den"] * k


# ---------------------------------------------------------------------
# Streaming running distinct: cross-batch state carry
# ---------------------------------------------------------------------


def test_streaming_running_distinct_state_carries(spark, tmp_path):
    import datetime as _dt
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_extensions_spark.streaming import (
        read_stream_parquet,
        run_available_now,
    )
    from spark_extensions_spark.streaming.stateful import (
        running_distinct_state,
    )

    def pd_ts(s):
        return _dt.datetime.fromisoformat(s).replace(
            tzinfo=_dt.timezone.utc
        )

    rows1 = [(1, 1, "2024-01-01T00:00:00", "view"),
             (1, 2, "2024-01-01T00:00:01", "click")]
    rows2 = [(1, 3, "2024-01-01T00:00:02", "view"),
             (1, 4, "2024-01-01T00:00:03", "purchase")]
    src = str(tmp_path / "src")
    os.makedirs(src)

    def write(rows, name, mtime):
        tbl = pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([pd_ts(r[2]) for r in rows],
                           pa.timestamp("us", tz="UTC")),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
        })
        p = os.path.join(src, name)
        pq.write_table(tbl, p)
        os.utime(p, (mtime, mtime))

    now = _time.time()
    write(rows1, "b0.parquet", now - 60)
    write(rows2, "b1.parquet", now + 60)
    schema = spark.read.parquet(src).schema
    stream = read_stream_parquet(
        spark, src, schema, max_files_per_trigger=1
    ).select("user_id", "event_id", "ts", "event_type")
    out = running_distinct_state(
        stream, "user_id", "ts", "event_id", "event_type"
    )
    got = {
        r["event_id"]: r["run_types"]
        for r in run_available_now(out, output_mode="append").collect()
    }
    # batch 1's first 'view' is NOT new (seen in batch 0) -> state
    # carried; 'purchase' IS new
    assert got == {1: 1, 2: 2, 3: 2, 4: 3}


# ---------------------------------------------------------------------
# pass@k
# ---------------------------------------------------------------------


def test_pass_at_k_matches_bruteforce(spark):
    from math import comb

    from spark_extensions_spark.operators.evals import pass_at_k

    cases = {  # problem -> (n, c)
        1: (10, 0), 2: (10, 3), 3: (10, 10), 4: (10, 6),
        5: (5, 1), 6: (4, 2),  # n < k -> excluded
    }
    rows = []
    for p, (n, c) in cases.items():
        rows += [(p, i < c) for i in range(n)]
    df = spark.createDataFrame(rows, "p int, passed boolean")
    got = {r["problem"]: r for r in
           pass_at_k(df, "p", "passed", k=5).collect()}
    assert 6 not in got  # n < k excluded
    for p, (n, c) in cases.items():
        if n < 5:
            continue
        want = 1 - comb(n - c, 5) / comb(n, 5)
        assert got[p]["n"] == n and got[p]["c"] == c
        assert got[p]["pass_at_k_e6"] == int(want * 1e6) or abs(
            got[p]["pass_at_k_e6"] - want * 1e6
        ) < 1  # floor of the exact rational
    assert got[1]["pass_at_k_e6"] == 0
    assert got[3]["pass_at_k_e6"] == 1_000_000


def test_pass_at_k_rejects_bad_k(spark):
    import pytest

    from spark_extensions_spark.operators.evals import pass_at_k

    df = spark.createDataFrame([(1, True)], "p int, passed boolean")
    with pytest.raises(ValueError):
        pass_at_k(df, "p", "passed", k=0)


# ---------------------------------------------------------------------
# Second review-pass regressions
# ---------------------------------------------------------------------


def test_pass_at_k_large_n_stays_decimal(spark):
    """The k! cancels, so the ratio never drops to LONG — n=6300
    crashed the pre-fix form with ARITHMETIC_OVERFLOW."""
    from math import comb

    from spark_extensions_spark.operators.evals import pass_at_k

    n, c = 6300, 100
    rows = [(1, i < c) for i in range(n)]
    df = spark.createDataFrame(rows, "p int, passed boolean")
    got = pass_at_k(df, "p", "passed", k=5).collect()[0]
    want = 1 - comb(n - c, 5) / comb(n, 5)
    assert abs(got["pass_at_k_e6"] / 1e6 - want) < 2e-6


def test_cramers_v_colliding_and_quoted_categories(spark):
    """'A B' vs 'A/B' must NOT collide under alias sanitization, and
    a quote in a category value must not break the generated SQL."""
    import duckdb

    from spark_extensions_spark.operators.stats import (
        cramers_v,
        cramers_v_oracle_sql,
    )

    rows = [("A B", "x"), ("A/B", "y"), ("A B", "x"), ("O'N", "y")]
    df = spark.createDataFrame(rows, "u string, w string")
    r = cramers_v(
        df, "u", ["A B", "A/B", "O'N"], "w", ["x", "y"]
    ).collect()[0]
    assert r["n"] == 4 and r["v"] is not None
    # oracle side runs the same generated SQL without error
    con = duckdb.connect()
    con.sql("CREATE TABLE t AS SELECT * FROM (VALUES "
            "('A B','x'),('A/B','y'),('A B','x'),('O''N','y')) v(u, w)")
    o = con.sql(
        cramers_v_oracle_sql("t", "u", ["A B", "A/B", "O'N"], "w", ["x", "y"])
    ).fetchall()[0]
    assert abs(o[0] - r["v"]) < 1e-12


def test_cramers_v_rejects_single_category(spark):
    import pytest

    from spark_extensions_spark.operators.stats import cramers_v

    df = spark.createDataFrame([("a", "x")], "u string, w string")
    with pytest.raises(ValueError):
        cramers_v(df, "u", ["a"], "w", ["x", "y"])


def test_running_distinct_state_empty_string_value(spark, tmp_path):
    """A seen-set of {''} must survive the state roundtrip (the old
    separator blob deserialized it to an empty set)."""
    import datetime as _dt
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_extensions_spark.streaming import (
        read_stream_parquet,
        run_available_now,
    )
    from spark_extensions_spark.streaming.stateful import (
        running_distinct_state,
    )

    def pd_ts(s):
        return _dt.datetime.fromisoformat(s).replace(
            tzinfo=_dt.timezone.utc
        )

    rows1 = [(1, 1, "2024-01-01T00:00:00", "")]
    rows2 = [(1, 2, "2024-01-01T00:00:01", ""),
             (1, 3, "2024-01-01T00:00:02", "view")]
    src = str(tmp_path / "src")
    os.makedirs(src)

    def write(rows, name, mtime):
        tbl = pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([pd_ts(r[2]) for r in rows],
                           pa.timestamp("us", tz="UTC")),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
        })
        p = os.path.join(src, name)
        pq.write_table(tbl, p)
        os.utime(p, (mtime, mtime))

    now = _time.time()
    write(rows1, "b0.parquet", now - 60)
    write(rows2, "b1.parquet", now + 60)
    schema = spark.read.parquet(src).schema
    stream = read_stream_parquet(
        spark, src, schema, max_files_per_trigger=1
    ).select("user_id", "event_id", "ts", "event_type")
    out = running_distinct_state(
        stream, "user_id", "ts", "event_id", "event_type"
    )
    got = {
        r["event_id"]: r["run_types"]
        for r in run_available_now(out, output_mode="append").collect()
    }
    # '' is a VALUE (non-NULL): batch 0 sees it (1); batch 1's ''
    # is not new (still 1), then 'view' makes 2
    assert got == {1: 1, 2: 1, 3: 2}


# ---------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------


def test_count_min_point_estimates_dominate_truth(spark):
    from collections import Counter

    from spark_extensions_spark.operators.sketches import (
        count_min_table,
        f_concat,
    )
    from spark_extensions_spark.operators.dedup import hash64_expr

    import random

    rng = random.Random(3)
    terms = [rng.choice(["a", "b", "c", "dd", "ee", "ff", "g"])
             for _ in range(500)]
    truth = Counter(terms)
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    d, w = 4, 16
    sketch = {
        (r["row_id"], r["cell"]): r["cnt"]
        for r in count_min_table(df, "term", d=d, w=w).collect()
    }
    # total mass preserved per row
    for i in range(d):
        assert sum(v for (ri, _), v in sketch.items() if ri == i) == 500
    # CM guarantee: estimate >= truth for every term
    probe = spark.createDataFrame(
        [(t,) for t in truth], "term string"
    ).select(
        "term",
        *[
            __import__("pyspark.sql.functions", fromlist=["expr"]).expr(
                f"pmod({hash64_expr(f_concat(i, 'term'))}, {w})"
            ).cast("int").alias(f"h{i}")
            for i in range(d)
        ],
    )
    for r in probe.collect():
        est = min(sketch.get((i, r[f"h{i}"]), 0) for i in range(d))
        assert est >= truth[r["term"]]


def test_count_min_merge_is_cell_addition(spark):
    from spark_extensions_spark.operators.sketches import count_min_table

    a = spark.createDataFrame([("x",), ("y",), ("x",)], "term string")
    b = spark.createDataFrame([("x",), ("z",)], "term string")
    both = a.union(b)
    s_both = {
        (r["row_id"], r["cell"]): r["cnt"]
        for r in count_min_table(both, "term", d=2, w=8).collect()
    }
    s_a = {
        (r["row_id"], r["cell"]): r["cnt"]
        for r in count_min_table(a, "term", d=2, w=8).collect()
    }
    s_b = {
        (r["row_id"], r["cell"]): r["cnt"]
        for r in count_min_table(b, "term", d=2, w=8).collect()
    }
    merged = dict(s_a)
    for k, v in s_b.items():
        merged[k] = merged.get(k, 0) + v
    assert merged == s_both


# ---------------------------------------------------------------------
# ACF
# ---------------------------------------------------------------------


def test_acf_matches_numpy_style_reference(spark):
    import datetime as dt

    from spark_extensions_spark.operators.timeseries import acf_exact

    vals = [10, 12, 9, 14, 11, 8, 13, 10, 15, 9, 12, 11, 9, 14, 10,
            16, 8, 11, 13, 12]
    base = dt.date(2020, 1, 1)
    rows = [(base + dt.timedelta(days=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "d date, v long")
    got = {r["lag"]: r for r in acf_exact(df, "d", "v", max_lag=3).collect()}
    from fractions import Fraction

    n = len(vals)
    s_tot = sum(vals)
    # exact reference with u_t = n*x_t - S (integer arithmetic)
    us = [n * x - s_tot for x in vals]
    den_int = sum(u * u for u in us)
    for lag in (1, 2, 3):
        num_int = sum(us[i] * us[i + lag] for i in range(n - lag))
        assert got[lag]["num"] == num_int
        assert got[lag]["den"] == den_int
        assert abs(
            got[lag]["acf"] - float(Fraction(num_int, den_int))
        ) < 1e-15


def test_acf_constant_series_null(spark):
    import datetime as dt

    from spark_extensions_spark.operators.timeseries import acf_exact

    base = dt.date(2020, 1, 1)
    rows = [(base + dt.timedelta(days=i), 7) for i in range(10)]
    df = spark.createDataFrame(rows, "d date, v long")
    for r in acf_exact(df, "d", "v", max_lag=2).collect():
        assert r["den"] == 0 and r["acf"] is None


# ---------------------------------------------------------------------
# Bloom-prefiltered incremental dedup
# ---------------------------------------------------------------------


def test_bloom_prefilter_no_false_negatives(spark):
    from spark_extensions_spark.operators.sketches import (
        bloom_prefilter_dedup,
    )

    hist = spark.createDataFrame(
        [(i, f"key{i}") for i in range(200)], "id long, k string"
    )
    # 30 true dups + 170 fresh keys
    new = spark.createDataFrame(
        [(1000 + i, f"key{i}") for i in range(30)]
        + [(2000 + i, f"fresh{i}") for i in range(170)],
        "id long, k string",
    )
    got = {r["id"]: r for r in
           bloom_prefilter_dedup(new, hist, "id", "k", d=3, m=512)
           .collect()}
    assert len(got) == 200
    for i in range(30):  # every true dup is maybe AND confirmed
        r = got[1000 + i]
        assert r["maybe_dup"] is True and r["confirmed_dup"] is True
    for r in got.values():  # Bloom never false-negatives
        assert not (r["confirmed_dup"] and not r["maybe_dup"])
    # fresh keys are never confirmed (maybe may be True: FPR)
    for i in range(170):
        assert got[2000 + i]["confirmed_dup"] is False


def test_bloom_bits_merge_is_union(spark):
    from spark_extensions_spark.operators.sketches import bloom_bits

    a = spark.createDataFrame([("x",), ("y",)], "k string")
    b = spark.createDataFrame([("z",)], "k string")
    bits = lambda df: {r["bit"] for r in
                       bloom_bits(df, "k", d=2, m=64).collect()}
    assert bits(a.union(b)) == bits(a) | bits(b)
