"""Round-8 wave: independent-recompute twins for the new queries —
mutual information, closed-form CUSUM, split-conformal calibration,
margin-criterion pair mining, and the streaming curation flagship's
building blocks.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _daily_cents(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("d"))
        .agg(
            F.sum(
                F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)")
            ).alias("cents")
        )
        .collect()
    )
    return [r["cents"] for r in sorted(rows, key=lambda r: r["d"])]


def test_mutual_info_matches_python_recompute(spark, sf_dir):
    from spark_extensions_spark.queries50 import q_stat_mutual_info

    out = q_stat_mutual_info(spark, sf_dir).collect()[0]
    cells = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_orderpriority", "o_orderstatus")
        .count()
        .collect()
    )
    n = sum(r["count"] for r in cells)
    cx, cy = {}, {}
    for r in cells:
        cx[r["o_orderpriority"]] = cx.get(r["o_orderpriority"], 0) + r["count"]
        cy[r["o_orderstatus"]] = cy.get(r["o_orderstatus"], 0) + r["count"]
    num = sum(
        math.floor(
            r["count"]
            * math.log(
                (r["count"] * n)
                / (cx[r["o_orderpriority"]] * cy[r["o_orderstatus"]])
            )
            * 1e6
            + 0.5
        )
        for r in cells
    )
    assert out["n"] == n
    assert out["n_cells"] == len(cells)
    # per-term quantization slack: each of the n_cells terms may land
    # one unit off across ln implementations
    assert abs(out["mi_num_e6"] - num) <= len(cells)
    assert out["mi_nats"] >= 0


def test_cusum_closed_form_equals_textbook_recursion(spark, sf_dir):
    from spark_extensions_spark.queries50 import q_ts_cusum

    series = _daily_cents(spark, sf_dir)
    d_n, total = len(series), sum(series)
    s, expect = 0, []
    for x in series:
        s = max(0, s + (x * d_n - total))
        expect.append(s)
    out = q_ts_cusum(spark, sf_dir).collect()
    got = [r["cusum_scaled"] for r in sorted(out, key=lambda r: r["d"])]
    assert got == expect
    assert all(r["scale_d"] == d_n for r in out)


def test_conformal_qhat_and_coverage_recompute(spark, sf_dir):
    from spark_extensions_spark.queries50 import q_eval_conformal

    series = _daily_cents(spark, sf_dir)
    res = [abs(b - a) for a, b in zip(series, series[1:])]
    # the split ranks ALL m days (day 1's NULL residual included) and
    # keeps rn <= (m*7)//10 — so residual i (for day i+2) is
    # calibration iff i+2 <= (m*7)//10
    m = len(series)
    n_cal = (m * 7) // 10 - 1
    cal, ev = res[:n_cal], res[n_cal:]
    rank = min(((n_cal + 1) * 9 + 9) // 10, n_cal)
    q_hat = sorted(cal)[rank - 1]
    out = q_eval_conformal(spark, sf_dir).collect()[0]
    assert out["n_cal"] == n_cal
    assert out["n_eval"] == len(ev)
    assert out["q_hat_cents"] == q_hat
    assert out["n_covered"] == sum(1 for r in ev if r <= q_hat)


def test_margin_mining_matches_numpy_bruteforce(spark, sf_dir):
    import numpy as np

    from spark_extensions_spark.queries50 import (
        _MM_K,
        _MM_MIN_E6,
        _MM_QUERIES,
        q_retrieval_margin_mining,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb}
    side = {r["vec_id"]: r["label"] % 2 for r in emb}
    xs_all = sorted(i for i in vecs if side[i] == 0)
    xs = [i for i in xs_all if i < _MM_QUERIES]
    ys = sorted(i for i in vecs if side[i] == 1)

    def cos(a, b):
        va, vb = vecs[a], vecs[b]
        return float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))

    def topk(q, corpus):
        scored = sorted(corpus, key=lambda c: (-cos(q, c), c))[:_MM_K]
        return [(c, math.floor(cos(q, c) * 1e9 + 0.5)) for c in scored]

    expect = {}
    bwd_cache = {y: sum(e for _, e in topk(y, xs_all)) for y in ys}
    for x in xs:
        nn = topk(x, ys)
        y, c_e9 = nn[0]
        fwd = sum(e for _, e in nn)
        margin = math.floor(
            c_e9 * 2 * _MM_K / (fwd + bwd_cache[y]) * 1e6 + 0.5
        )
        if margin > _MM_MIN_E6:
            expect[(x, y)] = (c_e9, margin)
    got = {
        (r["x_id"], r["y_id"]): (r["cosine_e9"], r["margin_e6"])
        for r in q_retrieval_margin_mining(spark, sf_dir).collect()
    }
    # numpy accumulates the dot in a different order than the
    # sequential fold; e9 quantization can differ by 1 unit, which can
    # propagate one unit into margin_e6 — compare with that slack
    assert set(got) == set(expect)
    for k in expect:
        assert abs(got[k][0] - expect[k][0]) <= 1, k
        assert abs(got[k][1] - expect[k][1]) <= 2, k


def test_streaming_curation_history_invariants(spark, sf_dir):
    from spark_extensions_spark.queries50 import (
        q_pipeline_streaming_curation,
    )

    rows = q_pipeline_streaming_curation(spark, sf_dir).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    assert len(by_user) == n_users
    for u, slices in by_user.items():
        cur = [r for r in slices if r["is_current"]]
        assert len(cur) == 1, u
        assert cur[0]["valid_to"] is None
        # counts are monotone across versions; closed slice precedes
        for r in slices:
            if not r["is_current"]:
                assert r["valid_from"] < r["valid_to"]
                assert r["n_events"] <= cur[0]["n_events"]
                assert r["n_err"] <= cur[0]["n_err"]


def test_assortativity_matches_python_recompute(spark, sf_dir):
    from collections import Counter

    from spark_extensions_spark.queries50 import q_graph_assortativity

    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    by_order = {}
    for r in li:
        by_order.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    pairs = [(deg[u], deg[v]) for u, v in edges] + [
        (deg[v], deg[u]) for u, v in edges
    ]
    n = len(pairs)
    sx = sum(x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    sxx = sum(x * x for x, _ in pairs)
    syy = sum(y * y for _, y in pairs)
    sxy = sum(x * y for x, y in pairs)
    import math

    r_exp = (n * sxy - sx * sy) / (
        math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    )
    out = q_graph_assortativity(spark, sf_dir).collect()[0]
    assert out["n_pairs"] == n
    assert (out["sx"], out["sxx"], out["sxy"]) == (sx, sxx, sxy)
    assert abs(out["r"] - r_exp) < 1e-12


def test_assortativity_regular_graph_null_r(spark):
    from spark_extensions_spark.operators.graph import degree_assortativity

    # 4-cycle: every degree 2 -> zero variance -> defined NULL
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src int, dst int"
    )
    out = degree_assortativity(edges).collect()[0]
    assert out["r"] is None
    assert out["n_pairs"] == 8


def test_trimmed_mean_matches_sorted_recompute(spark, sf_dir):
    from spark_extensions_spark.queries50 import _TM_TRIM, q_agg_trimmed_mean

    rows = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .selectExpr(
            "o_orderpriority AS g",
            "cast(floor(o_totalprice * 100 + 0.5d) as bigint) AS v",
        )
        .collect()
    )
    by_g = {}
    for r in rows:
        by_g.setdefault(r["g"], []).append(r["v"])
    out = {r["g"]: r for r in q_agg_trimmed_mean(spark, sf_dir).collect()}
    assert set(out) == set(by_g)
    for g, vals in by_g.items():
        vals.sort()
        t = len(vals) // _TM_TRIM
        kept = vals[t : len(vals) - t]
        assert out[g]["n"] == len(vals)
        assert out[g]["n_kept"] == len(kept)
        assert out[g]["sum_kept"] == sum(kept)


def test_neyman_allocation_sums_to_budget_and_orders_by_spread(
    spark, sf_dir
):
    from spark_extensions_spark.queries50 import _NY_BUDGET, q_sample_neyman

    rows = q_sample_neyman(spark, sf_dir).collect()
    assert sum(r["alloc"] for r in rows) == _NY_BUDGET
    # weight = sqrt(N*Sum(x^2) - (Sum x)^2) recompute
    data = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .selectExpr(
            "o_orderpriority AS g",
            "cast(floor(o_totalprice * 100 + 0.5d) as bigint) AS v",
        )
        .collect()
    )
    import math

    by_g = {}
    for r in data:
        by_g.setdefault(r["g"], []).append(r["v"])
    for r in rows:
        vals = by_g[r["stratum"]]
        n = len(vals)
        rad = n * sum(v * v for v in vals) - sum(vals) ** 2
        assert r["n_rows"] == n
        assert r["w"] == math.floor(math.sqrt(rad) + 0.5)


def test_matryoshka_ratios_monotone_and_bounded(spark, sf_dir):
    from spark_extensions_spark.queries50 import q_embedding_matryoshka

    rows = {
        r["prefix_dim"]: r
        for r in q_embedding_matryoshka(spark, sf_dir).collect()
    }
    assert set(rows) == {8, 16, 32}
    prev = 0.0
    for p in (8, 16, 32):
        r = rows[p]
        assert 0.0 <= r["avg_ratio"] <= 1.0 + 1e-9
        assert r["avg_ratio"] >= prev  # energy grows with prefix
        prev = r["avg_ratio"]
        assert r["ratio_sum_e9"] <= r["n"] * 1_000_000_001


def test_mad_matches_sorted_recompute(spark, sf_dir):
    from spark_extensions_spark.queries50 import q_stat_mad

    rows = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .selectExpr(
            "o_orderpriority AS g",
            "cast(floor(o_totalprice * 100 + 0.5d) as bigint) AS v",
        )
        .collect()
    )
    by_g = {}
    for r in rows:
        by_g.setdefault(r["g"], []).append(r["v"])
    out = {r["g"]: r for r in q_stat_mad(spark, sf_dir).collect()}
    assert set(out) == set(by_g)
    for g, vals in by_g.items():
        vals.sort()
        med = vals[(len(vals) + 1) // 2 - 1]
        devs = sorted(abs(v - med) for v in vals)
        mad = devs[(len(devs) + 1) // 2 - 1]
        assert out[g]["n"] == len(vals)
        assert out[g]["median_cents"] == med
        assert out[g]["mad_cents"] == mad


def test_brier_murphy_identity_and_recompute(spark, sf_dir):
    from spark_extensions_spark.queries50 import q_eval_brier

    out = q_eval_brier(spark, sf_dir).collect()[0]
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "cast(event_id % 100 as bigint) AS p",
            "case when event_type = 'click' then 1 else 0 end AS y",
        )
        .collect()
    )
    n = len(ev)
    s = sum(r["y"] for r in ev)
    brier = sum((r["p"] / 100 - r["y"]) ** 2 for r in ev)
    assert out["n"] == n and out["n_pos"] == s
    # e9 per-term quantization slack: n terms for brier
    assert abs(out["brier_num_e9"] - brier * 1e9) <= n
    # Murphy identity brier = rel - res + unc (numerators all scaled
    # by n*1e9), within the combined per-term slack
    lhs = out["brier_num_e9"]
    rhs = out["rel_num_e9"] - out["res_num_e9"] + out["unc_num_e9"]
    assert abs(lhs - rhs) <= n + 210  # bins*2 + 1 extra slack


def test_levene_equals_anova_on_absolute_deviations(spark, sf_dir):
    from spark_extensions_spark.operators.stats import anova_f
    from spark_extensions_spark.queries50 import q_stat_levene

    rows = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .selectExpr(
            "o_orderpriority AS g",
            "cast(floor(o_totalprice * 100 + 0.5d) as bigint) AS v",
        )
        .collect()
    )
    by_g = {}
    for r in rows:
        by_g.setdefault(r["g"], []).append(r["v"])
    meds = {
        g: sorted(vs)[(len(vs) + 1) // 2 - 1] for g, vs in by_g.items()
    }
    z_rows = [
        (g, abs(v - meds[g])) for g, vs in by_g.items() for v in vs
    ]
    ref = anova_f(
        spark.createDataFrame(z_rows, "grp string, z bigint"),
        "z",
        "grp",
        scale=1,
    ).collect()[0]
    out = q_stat_levene(spark, sf_dir).collect()[0]
    assert out["k_groups"] == ref["k_groups"]
    assert out["n_total"] == ref["n_total"]
    assert abs(out["f_stat"] - ref["f_stat"]) < 1e-9


def test_growth_accounting_identities(spark, sf_dir):
    from spark_extensions_spark.queries50 import (
        q_analytic_growth_accounting,
    )

    rows = sorted(
        q_analytic_growth_accounting(spark, sf_dir).collect(),
        key=lambda r: r["d"],
    )
    total_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    # actives decompose exactly; news sum to the distinct user count
    assert sum(r["n_new"] for r in rows) == total_users
    prev_active = 0
    for r in rows:
        assert (
            r["n_active"]
            == r["n_new"] + r["n_retained"] + r["n_resurrected"]
        )
        assert r["n_churned"] == prev_active - r["n_retained"]
        assert 0 <= r["n_retained"] <= min(r["n_active"], prev_active or 10**9)
        prev_active = r["n_active"]


def test_auc_pr_matches_sklearn_style_recompute(spark, sf_dir):
    from spark_extensions_spark.queries50 import q_eval_auc_pr

    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "cast(event_id % 100 as bigint) AS s",
            "event_type = 'click' AS y",
        )
        .collect()
    )
    from collections import Counter

    pos, tot = Counter(), Counter()
    for r in rows:
        tot[r["s"]] += 1
        pos[r["s"]] += int(r["y"])
    p_tot = sum(pos.values())
    cum_n = cum_p = 0
    ap_num = 0
    import math

    for s in sorted(tot, reverse=True):
        cum_n += tot[s]
        cum_p += pos[s]
        ap_num += math.floor(pos[s] * cum_p / cum_n * 1e9 + 0.5)
    out = q_eval_auc_pr(spark, sf_dir).collect()[0]
    assert out["n"] == len(rows)
    assert out["n_pos"] == p_tot
    assert abs(out["ap_num_e9"] - ap_num) <= len(tot)
    assert abs(out["ap"] - ap_num / (p_tot * 1e9)) < 1e-9
    # AP of a random scorer ~ base rate; sanity bound
    assert 0.0 <= out["ap"] <= 1.0


def test_cusum_handles_series_starting_above_mean(spark):
    """The round-8 review bug: without the empty-prefix (pref_0 = 0)
    anchor in the cumulative min, S_1 collapsed to 0 whenever day 1
    sat above the mean. Pin a hand series where it does."""
    # series 9, 1, 2 (mean 4): textbook S (scaled by D=3, T=12):
    # dev = [15, -9, -6]; S = [15, 6, 0]
    series = [9, 1, 2]
    d_n, total = len(series), sum(series)
    s_val, expect = 0, []
    for x in series:
        s_val = max(0, s_val + (x * d_n - total))
        expect.append(s_val)
    assert expect == [15, 6, 0]
    import duckdb

    con = duckdb.connect()
    con.sql(
        "CREATE TABLE orders AS SELECT * FROM (VALUES "
        "(DATE '2024-01-01', 9.0), (DATE '2024-01-02', 1.0), "
        "(DATE '2024-01-03', 2.0)) t(o_orderdate, o_totalprice)"
    )
    from spark_extensions_spark.queries50 import _cusum_oracle

    got = [
        r[1]
        for r in sorted(con.sql(_cusum_oracle()).fetchall())
    ]
    assert got == [v * 100 for v in expect]  # cents scaling
