"""Brute-force twins for the round-7 wave-3 operators: the Gram
identity behind embedding_label_coherence and the PSI invariants of
streaming_quality_monitor."""

from __future__ import annotations

import math

from pyspark.sql import Row


def test_label_coherence_matches_bruteforce_pairs(spark, sf_dir):
    from spark_extensions_spark.queries47 import (
        _LC_QUANT,
        q_embedding_label_coherence,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    qs = {
        r["vec_id"]: (
            r["label"],
            [math.floor(float(v) * _LC_QUANT + 0.5) for v in r["embedding"]],
        )
        for r in emb
    }
    got = {
        r["label"]: r
        for r in q_embedding_label_coherence(spark, sf_dir).collect()
    }
    labels = sorted({lab for lab, _ in qs.values()})
    ids = sorted(qs)
    # brute force: explicit pairwise dot products (the O(n²) the
    # operator avoids)
    for lab in labels:
        mine = [q for (l2, q) in (qs[i] for i in ids) if l2 == lab]
        rest = [q for (l2, q) in (qs[i] for i in ids) if l2 != lab]
        intra = sum(
            sum(a * b for a, b in zip(mine[i], mine[j]))
            for i in range(len(mine))
            for j in range(len(mine))
            if i != j
        )
        cross = sum(
            sum(a * b for a, b in zip(m, r))
            for m in mine
            for r in rest
        )
        row = got[lab]
        assert row["n"] == len(mine)
        assert row["intra_num"] == intra
        assert row["intra_den"] == len(mine) * (len(mine) - 1)
        assert row["cross_num"] == cross
        assert row["cross_den"] == len(mine) * len(rest)


def test_quality_monitor_psi_invariants(spark, sf_dir):
    from spark_extensions_spark.queries47 import (
        _QM_TYPES,
        q_streaming_quality_monitor,
    )

    rows = q_streaming_quality_monitor(spark, sf_dir).collect()
    assert rows, "monitor must emit one row per day window"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert sum(r["n_events"] for r in rows) == ev.count()
    for r in rows:
        # PSI terms are (p-r)ln(p/r) >= 0 by construction
        assert r["psi_e12"] >= 0


def test_quality_monitor_flags_skewed_window(spark, tmp_path):
    # synthetic: one balanced day, one all-'error' day — the skewed
    # window must score a much higher PSI
    import datetime as dt

    from spark_extensions_spark.queries47 import _QM_TYPES, _qm_term_sql

    rows = []
    base = dt.datetime(2024, 3, 1)
    for i, t in enumerate(_QM_TYPES * 20):
        rows.append(Row(ts=base + dt.timedelta(minutes=i), event_type=t))
    for i in range(100):
        rows.append(
            Row(
                ts=base + dt.timedelta(days=1, minutes=i),
                event_type="error",
            )
        )
    df = spark.createDataFrame(rows)
    path = str(tmp_path / "events.parquet")
    df.write.parquet(path)
    # run the batch shape of the monitor directly on the two windows
    import duckdb

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    from spark_extensions_spark.queries47 import _qm_oracle

    got = {r[0].day: r[2] for r in con.sql(_qm_oracle()).fetchall()}
    assert got[1] < got[2] / 10  # balanced day ≈ 0, skewed day >> 0


def test_hll_register_merge_is_elementwise_max(spark):
    from spark_extensions_spark.operators.sketches import (
        hll_register_table,
    )

    a = spark.range(0, 600).selectExpr("id AS k")
    b = spark.range(400, 1000).selectExpr("id AS k")
    both = a.unionByName(b)
    ra = {r["bucket"]: r["max_rank"] for r in hll_register_table(a, "k").collect()}
    rb = {r["bucket"]: r["max_rank"] for r in hll_register_table(b, "k").collect()}
    ru = {
        r["bucket"]: r["max_rank"]
        for r in hll_register_table(both, "k").collect()
    }
    merged = {
        k: max(ra.get(k, 0), rb.get(k, 0)) for k in set(ra) | set(rb)
    }
    assert merged == ru


def test_hll_estimate_error_bound(spark):
    from spark_extensions_spark.operators.sketches import hll_estimate

    for n in (500, 5000, 50000):
        df = spark.range(n).selectExpr("cast(id as string) AS k")
        row = hll_estimate(df, "k").collect()[0]
        assert row["exact_distinct"] == n
        # m=256 -> sigma ~ 6.5%; allow 3 sigma plus small-n bias
        assert abs(row["estimate"] - n) / n < 0.25, row
        assert row["err_e6"] == int(
            abs(row["estimate"] - n) / n * 1e6 + 0.5
        )


def test_hll_rank_bitlength_exact(spark):
    # rank must equal 53 - floor(log2(w)) for w > 0 (bin() length),
    # pinned against Python's bit_length on the same md5 hashes
    import hashlib

    from spark_extensions_spark.operators.sketches import (
        _HLL_M,
        _HLL_WBITS,
        hll_register_table,
    )

    keys = [str(i) for i in range(2000)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        r["bucket"]: r["max_rank"]
        for r in hll_register_table(df, "k").collect()
    }
    regs: dict[int, int] = {}
    for k in keys:
        h = int(hashlib.md5(k.encode()).hexdigest()[:15], 16)
        b, w = h % _HLL_M, h // _HLL_M
        rank = (_HLL_WBITS + 1) - w.bit_length() if w else _HLL_WBITS + 1
        regs[b] = max(regs.get(b, 0), rank)
    assert got == regs


def test_wilcoxon_matches_scipy_convention(spark):
    # hand case with ties and a zero: diffs [3, -1, 2, 2, 0, -5]
    # drop 0 -> |d| ranks: 1->rank1, 2,2->avg 2.5, 3->4, 5->5
    # W+ = ranks of positives = 1? no: d=3 (rank 4), d=2 (2.5), d=2
    # (2.5) -> W+ = 9.0 -> x2 = 18; n=5
    from pyspark.sql import Row

    from spark_extensions_spark.operators.stats import (
        wilcoxon_signed_rank,
    )

    df = spark.createDataFrame(
        [Row(d=3), Row(d=-1), Row(d=2), Row(d=2), Row(d=0), Row(d=-5)]
    )
    r = wilcoxon_signed_rank(df, "d").collect()[0]
    assert r["n_pairs"] == 5 and r["n_zero"] == 1
    assert r["w_plus_x2"] == 18
    assert r["w_minus_x2"] == 5 * 6 - 18  # = 12 -> W- = 6
    assert r["tie_term"] == 2**3 - 2  # one tie block of size 2


def test_wilcoxon_symmetry(spark):
    # negating every diff swaps W+ and W-
    from pyspark.sql import Row

    from spark_extensions_spark.operators.stats import (
        wilcoxon_signed_rank,
    )

    rows = [Row(d=v) for v in (7, -3, 12, -12, 5, 9, -2, 4)]
    a = wilcoxon_signed_rank(spark.createDataFrame(rows), "d").collect()[0]
    neg = [Row(d=-v.d) for v in rows]
    b = wilcoxon_signed_rank(spark.createDataFrame(neg), "d").collect()[0]
    assert a["w_plus_x2"] == b["w_minus_x2"]
    assert a["w_minus_x2"] == b["w_plus_x2"]
    assert abs(a["z"] + b["z"]) < 1e-12


def test_ring_negatives_properties(spark):
    from pyspark.sql import functions as F

    from spark_extensions_spark.operators.sampling import ring_negatives

    df = spark.range(100).selectExpr("id AS k")
    out = ring_negatives(df, "k", k=4).collect()
    assert len(out) == 400  # k per anchor
    per_anchor: dict[int, set] = {}
    for r in out:
        assert r["k"] != r["neg_k"]  # never self
        per_anchor.setdefault(r["k"], set()).add(r["neg_k"])
    assert all(len(v) == 4 for v in per_anchor.values())  # distinct
    # reproducible under repartitioning
    out2 = ring_negatives(df.repartition(7), "k", k=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_ring_negatives_tiny_input_excludes_self(spark):
    from spark_extensions_spark.operators.sampling import ring_negatives

    df = spark.range(3).selectExpr("id AS k")  # N <= k: stride is 0
    out = ring_negatives(df, "k", k=4).collect()
    assert all(r["k"] != r["neg_k"] for r in out)


def test_weighted_percentile_hand_case(spark, sf_dir):
    # independent recomputation in Python from the raw table
    import math

    from spark_extensions_spark.queries48 import (
        _WP_PCTS,
        q_agg_weighted_percentile,
    )

    rows = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_extendedprice", "l_quantity"
    ).collect()
    agg: dict[int, int] = {}
    for r in rows:
        v = math.floor(r["l_extendedprice"] * 100 + 0.5)
        agg[v] = agg.get(v, 0) + int(r["l_quantity"])
    tw = sum(agg.values())
    got = {
        r["pct"]: r["price_cents"]
        for r in q_agg_weighted_percentile(spark, sf_dir).collect()
    }
    for p in _WP_PCTS:
        cw = 0
        want = None
        for v in sorted(agg):
            cw += agg[v]
            if cw * 100 >= p * tw:
                want = v
                break
        assert got[p] == want, (p, got[p], want)


def test_backtest_snaive_shared_eval_days(spark, sf_dir):
    from spark_extensions_spark.queries48 import q_ts_backtest_snaive

    rows = {r["model"]: r for r in q_ts_backtest_snaive(spark, sf_dir).collect()}
    assert set(rows) == {"naive1", "snaive7"}
    # both models score over the SAME days by construction
    assert rows["naive1"]["n_days"] == rows["snaive7"]["n_days"] > 0
    for r in rows.values():
        assert r["mae_cents"] == int(
            r["sum_abs_err_cents"] / r["n_days"] + 0.5
        )


def test_bpe_pair_stats_top_row_is_first_merge(spark, sf_dir):
    from spark_extensions_spark.functions.tokenizer import (
        bpe_train,
        word_frequencies,
    )
    from spark_extensions_spark.queries48 import (
        q_tokenizer_bpe_pair_stats,
    )

    top = q_tokenizer_bpe_pair_stats(spark, sf_dir).collect()[0]
    wf = [
        (r["word"], r["freq"])
        for r in word_frequencies(
            spark.read.parquet(f"{sf_dir}/documents.parquet"), "text"
        ).collect()
    ]
    first_merge = bpe_train(wf, num_merges=1)[0]
    assert top["pair"] == f"{first_merge[0]}|{first_merge[1]}"


def test_krippendorff_reference_implementation(spark):
    # small hand dataset with a missing rating (unit d has 2 raters),
    # verified against the straight textbook computation
    from pyspark.sql import Row

    from spark_extensions_spark.operators.evals import (
        krippendorff_alpha_nominal,
    )

    data = {
        "a": [1, 1, 1],
        "b": [1, 2, 2],
        "c": [0, 0, 0],
        "d": [2, 2],
        "e": [0],  # dropped: single rating
    }
    rows = [
        Row(unit=u, label=v) for u, vals in data.items() for v in vals
    ]
    out = krippendorff_alpha_nominal(
        spark.createDataFrame(rows), "unit", "label"
    ).collect()[0]
    # reference: coincidence-matrix formulation
    import itertools
    from collections import Counter

    units = {u: v for u, v in data.items() if len(v) > 1}
    do = 0.0
    n = 0
    lab = Counter()
    for vals in units.values():
        m = len(vals)
        n += m
        lab.update(vals)
        disagree = sum(
            1
            for x, y in itertools.permutations(range(m), 2)
            if vals[x] != vals[y]
        )
        do += disagree / (m - 1)
    de = (
        sum(
            lab[c] * lab[k]
            for c in lab
            for k in lab
            if c != k
        )
        / (n - 1)
    )
    alpha = 1 - do / de
    assert out["n_units"] == len(units) and out["n_ratings"] == n
    got_alpha = 1 - (
        out["do_scaled"] * (out["n_ratings"] - 1)
    ) / (out["scale_l"] * out["de_num"])
    assert abs(got_alpha - alpha) < 1e-12
    assert out["alpha_e6"] == int(alpha * 1e6 + 0.5)


def test_krippendorff_perfect_agreement(spark):
    from pyspark.sql import Row

    from spark_extensions_spark.operators.evals import (
        krippendorff_alpha_nominal,
    )

    rows = [
        Row(unit=u, label=u % 3) for u in range(30) for _ in range(3)
    ]
    out = krippendorff_alpha_nominal(
        spark.createDataFrame(rows), "unit", "label"
    ).collect()[0]
    assert out["do_scaled"] == 0 and out["alpha_e6"] == 1_000_000


def test_runs_test_hand_sequence(spark, sf_dir):
    # direct check of the run-counting logic on the registered shape:
    # recompute from the raw day series
    from spark_extensions_spark.queries49 import q_stat_runs_test

    out = q_stat_runs_test(spark, sf_dir).collect()[0]
    day = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .selectExpr(
            "date_trunc('day', o_orderdate) AS d",
            "cast(floor(o_totalprice * 100 + 0.5d) as bigint) AS c",
        )
        .groupBy("d")
        .sum("c")
        .collect()
    )
    series = [r["sum(c)"] for r in sorted(day, key=lambda r: r["d"])]
    m = sorted(series)[(len(series) + 1) // 2 - 1]
    flags = [v > m for v in series]
    runs = 1 + sum(
        1 for i in range(1, len(flags)) if flags[i] != flags[i - 1]
    )
    assert out["n1"] == sum(flags)
    assert out["n2"] == len(flags) - sum(flags)
    assert out["n_runs"] == runs


def test_theil_sen_is_median_of_slopes(spark, sf_dir):
    from spark_extensions_spark.queries49 import q_ts_theil_sen

    out = q_ts_theil_sen(spark, sf_dir).collect()[0]
    day = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .selectExpr(
            "cast(datediff(date_trunc('day', o_orderdate),"
            " date'1992-01-01') as bigint) AS d",
            "cast(floor(o_totalprice * 100 + 0.5d) as bigint) AS y",
        )
        .groupBy("d")
        .sum("y")
        .collect()
    )
    pts = sorted((r["d"], r["sum(y)"]) for r in day)
    slopes = sorted(
        (
            (pts[j][1] - pts[i][1]) / (pts[j][0] - pts[i][0]),
            pts[j][1] - pts[i][1],
            pts[j][0] - pts[i][0],
        )
        for i in range(len(pts))
        for j in range(i + 1, len(pts))
    )
    assert out["n_pairs"] == len(slopes)
    med = slopes[(len(slopes) + 1) // 2 - 1]
    assert (out["med_dy"], out["med_dx"]) == (med[1], med[2])


def test_jsd_symmetric_bounded(spark, sf_dir):
    import math

    from spark_extensions_spark.queries49 import q_stat_jsd_langs

    rows = q_stat_jsd_langs(spark, sf_dir).collect()
    assert len(rows) == 10  # C(5,2) language pairs
    for r in rows:
        assert r["lang_a"] < r["lang_b"]
        assert 0 <= r["jsd_e12"] <= int(math.log(2) * 1e12) + len(rows)


def test_friedman_against_scipy_formula(spark):
    # no-ties hand dataset: 3 blocks x 3 treatments, textbook formula
    # chi2 = 12/(n k (k+1)) * sum Rj^2 - 3 n (k+1)
    import itertools

    from pyspark.sql import Row

    # block values: treatment c always biggest, a always smallest
    data = {  # block -> {treatment: value}
        1: {"a": 10, "b": 20, "c": 30},
        2: {"a": 11, "b": 22, "c": 33},
        3: {"a": 5, "b": 25, "c": 26},
    }
    rows = [
        Row(m=b, p=t, v=v)
        for b, tv in data.items()
        for t, v in tv.items()
    ]
    df = spark.createDataFrame(rows)
    # rebuild the registered query's tail on this frame
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    ties = df.groupBy("m", "v").agg(F.count(F.lit(1)).alias("t"))
    wm = Window.partitionBy("m").orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = ties.select(
        "m", "v", "t",
        F.coalesce(F.sum("t").over(wm), F.lit(0)).alias("cum_prev"),
    )
    ranked = df.join(cum, ["m", "v"]).select(
        "p", (2 * F.col("cum_prev") + F.col("t") + 1).alias("d")
    )
    dj = {
        r["p"]: r["sum(d)"]
        for r in ranked.groupBy("p").sum("d").collect()
    }
    n, k = 3, 3
    sum_rj2 = sum((v / 2) ** 2 for v in dj.values())
    chi2_ref = 12.0 / (n * k * (k + 1)) * sum_rj2 - 3 * n * (k + 1)
    # the query's tie-corrected form must equal the textbook value
    # when there are no ties
    sum_dj2 = sum(v * v for v in dj.values())
    sum_d2 = sum(
        r["d"] ** 2 for r in ranked.collect()
    )
    num4 = sum_dj2 - n * n * k * (k + 1) * (k + 1)
    den4 = sum_d2 - n * k * (k + 1) * (k + 1)
    chi2 = (k - 1) * num4 / den4
    assert abs(chi2 - chi2_ref) < 1e-12
    # perfect consistency (c > b > a in every block) maximizes chi2
    # at n(k-1) = 6
    assert abs(chi2 - (n * (k - 1))) < 1e-12


def test_krippendorff_single_label_degenerate(spark):
    from pyspark.sql import Row

    from spark_extensions_spark.operators.evals import (
        krippendorff_alpha_nominal,
    )

    rows = [Row(unit=u, label=7) for u in range(10) for _ in range(3)]
    out = krippendorff_alpha_nominal(
        spark.createDataFrame(rows), "unit", "label"
    ).collect()[0]
    assert out["de_num"] == 0 and out["alpha_e6"] == 1_000_000
