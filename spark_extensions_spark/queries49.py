"""t2 query registry, batch 49: randomness testing, robust trend,
distribution divergence.

Registered into the shared registry (imported from queries48 at module
end). Same determinism rules as the queries.py docstring.

- ``stat_runs_test``: Wald–Wolfowitz runs test on the daily revenue
  series — is the sequence of above/below-median days random?
- ``ts_theil_sen``: Theil–Sen robust trend (median of pairwise
  slopes) over the daily series — the outlier-immune regression
  slope, exact fraction selection on the domain-sized pair set.
- ``stat_jsd_langs``: Jensen–Shannon divergence matrix between the
  languages' character distributions — the bounded symmetric
  drift/similarity metric (PSI's better-behaved cousin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_extensions_spark.queries import _register, _t

# ------------------------------------------------------------------
# stat_runs_test
# ------------------------------------------------------------------

# 2e0/1e0 literals: Spark parses a bare `2.0` as DECIMAL(2,1) and its
# decimal division rounds to 6 fractional digits, silently diverging
# from DuckDB's double (the NOTES plain-decimal-literal hazard);
# e-notation is DOUBLE in both engines.
_RT_Z = (
    "(CAST(n_runs AS DOUBLE) - (2e0 * n1 * n2 / (n1 + n2) + 1e0)) / "
    "sqrt(2e0 * n1 * n2 * (2e0 * n1 * n2 - n1 - n2) "
    "/ ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1e0)))"
)


@_register(
    "stat_runs_test",
    f"""
    WITH rt_day AS (
      SELECT time_bucket(INTERVAL '1 day', o_orderdate) AS d,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    rt_med AS (
      -- LOWER median (no interpolation): exact integer, tie-free
      SELECT cents AS m FROM (
        SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rn,
               COUNT(*) OVER () AS n
        FROM rt_day
      ) WHERE rn = (n + 1) // 2
    ),
    rt_flags AS (
      SELECT d, (cents > (SELECT m FROM rt_med)) AS above FROM rt_day
    ),
    rt_runs AS (
      SELECT above,
             CASE WHEN LAG(above) OVER (ORDER BY d) IS DISTINCT FROM
                  above THEN 1 ELSE 0 END AS new_run
      FROM rt_flags
    ),
    rt_agg AS (
      SELECT CAST(SUM(CASE WHEN above THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(SUM(CASE WHEN above THEN 0 ELSE 1 END) AS BIGINT)
               AS n2,
             CAST(SUM(new_run) AS BIGINT) AS n_runs
      FROM rt_runs
    )
    SELECT n1, n2, n_runs, {_RT_Z} AS z FROM rt_agg
    """,
    doc="Wald–Wolfowitz runs test on the daily-revenue sequence: are "
    "above/below-median days randomly ordered, or does the series "
    "cluster (autocorrelation the parametric tests assume away)? "
    "Dichotomization uses the LOWER median (exact integer, ties go "
    "below — no interpolation seam); the run count is one lag window "
    "over the DOMAIN-sized day series; z is the shared-formula double "
    "from exact BIGINTs. One corpus scan.",
)
def q_stat_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    day = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("d")
    ).agg(
        F.sum(F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)"))
        .cast("bigint")
        .alias("cents")
    )
    # bounded input: the day series (date domain) — every window below
    # runs over |days| rows at any corpus size
    wv = Window.orderBy("cents")
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    med = (
        day.select(
            "cents",
            F.row_number().over(wv).alias("rn"),
            F.count(F.lit(1)).over(wall).alias("n"),
        )
        .where(F.expr("rn = (n + 1) div 2"))
        .select(F.col("cents").alias("m"))
    )
    flags = day.crossJoin(F.broadcast(med)).select(
        "d", (F.col("cents") > F.col("m")).alias("above")
    )
    wd = Window.orderBy("d")
    runs = flags.select(
        "above",
        F.when(
            ~F.lag("above").over(wd).eqNullSafe(F.col("above")), 1
        )
        .otherwise(0)
        .alias("new_run"),
    )
    agg = runs.agg(
        F.sum(F.when(F.col("above"), 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("above"), 0).otherwise(1))
        .cast("bigint")
        .alias("n2"),
        F.sum("new_run").cast("bigint").alias("n_runs"),
    )
    return agg.select("n1", "n2", "n_runs", F.expr(_RT_Z).alias("z"))


# ------------------------------------------------------------------
# ts_theil_sen
# ------------------------------------------------------------------


@_register(
    "ts_theil_sen",
    """
    WITH tts_day AS (
      SELECT CAST(date_diff('day', TIMESTAMP '1992-01-01',
                  time_bucket(INTERVAL '1 day', o_orderdate))
                  AS BIGINT) AS d,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    tts_pairs AS (
      SELECT b.y - a.y AS dy, b.d - a.d AS dx
      FROM tts_day a JOIN tts_day b ON a.d < b.d
    ),
    tts_ranked AS (
      SELECT dy, dx,
             ROW_NUMBER() OVER (
               ORDER BY CAST(dy AS DOUBLE) / dx, dy, dx) AS rn,
             COUNT(*) OVER () AS np
      FROM tts_pairs
    )
    SELECT CAST(np AS BIGINT) AS n_pairs,
           dy AS med_dy, dx AS med_dx,
           CAST(FLOOR(CAST(dy AS DOUBLE) / dx * 1e6 + 0.5)
                AS BIGINT) AS slope_e6_cents_per_day
    FROM tts_ranked WHERE rn = (np + 1) // 2
    """,
    doc="Theil–Sen robust trend of daily revenue (median of all "
    "pairwise slopes; Sen 1968): immune to the outlier days that pull "
    "an OLS slope — the estimator monitoring pipelines want. The pair "
    "set is DOMAIN-sized (days², independent of corpus row count; "
    "grows with the time span only — document the quadratic when "
    "spans reach decades); the lower-median slope is selected by a "
    "total order (double slope, then the exact dy/dx fraction as "
    "tiebreak — both engines run the identical division). Emits the "
    "exact fraction AND the e6 slope.",
)
def q_ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    day = o.groupBy(
        F.expr(
            "cast(datediff(date_trunc('day', o_orderdate),"
            " date'1992-01-01') as bigint)"
        ).alias("d")
    ).agg(
        F.sum(F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)"))
        .cast("bigint")
        .alias("y")
    )
    # The d<d' pair expansion is a BroadcastNestedLoopJoin whose STREAM
    # side is the day aggregate's output — AQE coalesces that tiny
    # exchange to one partition, so the days²-row expansion ran as a
    # single 5.6 s task (profile_sweep, sf0.1). Widen the stream side
    # to core count (trivial bytes) and pin the build side broadcast:
    # the quadratic blowup then spreads across every core.
    width0 = spark.sparkContext.defaultParallelism
    a = day.repartition(width0).select(
        F.col("d").alias("da"), F.col("y").alias("ya")
    )
    b = day.select(F.col("d").alias("db"), F.col("y").alias("yb"))
    pairs = a.join(F.broadcast(b), F.col("da") < F.col("db")).select(
        (F.col("yb") - F.col("ya")).alias("dy"),
        (F.col("db") - F.col("da")).alias("dx"),
    )
    # Distributed exact k-th selection (was: row_number + count over a
    # GLOBAL window — Exchange SinglePartition + a one-task sort of all
    # days² pairs, measured 3.6 s single-task at sf0.1). The pair count
    # is determined by the day count alone (np = C(nd, 2) — the a.d<b.d
    # self-join emits each unordered day pair exactly once), so the
    # count-over-all window is a driver-side integer; the median is
    # then picked by range-partitioning on the full sort key,
    # cumulating per-partition counts (a P-row collect), and running
    # row_number only INSIDE the one partition that holds global rank
    # k. Every heavy step — the pair join, the range sort, the target
    # partition's local sort — is parallel; ties are safe because
    # RangePartitioner sends identical keys to one partition and tied
    # rows are identical in every output column. Same selection, same
    # oracle, no single-partition exchange.
    spark = day.sparkSession
    nd = day.count()
    np_ = nd * (nd - 1) // 2
    if np_ == 0:
        return spark.createDataFrame(
            [],
            "n_pairs bigint, med_dy bigint, med_dx bigint, "
            "slope_e6_cents_per_day bigint",
        )
    k = (np_ + 1) // 2
    width = spark.sparkContext.defaultParallelism
    ranged = (
        pairs.withColumn("sl", F.expr("cast(dy as double) / dx"))
        .repartitionByRange(width, "sl", "dy", "dx")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    cnts = dict(
        (r["pid"], r["n"])
        for r in ranged.groupBy("pid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    running = 0
    target_pid, local_rank = None, None
    for pid in sorted(cnts):
        if running + cnts[pid] >= k:
            target_pid, local_rank = pid, k - running
            break
        running += cnts[pid]
    wloc = Window.partitionBy("pid").orderBy("sl", F.col("dy"), F.col("dx"))
    return (
        ranged.where(F.col("pid") == target_pid)
        .withColumn("rn", F.row_number().over(wloc))
        .where(F.col("rn") == local_rank)
        .select(
            F.lit(np_).cast("bigint").alias("n_pairs"),
            F.col("dy").alias("med_dy"),
            F.col("dx").alias("med_dx"),
            F.expr(
                "cast(floor(cast(dy as double) / dx * 1e6 + 0.5d) as bigint)"
            ).alias("slope_e6_cents_per_day"),
        )
    )


# ------------------------------------------------------------------
# stat_jsd_langs
# ------------------------------------------------------------------

_JSD_TERM = (
    "CASE WHEN {p} = 0 THEN 0 ELSE "
    "CAST(FLOOR(0.5 * {p} * ln({p} / ((({p}) + ({q})) / 2.0))"
    " * 1e12 + 0.5) AS BIGINT) END"
)


def _jsd_oracle() -> str:
    p = "(CAST(ca AS DOUBLE) / ta)"
    q = "(CAST(cb AS DOUBLE) / tb)"
    t1 = _JSD_TERM.format(p=p, q=q)
    t2 = _JSD_TERM.format(p=q, q=p)
    return f"""
    WITH jsd_chars AS (
      SELECT lang, unnest(string_split_regex(
               regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), ''))
               AS ch
      FROM documents
    ),
    jsd_cnt AS (
      SELECT lang, ch, COUNT(*) AS c FROM jsd_chars
      WHERE ch <> '' GROUP BY 1, 2
    ),
    jsd_tot AS (SELECT lang, SUM(c) AS t FROM jsd_cnt GROUP BY 1),
    jsd_grid AS (
      SELECT a.lang AS lang_a, b.lang AS lang_b, ch.ch,
             COALESCE(ca.c, 0) AS ca, COALESCE(cb.c, 0) AS cb,
             a.t AS ta, b.t AS tb
      FROM jsd_tot a
      JOIN jsd_tot b ON a.lang < b.lang
      CROSS JOIN (SELECT DISTINCT ch FROM jsd_cnt) ch
      LEFT JOIN jsd_cnt ca ON ca.lang = a.lang AND ca.ch = ch.ch
      LEFT JOIN jsd_cnt cb ON cb.lang = b.lang AND cb.ch = ch.ch
    )
    SELECT lang_a, lang_b,
           CAST(SUM({t1} + {t2}) AS BIGINT) AS jsd_e12
    FROM jsd_grid GROUP BY 1, 2
    """


@_register(
    "stat_jsd_langs",
    _jsd_oracle(),
    doc="Jensen–Shannon divergence matrix between the languages' "
    "character distributions — the BOUNDED (≤ ln 2), symmetric, "
    "zero-safe drift metric (PSI blows up on empty buckets; KL is "
    "asymmetric). Char counts are one hash aggregate; the pair×char "
    "grid is DOMAIN-sized (langs² × alphabet) so every ln() touches "
    "a handful of rows; each term is e12-quantized BEFORE the exact "
    "cross-char sum (the stat_psi recipe). Zero-probability chars "
    "contribute exactly 0 by the JSD definition (p·ln(p/m) → 0).",
)
def q_stat_jsd_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    chars = docs.select(
        "lang",
        F.explode(
            F.split(
                F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]", ""),
                "",
            )
        ).alias("ch"),
    ).where(F.col("ch") != "")
    cnt = chars.groupBy("lang", "ch").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tot = cnt.groupBy("lang").agg(F.sum("c").alias("t"))
    a = tot.select(
        F.col("lang").alias("lang_a"), F.col("t").alias("ta")
    )
    b = tot.select(
        F.col("lang").alias("lang_b"), F.col("t").alias("tb")
    )
    chs = cnt.select("ch").distinct()
    grid = (
        a.join(b, F.col("lang_a") < F.col("lang_b"))
        .crossJoin(F.broadcast(chs))
        .join(
            cnt.select(
                F.col("lang").alias("lang_a"),
                F.col("ch").alias("ch"),
                F.col("c").alias("ca"),
            ),
            ["lang_a", "ch"],
            "left",
        )
        .join(
            cnt.select(
                F.col("lang").alias("lang_b"),
                F.col("ch").alias("ch"),
                F.col("c").alias("cb"),
            ),
            ["lang_b", "ch"],
            "left",
        )
        .select(
            "lang_a",
            "lang_b",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
            "ta",
            "tb",
        )
    )
    p = "(cast(ca as double) / ta)"
    q = "(cast(cb as double) / tb)"
    t1 = _JSD_TERM.format(p=p, q=q)
    t2 = _JSD_TERM.format(p=q, q=p)
    return grid.groupBy("lang_a", "lang_b").agg(
        F.sum(F.expr(f"{t1} + {t2}")).cast("bigint").alias("jsd_e12")
    )


# ------------------------------------------------------------------
# privacy_dp_laplace — the Laplace mechanism, seeded test mode
# ------------------------------------------------------------------

_DP_EPS = 0.5  # epsilon; sensitivity 1 (unit count contribution)


@_register(
    "privacy_dp_laplace",
    f"""
    WITH dp_counts AS (
      SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n
      FROM customer GROUP BY 1
    ),
    dp_noise AS (
      SELECT c_nationkey, n,
             (('0x' || substr(md5(CAST(c_nationkey AS VARCHAR)
                || ':dplap'), 1, 15))::BIGINT)
               / CAST(1152921504606846976 AS DOUBLE) - 0.5 AS u
      FROM dp_counts
    )
    SELECT c_nationkey, n,
           CAST(FLOOR((n - (1e0 / {_DP_EPS!r})
                * CASE WHEN u >= 0 THEN 1e0 ELSE -1e0 END
                * ln(1e0 - 2e0 * abs(u))) * 1e6 + 0.5)
                AS BIGINT) AS noisy_n_e6
    FROM dp_noise
    """,
    doc="The Laplace mechanism of differential privacy (Dwork et al. "
    "2006) in SEEDED TEST MODE: per-nation customer counts plus "
    "Laplace(sensitivity/ε) noise drawn by inverse CDF from an "
    "md5-derived uniform — the mechanism SHAPE (sensitivity-1 count "
    "query, ε=0.5, sign·ln transform) exactly as a production DP job "
    "runs it, with the noise seeded so the release is reproducible "
    "and hash-verifiable. A REAL release must draw the noise from a "
    "secret entropy source — seeded noise provides NO privacy; this "
    "is the pipeline-plumbing test harness (documented, like the "
    "multimodal codec fakes). Row-local ln over the domain-sized "
    "group table; one hash aggregate over the corpus.",
)
def q_privacy_dp_laplace(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")["customer"]
    counts = c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    u = (
        "cast(conv(substring(md5(cast(c_nationkey as string)"
        " || ':dplap'), 1, 15), 16, 10) as bigint)"
        " / cast(1152921504606846976 as double) - 0.5d"
    )
    noisy = (
        f"cast(floor((n - (1e0 / {_DP_EPS!r})"
        " * case when __u >= 0 then 1e0 else -1e0 end"
        " * ln(1e0 - 2e0 * abs(__u))) * 1e6 + 0.5d) as bigint)"
    )
    return (
        counts.withColumn("__u", F.expr(u))
        .select(
            "c_nationkey",
            "n",
            F.expr(noisy).alias("noisy_n_e6"),
        )
    )


# ------------------------------------------------------------------
# stat_friedman — k related samples over blocks
# ------------------------------------------------------------------

_FR_K = 5  # order priorities (treatments)


@_register(
    "stat_friedman",
    f"""
    WITH fr_cells AS (
      SELECT EXTRACT(month FROM o_orderdate) AS m, o_orderpriority AS p,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS v
      FROM orders GROUP BY 1, 2
    ),
    fr_ties AS (
      SELECT m, v, COUNT(*) AS t FROM fr_cells GROUP BY 1, 2
    ),
    fr_cum AS (
      SELECT m, v, t,
             COALESCE(SUM(t) OVER (PARTITION BY m ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_prev
      FROM fr_ties
    ),
    fr_ranked AS (
      SELECT c.m, c.p, 2 * u.cum_prev + u.t + 1 AS d
      FROM fr_cells c JOIN fr_cum u ON u.m = c.m AND u.v = c.v
    ),
    fr_treat AS (
      SELECT p, SUM(d) AS dj FROM fr_ranked GROUP BY p
    ),
    fr_agg AS (
      SELECT (SELECT CAST(COUNT(DISTINCT m) AS BIGINT) FROM fr_cells)
               AS n_blocks,
             (SELECT CAST(SUM(dj * dj) AS BIGINT) FROM fr_treat)
               AS sum_dj2,
             (SELECT CAST(SUM(d * d) AS BIGINT) FROM fr_ranked)
               AS sum_d2
    )
    SELECT n_blocks, CAST({_FR_K} AS BIGINT) AS k, sum_dj2, sum_d2,
           CAST(sum_dj2 - n_blocks * n_blocks * {_FR_K}
                * ({_FR_K} + 1) * ({_FR_K} + 1) AS BIGINT) AS num4,
           CAST(sum_d2 - n_blocks * {_FR_K}
                * ({_FR_K} + 1) * ({_FR_K} + 1) AS BIGINT) AS den4,
           CAST(FLOOR(({_FR_K} - 1e0)
                * (sum_dj2 - n_blocks * n_blocks * {_FR_K}
                   * ({_FR_K} + 1) * ({_FR_K} + 1))
                / (sum_d2 - n_blocks * {_FR_K}
                   * ({_FR_K} + 1) * ({_FR_K} + 1))
                * 1e6 + 0.5) AS BIGINT) AS chi2_e6
    FROM fr_agg
    """,
    doc="Friedman test for k related samples (Friedman 1937, "
    "tie-corrected form): do the five order priorities rank "
    "consistently across month blocks, or is the monthly revenue "
    "ranking random? Within-block average ranks carried DOUBLED (the "
    "mannwhitney cumulative idiom) so rank sums, ΣR², and the tie "
    "correction are exact BIGINTs — χ² = (k−1)·(4ΣRj² − n²k(k+1)²) / "
    "(4Σr² − nk(k+1)²) is one double division of exact integers, "
    "e6-quantized. One hash aggregate over the corpus; everything "
    "after runs on the 12×5 block-treatment grid.",
)
def q_stat_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    cells = o.groupBy(
        F.month("o_orderdate").alias("m"),
        F.col("o_orderpriority").alias("p"),
    ).agg(
        F.sum(F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)"))
        .cast("bigint")
        .alias("v")
    )
    ties = cells.groupBy("m", "v").agg(F.count(F.lit(1)).alias("t"))
    wm = Window.partitionBy("m").orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = ties.select(
        "m",
        "v",
        "t",
        F.coalesce(F.sum("t").over(wm), F.lit(0)).alias("cum_prev"),
    )
    ranked = cells.join(cum, ["m", "v"]).select(
        "m", "p", (2 * F.col("cum_prev") + F.col("t") + 1).alias("d")
    )
    treat = ranked.groupBy("p").agg(F.sum("d").alias("dj"))
    agg = (
        cells.agg(F.countDistinct("m").cast("bigint").alias("n_blocks"))
        .crossJoin(
            treat.agg(
                F.sum(F.expr("dj * dj")).cast("bigint").alias("sum_dj2")
            )
        )
        .crossJoin(
            ranked.agg(
                F.sum(F.expr("d * d")).cast("bigint").alias("sum_d2")
            )
        )
    )
    k = _FR_K
    return agg.select(
        "n_blocks",
        F.lit(k).cast("bigint").alias("k"),
        "sum_dj2",
        "sum_d2",
        F.expr(
            f"cast(sum_dj2 - n_blocks * n_blocks * {k}"
            f" * ({k} + 1) * ({k} + 1) as bigint)"
        ).alias("num4"),
        F.expr(
            f"cast(sum_d2 - n_blocks * {k}"
            f" * ({k} + 1) * ({k} + 1) as bigint)"
        ).alias("den4"),
        F.expr(
            f"cast(floor(({k} - 1e0)"
            f" * (sum_dj2 - n_blocks * n_blocks * {k}"
            f"    * ({k} + 1) * ({k} + 1))"
            f" / (sum_d2 - n_blocks * {k} * ({k} + 1) * ({k} + 1))"
            " * 1e6 + 0.5d) as bigint)"
        ).alias("chi2_e6"),
    )


# ------------------------------------------------------------------
# ts_rolling_median — robust rolling smoother
# ------------------------------------------------------------------


@_register(
    "ts_rolling_median",
    """
    WITH rm_day AS (
      SELECT time_bucket(INTERVAL '1 day', o_orderdate) AS d,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1
    )
    SELECT d, cents,
           CAST(2 * quantile_cont(cents, 0.5) OVER (
             ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
             AS BIGINT) AS med7_x2
    FROM rm_day
    """,
    doc="7-day rolling MEDIAN of daily revenue — the robust smoother "
    "(one outlier day cannot move it, unlike the rolling mean in "
    "ts_ewma/ts_resample). Spark's percentile == DuckDB's "
    "quantile_cont over the identical 7-row frame (the "
    "agg_percentile_exact interpolation-parity result, reused as a "
    "WINDOW aggregate); the median of an odd/even cents window is "
    "integer or half-integer, so ×2 emits an exact BIGINT — no "
    "float surface at all. One hash aggregate to the day series + "
    "one domain-sized ordered window.",
)
def q_ts_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    day = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("d")
    ).agg(
        F.sum(F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)"))
        .cast("bigint")
        .alias("cents")
    )
    # bounded input: the day series (date domain)
    w = Window.orderBy("d").rowsBetween(-6, 0)
    return day.select(
        "d",
        "cents",
        (2 * F.expr("percentile(cents, 0.5d)").over(w))
        .cast("bigint")
        .alias("med7_x2"),
    )


# ------------------------------------------------------------------
# analytic_abc_classification — Pareto inventory classes
# ------------------------------------------------------------------


@_register(
    "analytic_abc_classification",
    """
    WITH abc_rev AS (
      SELECT l_partkey,
             CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5)
                  AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem GROUP BY 1
    ),
    abc_cum AS (
      SELECT l_partkey, cents,
             SUM(cents) OVER (ORDER BY cents DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             SUM(cents) OVER () AS tot
      FROM abc_rev
    ),
    abc_cls AS (
      SELECT CASE WHEN cum * 10 <= tot * 7 THEN 'A'
                  WHEN cum * 10 <= tot * 9 THEN 'B'
                  ELSE 'C' END AS cls,
             cents
      FROM abc_cum
    )
    SELECT cls, CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents
    FROM abc_cls GROUP BY cls
    """,
    doc="ABC (Pareto) classification of parts by cumulative revenue "
    "share: A = parts inside the first 70% of revenue, B to 90%, C "
    "the tail — the inventory-prioritization classic. Threshold "
    "compares are cross-multiplied (cum·10 ≤ tot·7) so NO division "
    "or float exists anywhere; the cumulative window runs over the "
    "part CATALOG (a dimension that grows with the product range, "
    "not the corpus — at catalog scale swap in the two-phase "
    "grouped_running_sum, bit-identical). Deterministic total order "
    "(revenue desc, part key).",
)
def q_analytic_abc_classification(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.expr("cast(floor(l_extendedprice * 100 + 0.5d) as bigint)")
        )
        .cast("bigint")
        .alias("cents")
    )
    # bounded input: part catalog (dimension-sized; see doc)
    wc = Window.orderBy(F.desc("cents"), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cls = rev.select(
        "cents",
        F.sum("cents").over(wc).alias("cum"),
        F.sum("cents").over(wall).alias("tot"),
    ).select(
        F.when(F.col("cum") * 10 <= F.col("tot") * 7, "A")
        .when(F.col("cum") * 10 <= F.col("tot") * 9, "B")
        .otherwise("C")
        .alias("cls"),
        "cents",
    )
    return cls.groupBy("cls").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum("cents").cast("bigint").alias("revenue_cents"),
    )


# ------------------------------------------------------------------
# eval_mcnemar — paired classifier comparison
# ------------------------------------------------------------------

# two rule "models" predicting a return, evaluated on the same rows:
# the McNemar discordant cells decide if B beats A on paired evidence
_MC_GOLD = "l_returnflag = 'R'"
_MC_PRED_A = "l_quantity >= 25"
_MC_PRED_B = "l_extendedprice >= 30000"


@_register(
    "eval_mcnemar",
    f"""
    WITH mc AS (
      SELECT (({_MC_PRED_A}) = ({_MC_GOLD})) AS a_ok,
             (({_MC_PRED_B}) = ({_MC_GOLD})) AS b_ok
      FROM lineitem
    ),
    mc_agg AS (
      SELECT CAST(COUNT(*) FILTER (a_ok AND NOT b_ok) AS BIGINT) AS b,
             CAST(COUNT(*) FILTER (b_ok AND NOT a_ok) AS BIGINT) AS c,
             CAST(COUNT(*) FILTER (a_ok AND b_ok) AS BIGINT)
               AS both_ok,
             CAST(COUNT(*) FILTER (NOT a_ok AND NOT b_ok) AS BIGINT)
               AS both_wrong
      FROM mc
    )
    SELECT b, c, both_ok, both_wrong,
           -- b + c = 0 (models agree on every row) carries no paired
           -- evidence: chi2 defined 0, not NaN (DuckDB refuses a
           -- NaN->BIGINT cast; Spark nulls — both wrong)
           CASE WHEN b + c = 0 THEN 0 ELSE
             CAST(FLOOR((b - c) * (b - c) / CAST(b + c AS DOUBLE)
                  * 1e6 + 0.5) AS BIGINT) END AS chi2_e6,
           CASE WHEN b + c = 0 THEN 0 ELSE
             CAST(FLOOR((abs(b - c) - 1e0) * (abs(b - c) - 1e0)
                  / CAST(b + c AS DOUBLE) * 1e6 + 0.5) AS BIGINT) END
             AS chi2_cc_e6
    FROM mc_agg
    """,
    doc="McNemar's test for PAIRED classifier comparison (McNemar "
    "1947) — the correct way to ask 'is model B better than A on the "
    "SAME eval set' (two independent accuracy CIs overlap exactly "
    "when the paired evidence is strongest): only the discordant "
    "cells b (A right, B wrong) and c (B right, A wrong) carry "
    "information; χ² = (b−c)²/(b+c), plus the Edwards continuity-"
    "corrected form. All four contingency cells are exact BIGINTs "
    "from ONE scan + one aggregate; the statistics are single double "
    "divisions e6-quantized.",
)
def q_eval_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    mc = li.select(
        F.expr(f"(({_MC_PRED_A}) = ({_MC_GOLD}))").alias("a_ok"),
        F.expr(f"(({_MC_PRED_B}) = ({_MC_GOLD}))").alias("b_ok"),
    )
    agg = mc.agg(
        F.count(F.when(F.col("a_ok") & ~F.col("b_ok"), 1))
        .cast("bigint")
        .alias("b"),
        F.count(F.when(F.col("b_ok") & ~F.col("a_ok"), 1))
        .cast("bigint")
        .alias("c"),
        F.count(F.when(F.col("a_ok") & F.col("b_ok"), 1))
        .cast("bigint")
        .alias("both_ok"),
        F.count(F.when(~F.col("a_ok") & ~F.col("b_ok"), 1))
        .cast("bigint")
        .alias("both_wrong"),
    )
    return agg.select(
        "b",
        "c",
        "both_ok",
        "both_wrong",
        F.expr(
            "case when b + c = 0 then 0 else"
            " cast(floor((b - c) * (b - c) / cast(b + c as double)"
            " * 1e6 + 0.5d) as bigint) end"
        ).alias("chi2_e6"),
        F.expr(
            "case when b + c = 0 then 0 else"
            " cast(floor((abs(b - c) - 1e0) * (abs(b - c) - 1e0)"
            " / cast(b + c as double) * 1e6 + 0.5d) as bigint) end"
        ).alias("chi2_cc_e6"),
    )

# batch 50 registers at import time, same chain as queries48 -> 49
from spark_extensions_spark import queries50  # noqa: E402,F401  (registration side effect)
