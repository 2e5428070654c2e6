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
    a = day.select(F.col("d").alias("da"), F.col("y").alias("ya"))
    b = day.select(F.col("d").alias("db"), F.col("y").alias("yb"))
    pairs = a.join(b, F.col("da") < F.col("db")).select(
        (F.col("yb") - F.col("ya")).alias("dy"),
        (F.col("db") - F.col("da")).alias("dx"),
    )
    # bounded input: days² pairs (domain-sized — see doc)
    wr = Window.orderBy(
        F.expr("cast(dy as double) / dx"), F.col("dy"), F.col("dx")
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = pairs.select(
        "dy",
        "dx",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("np"),
    )
    return ranked.where(F.expr("rn = (np + 1) div 2")).select(
        F.col("np").cast("bigint").alias("n_pairs"),
        F.col("dy").alias("med_dy"),
        F.col("dx").alias("med_dx"),
        F.expr(
            "cast(floor(cast(dy as double) / dx * 1e6 + 0.5d) as bigint)"
        ).alias("slope_e6_cents_per_day"),
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
