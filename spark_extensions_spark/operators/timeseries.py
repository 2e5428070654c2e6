"""Time-series regularization: per-key gap-filled grids + forward fill.

Event streams land irregularly; downstream feature pipelines want a
dense regular grid per key (one row per minute/hour, missing points
carried forward). The Spark-first shape: per-key ``sequence()`` between
the key's min and max bucket (row-local explode — the grid never
shuffles as raw rows), left-join the observed buckets, then one
``last(..., ignorenulls)`` window pass for the forward fill.

100 TB notes: the grid size is bounded by (span / step) per key, not by
the event count — explode happens after the per-key min/max aggregate,
so the join is grid × bucketed-events, both hash-partitioned on the
key. The forward-fill window shuffles once on the key; no driver state.

Reference scope note: the reference has no time-series surface — this
is part of the pipeline extension layer (SURVEY.md §7 M5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_grid(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "1 minute",
    trunc_unit: str = "minute",
) -> DataFrame:
    """Dense per-key time grid with forward-filled values.

    Buckets events to ``trunc_unit``, aggregates one value per bucket
    (``max`` — exact and order-free, unlike a double ``avg``), generates
    every bucket between each key's first and last event with
    ``sequence()``, and forward-fills missing buckets from the last
    observed one. Output: ``(key, bucket_ts, value, filled flag)``.
    """
    bucketed = (
        events.select(
            F.col(key_col),
            F.date_trunc(trunc_unit, F.col(ts_col)).alias("bucket_ts"),
            F.col(value_col).alias("__v"),
        )
        .groupBy(key_col, "bucket_ts")
        .agg(F.max("__v").alias("__v"))
    )
    spans = bucketed.groupBy(key_col).agg(
        F.min("bucket_ts").alias("__lo"), F.max("bucket_ts").alias("__hi")
    )
    grid = spans.select(
        key_col,
        F.explode(
            F.sequence(
                F.col("__lo"), F.col("__hi"), F.expr(f"interval {step}")
            )
        ).alias("bucket_ts"),
    )
    # eqNullSafe on the key: groupBy/Window treat NULL as a group, so a
    # NULL-key series exists in both grid and bucketed — a null-unsafe
    # using-column join would never re-match its values (the
    # sliding_count_distinct class bug, VERDICT r7 #7)
    b2 = bucketed.select(
        F.col(key_col).alias("__gf_k"),
        F.col("bucket_ts").alias("__gf_b"),
        "__v",
    )
    joined = grid.join(
        b2,
        F.col(key_col).eqNullSafe(F.col("__gf_k"))
        & (F.col("bucket_ts") == F.col("__gf_b")),
        "left",
    ).drop("__gf_k", "__gf_b")
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key_col,
        "bucket_ts",
        F.last("__v", ignorenulls=True).over(w).alias(value_col),
        F.col("__v").isNull().alias("filled"),
    )


# ---------------------------------------------------------------------
# Fixed-window EWMA (deterministic weighted sum over the last k lags)
# ---------------------------------------------------------------------


def ewma_exprs(value_sql: str, lag_fmt: str, alpha: float, k: int) -> str:
    """Shared EWMA formula over the last ``k`` observations.

    ``lag_fmt`` renders the i-th lag of ``value_sql`` in the host
    dialect (e.g. ``"lag({v}, {i}) OVER w"``).  Weights
    ``alpha*(1-alpha)^i`` are precomputed Python doubles injected as
    repr() literals, so BOTH engines parse the identical IEEE values;
    the numerator/denominator are FIXED-ORDER left-to-right sums —
    bit-exact across engines (NOTES.md determinism contract).
    Missing lags (series head) drop out of both sums via COALESCE/CASE.
    """
    num_terms, den_terms = [], []
    for i in range(k):
        w = repr(alpha * (1.0 - alpha) ** i)
        x_i = value_sql if i == 0 else lag_fmt.format(v=value_sql, i=i)
        num_terms.append(f"COALESCE({w} * ({x_i}), 0.0)")
        den_terms.append(
            f"(CASE WHEN ({x_i}) IS NULL THEN 0.0 ELSE {w} END)"
        )
    num = " + ".join(num_terms)
    den = " + ".join(den_terms)
    return f"(({num}) / ({den}))"


def ewma(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    alpha: float = 0.3,
    k: int = 8,
) -> DataFrame:
    """Per-key fixed-window EWMA (last ``k`` points, renormalized head).

    One shuffle (the per-key window); the k-lag weighted sum is
    row-local arithmetic over the frame — no UDF, no recursion, and
    the truncated-window form is what an incremental 100 TB pipeline
    recomputes per micro-batch anyway (the infinite-memory recursive
    EWMA needs per-key state, see streaming/stateful.py for that
    shape).  Total order inside a key: (ts, id) — collision-safe.
    """
    lag_fmt = (
        f"lag({{v}}, {{i}}) OVER (PARTITION BY {key_col} "
        f"ORDER BY {ts_col}, {id_col})"
    )
    expr = ewma_exprs(value_col, lag_fmt, alpha, k)
    # floor-based fixed-point rounding: same IEEE ops on both engines
    # (Spark's round() rescales exactly, DuckDB's in double — they can
    # disagree one ulp from a decimal boundary; floor cannot)
    q = f"floor(({expr}) * 1000000000.0d + 0.5d) / 1000000000.0d"
    return df.select(
        F.col(key_col),
        F.col(ts_col),
        F.col(value_col),
        F.expr(q).alias("ewma"),
    )


def ewma_oracle_sql(
    table: str,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    alpha: float = 0.3,
    k: int = 8,
) -> str:
    lag_fmt = (
        f"lag({{v}}, {{i}}) OVER (PARTITION BY {key_col} "
        f"ORDER BY {ts_col}, {id_col})"
    )
    expr = ewma_exprs(value_col, lag_fmt, alpha, k)
    return f"""
    SELECT {key_col}, {ts_col}, {value_col},
           FLOOR(({expr}) * 1e9 + 0.5) / 1e9 AS ewma
    FROM {table}
    """


# ---------------------------------------------------------------------
# Rolling z-score anomaly flags (exact integer-scaled window sums)
# ---------------------------------------------------------------------


def _z_formula() -> str:
    """z from exact scaled frame sums: xs, s=Σxs, q=Σxs², c=count.

    All inputs exact integers (value scaled ×100) so the shared double
    expression is engine-portable; sample variance over the PRECEDING
    frame only (the tested point is excluded from its own baseline).
    """
    # degenerate guard (operator fuzzer, round 8): a constant (or
    # single-point) preceding frame has zero sample variance — Spark 4
    # ANSI throws on the double division where DuckDB yields NULL.
    # NESTED case: the variance expression divides by c-1, so it may
    # only be evaluated once c > 1 holds (AND does not short-circuit
    # under vectorized evaluation). Shared text, both engines.
    var = (
        "((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) "
        "/ CAST(c AS DOUBLE)) / (CAST(c AS DOUBLE) - 1.0))"
    )
    return (
        "(CASE WHEN c > 1 THEN "
        f"CASE WHEN {var} > 0e0 THEN "
        "((CAST(xs AS DOUBLE) - CAST(s AS DOUBLE) / CAST(c AS DOUBLE))"
        f" / sqrt{var}) "
        "ELSE NULL END ELSE NULL END)"
    )


def rolling_zscore(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    k: int = 20,
    threshold: float = 3.0,
    scale: int = 100,
) -> DataFrame:
    """Per-key rolling z-score vs the previous ``k`` points.

    ONE shuffle (per-key window); sums of ``round(value*scale)`` and
    its square run in exact integer/decimal arithmetic over the
    ``k PRECEDING .. 1 PRECEDING`` frame, so the baseline is order-free.
    Rows with fewer than 3 prior points emit NULL z.  Output:
    (key, ts, value, z rounded to 9 dp, is_anomaly).
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(-k, -1)
    )
    xs = F.round(F.col(value_col) * scale).cast("bigint")
    xd = xs.cast("decimal(18,0)")
    base = df.select(
        F.col(key_col),
        F.col(ts_col),
        F.col(value_col),
        xs.alias("xs"),
        F.sum(xd).over(w).cast("bigint").alias("s"),
        F.sum(xd * xd).over(w).cast("bigint").alias("q"),
        F.count(xs).over(w).alias("c"),
    )
    zq = f"floor(({_z_formula()}) * 1000000000.0d + 0.5d) / 1000000000.0d"
    z = F.when(F.col("c") >= 3, F.expr(zq))
    return base.select(
        key_col,
        ts_col,
        value_col,
        z.alias("z"),
        F.when(F.col("c") >= 3, F.abs(F.expr(_z_formula())) > threshold)
        .alias("is_anomaly"),
    )


def zscore_oracle_sql(
    table: str,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    k: int = 20,
    threshold: float = 3.0,
    scale: int = 100,
) -> str:
    z = _z_formula()
    return f"""
    WITH base AS (
      SELECT {key_col}, {ts_col}, {value_col},
             CAST(ROUND({value_col} * {scale}) AS BIGINT) AS xs,
             CAST(SUM(CAST(ROUND({value_col} * {scale}) AS HUGEINT))
                  OVER w AS BIGINT) AS s,
             CAST(SUM(CAST(ROUND({value_col} * {scale}) AS HUGEINT)
                   * CAST(ROUND({value_col} * {scale}) AS HUGEINT))
                  OVER w AS BIGINT) AS q,
             COUNT(*) OVER w AS c
      FROM {table}
      WINDOW w AS (PARTITION BY {key_col} ORDER BY {ts_col}, {id_col}
                   ROWS BETWEEN {k} PRECEDING AND 1 PRECEDING)
    )
    SELECT {key_col}, {ts_col}, {value_col},
           CASE WHEN c >= 3
                THEN FLOOR(({z}) * 1e9 + 0.5) / 1e9
           END AS z,
           CASE WHEN c >= 3 THEN abs({z}) > {threshold} END AS is_anomaly
    FROM base
    """


# ---------------------------------------------------------------------
# OHLC downsampling (open/high/low/close per key × time bucket)
# ---------------------------------------------------------------------


def resample_ohlc(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    trunc_unit: str = "day",
) -> DataFrame:
    """Downsample to one OHLC row per key × bucket.

    open/close via ``min_by``/``max_by`` on the (ts, id) total order —
    one hash aggregate, one shuffle, values pass through untouched
    (no arithmetic → trivially engine-exact).
    """
    order = F.struct(F.col(ts_col), F.col(id_col))
    return (
        df.select(
            F.col(key_col),
            F.date_trunc(trunc_unit, F.col(ts_col)).alias("bucket_ts"),
            order.alias("__o"),
            F.col(value_col).alias("__v"),
        )
        .groupBy(key_col, "bucket_ts")
        .agg(
            F.min_by("__v", "__o").alias("open"),
            F.max("__v").alias("high"),
            F.min("__v").alias("low"),
            F.max_by("__v", "__o").alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def ohlc_oracle_sql(
    table: str,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    trunc_unit: str = "day",
) -> str:
    return f"""
    WITH o AS (
      SELECT {key_col},
             CAST(date_trunc('{trunc_unit}', {ts_col}) AS TIMESTAMP)
               AS bucket_ts,
             {value_col} AS v,
             row_number() OVER (
               PARTITION BY {key_col}, date_trunc('{trunc_unit}', {ts_col})
               ORDER BY {ts_col}, {id_col}) AS rn_a,
             row_number() OVER (
               PARTITION BY {key_col}, date_trunc('{trunc_unit}', {ts_col})
               ORDER BY {ts_col} DESC, {id_col} DESC) AS rn_d
      FROM {table}
    )
    SELECT {key_col}, bucket_ts,
           MAX(CASE WHEN rn_a = 1 THEN v END) AS open,
           MAX(v) AS high,
           MIN(v) AS low,
           MAX(CASE WHEN rn_d = 1 THEN v END) AS close,
           COUNT(*) AS n
    FROM o GROUP BY 1, 2
    """


# ---------------------------------------------------------------------
# Classical additive seasonal decomposition (exact integer form)
# ---------------------------------------------------------------------

def decompose_additive(
    daily: DataFrame,
    date_col: str,
    value_col: str,
    period: int = 7,
    anchor: str = "1992-01-01",
) -> DataFrame:
    """Classical additive decomposition value = trend + seasonal +
    residual of an INTEGER-valued regular series (one row per date),
    kept exact by carrying constant denominators instead of dividing:

    - ``trend_xP``: centered moving SUM over ``period`` consecutive
      observations (trend·P, an exact BIGINT; NULL at the edges where
      the window is short — emitted only when exactly P rows contribute).
    - ``pos``: season position = days-since-``anchor`` mod P (pure
      integer date arithmetic — portable, unlike dayofweek whose
      origin differs between engines).
    - ``seas_num/seas_den``: Σ(P·value − trend_xP) and its row count
      per position, over full-window rows — the seasonal index is
      seas_num/(P·seas_den), carried as an exact ratio.
    - ``resid_num``: (P·value − trend_xP)·seas_den − seas_num — the
      residual times the constant P·seas_den, an exact BIGINT.

    No division anywhere ⇒ no signed-intdiv semantics seam (Spark
    ``div`` truncates toward zero, DuckDB ``//`` floors — they differ
    on negative numerators, and detrended values ARE signed).

    Scale shape: the input is the per-date aggregate of the raw data
    (domain-sized — one row per date), so the ordered window over it
    is a bounded single-partition stage of the same class as
    ks_statistic's domain sort; the seasonal join is a P-row broadcast.
    ``period`` must be odd so the ROWS window centers exactly.
    """
    if period % 2 != 1:
        raise ValueError("period must be odd for a centered ROWS window")
    half = period // 2
    # bounded input: one row per DISTINCT date (domain-sized, same
    # contract as the ks_statistic domain sort). NB: the window runs
    # over ``base`` where the date column is renamed to "d" — ordering
    # by the caller's name breaks resolution for date_col != "d"
    # (review finding, round 6 wave 3)
    w = Window.orderBy("d").rowsBetween(-half, half)
    base = daily.select(
        F.col(date_col).alias("d"),
        F.col(value_col).cast("bigint").alias("v"),
        # pmod, not %: dividend-sign modulo would split a season
        # position into two groups for dates BEFORE the anchor
        # (review finding, round 6 wave 3)
        F.expr(
            f"pmod(cast(datediff({date_col}, date'{anchor}') as bigint),"
            f" {period})"
        ).alias("pos"),
    )
    with_trend = base.select(
        "d",
        "v",
        "pos",
        F.when(
            F.count("v").over(w) == period, F.sum("v").over(w)
        )
        .cast("bigint")
        .alias(f"trend_x{period}"),
    )
    with_trend = with_trend.localCheckpoint(eager=False)
    seas = (
        with_trend.where(F.col(f"trend_x{period}").isNotNull())
        .groupBy("pos")
        .agg(
            F.sum(
                F.lit(period) * F.col("v") - F.col(f"trend_x{period}")
            ).alias("seas_num"),
            F.count(F.lit(1)).alias("seas_den"),
        )
    )
    return (
        with_trend.join(F.broadcast(seas), "pos", "left")
        .select(
            "d",
            "v",
            "pos",
            f"trend_x{period}",
            F.col("seas_num").cast("bigint").alias("seas_num"),
            F.col("seas_den").cast("bigint").alias("seas_den"),
            F.when(
                F.col(f"trend_x{period}").isNotNull(),
                (
                    F.lit(period) * F.col("v")
                    - F.col(f"trend_x{period}")
                )
                * F.col("seas_den")
                - F.col("seas_num"),
            )
            .cast("bigint")
            .alias("resid_num"),
        )
    )


def decompose_oracle_sql(
    daily_sql: str,
    date_col: str,
    value_col: str,
    period: int = 7,
    anchor: str = "1992-01-01",
) -> str:
    """DuckDB twin of :func:`decompose_additive` over ``daily_sql``
    (a query producing one row per date)."""
    half = period // 2
    return f"""
    WITH daily AS ({daily_sql}),
    base AS (
      SELECT {date_col} AS d,
             CAST({value_col} AS BIGINT) AS v,
             ((CAST(date_diff('day', DATE '{anchor}',
                             CAST({date_col} AS DATE)) AS BIGINT)
                % {period}) + {period}) % {period} AS pos
      FROM daily
    ),
    wt AS (
      SELECT d, v, pos,
             CASE WHEN COUNT(v) OVER win = {period}
                  THEN CAST(SUM(v) OVER win AS BIGINT) END
               AS trend_x{period}
      FROM base
      WINDOW win AS (ORDER BY d
                     ROWS BETWEEN {half} PRECEDING AND {half} FOLLOWING)
    ),
    seas AS (
      SELECT pos,
             CAST(SUM({period} * v - trend_x{period}) AS BIGINT)
               AS seas_num,
             CAST(COUNT(*) AS BIGINT) AS seas_den
      FROM wt WHERE trend_x{period} IS NOT NULL GROUP BY pos
    )
    SELECT wt.d, wt.v, wt.pos, wt.trend_x{period},
           seas.seas_num, seas.seas_den,
           CAST(CASE WHEN trend_x{period} IS NOT NULL THEN
             ({period} * v - trend_x{period}) * seas_den - seas_num
           END AS BIGINT) AS resid_num
    FROM wt LEFT JOIN seas USING (pos)
    """


# ---------------------------------------------------------------------
# CUSUM change-point detection (exact integer form)
# ---------------------------------------------------------------------

def cusum_changepoint(
    daily: DataFrame, date_col: str, value_col: str
) -> DataFrame:
    """Single change-point detection on an INTEGER-valued regular
    series by the classic scaled CUSUM statistic.

    With n observations, total S and prefix sums P_k, the centered
    cumulative sum at position k is P_k − k·(S/n); scaling by n keeps
    it exact:  C_k = n·P_k − k·S  (BIGINT — no division, no floats;
    exact while n·S < 2⁶³ ≈ 9.2·10¹⁸ — e.g. 10⁵ dates × 10¹³ total —
    lift to DECIMAL beyond, the spearman/gini recipe).
    The most likely single change-point is argmax |C_k| (Page 1954 /
    Pettitt's ties to the rank form); ties break to the earliest
    date so the answer is deterministic.

    Output: one row ``(cp_date, cp_k, n, total, c_abs_max)``.

    Scale shape: the input is the per-date aggregate (domain-sized);
    the ordered prefix window runs over that bounded set (the
    ks_statistic contract) and the argmax is an ORDER BY ... LIMIT 1
    over the same bounded set.
    """
    base = daily.select(
        F.col(date_col).alias("d"),
        F.col(value_col).cast("bigint").alias("v"),
    )
    tot = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("total"),
    )
    # bounded input: one row per DISTINCT date (domain-sized)
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    wk = Window.orderBy("d")
    pref = base.select(
        "d",
        F.sum("v").over(w).alias("pk"),
        F.row_number().over(wk).cast("bigint").alias("k"),
    )
    scored = pref.crossJoin(F.broadcast(tot)).select(
        "d",
        "k",
        "n",
        "total",
        F.abs(F.col("n") * F.col("pk") - F.col("k") * F.col("total"))
        .cast("bigint")
        .alias("c_abs"),
    )
    return (
        scored.orderBy(F.col("c_abs").desc(), F.col("d").asc())
        .limit(1)
        .select(
            F.col("d").alias("cp_date"),
            F.col("k").alias("cp_k"),
            "n",
            "total",
            F.col("c_abs").alias("c_abs_max"),
        )
    )


def cusum_oracle_sql(daily_sql: str, date_col: str, value_col: str) -> str:
    """DuckDB twin of :func:`cusum_changepoint`."""
    return f"""
    WITH daily AS ({daily_sql}),
    base AS (
      SELECT {date_col} AS d, CAST({value_col} AS BIGINT) AS v FROM daily
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS total
      FROM base
    ),
    pref AS (
      SELECT d,
             CAST(SUM(v) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS pk,
             CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS k
      FROM base
    )
    SELECT d AS cp_date, k AS cp_k, n, total,
           CAST(ABS(n * pk - k * total) AS BIGINT) AS c_abs_max
    FROM pref CROSS JOIN tot
    ORDER BY ABS(n * pk - k * total) DESC, d ASC
    LIMIT 1
    """


# ---------------------------------------------------------------------
# Autocorrelation function (exact rational form)
# ---------------------------------------------------------------------

def acf_exact(
    daily: DataFrame, date_col: str, value_col: str, max_lag: int = 14
) -> DataFrame:
    """Sample autocorrelation of an INTEGER-valued regular series at
    lags 1..``max_lag``, carried as exact integer ratios.

    The mean is rational (S/n); clearing it keeps every term integral:
    with u_t = n·x_t − S (so Σu_t = 0 exactly),

        acf(ℓ) = Σ_t u_t·u_{t+ℓ} / Σ_t u_t²

    (the standard biased estimator, denominator over ALL n terms).
    Output: one row per lag ``(lag, num, den)`` — BIGINT — plus the
    one double division ``acf``.  Exact while n·(n·x_max)² < 2⁶³,
    e.g. 2,500 dates × values ≤ 10⁴; lift the products to DECIMAL
    beyond (the spearman/gini recipe).

    Scale shape: the per-date aggregate is domain-sized; lagged pairs
    come from ONE lead() window per lag over that bounded set (the
    ks_statistic contract), then a max_lag-row aggregate.  The
    seasonality scan ts_decompose assumes — read acf(7) here first.
    """
    base = daily.select(
        F.col(date_col).alias("d"),
        F.col(value_col).cast("bigint").alias("v"),
    )
    tot = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("s"),
    )
    # bounded input: one row per DISTINCT date (domain-sized)
    w = Window.orderBy("d")
    with_u = base.crossJoin(F.broadcast(tot)).select(
        "d",
        "n",
        (F.col("n") * F.col("v") - F.col("s")).alias("u"),
    )
    leads = with_u.select(
        "n",
        "u",
        *[
            F.lead("u", lag).over(w).alias(f"u{lag}")
            for lag in range(1, max_lag + 1)
        ],
    )
    agg = leads.groupBy("n").agg(
        F.sum(F.col("u") * F.col("u")).cast("bigint").alias("den"),
        *[
            F.sum(F.col("u") * F.col(f"u{lag}"))
            .cast("bigint")
            .alias(f"num{lag}")
            for lag in range(1, max_lag + 1)
        ],
    )
    stacked = agg.selectExpr(
        "den",
        "stack("
        + str(max_lag)
        + ", "
        + ", ".join(f"{lag}, num{lag}" for lag in range(1, max_lag + 1))
        + ") as (lag, num)"
    )
    return stacked.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("num").cast("bigint").alias("num"),
        F.col("den").cast("bigint").alias("den"),
        F.when(
            F.col("den") > 0,
            F.col("num").cast("double") / F.col("den").cast("double"),
        ).alias("acf"),
    )


def acf_oracle_sql(
    daily_sql: str, date_col: str, value_col: str, max_lag: int = 14
) -> str:
    """DuckDB twin of :func:`acf_exact`."""
    lead_cols = ", ".join(
        f"LEAD(u, {lag}) OVER (ORDER BY d) AS u{lag}"
        for lag in range(1, max_lag + 1)
    )
    num_cols = ", ".join(
        f"CAST(SUM(u * u{lag}) AS BIGINT) AS num{lag}"
        for lag in range(1, max_lag + 1)
    )
    unpivot = " UNION ALL ".join(
        f"SELECT {lag} AS lag, num{lag} AS num, den FROM agg"
        for lag in range(1, max_lag + 1)
    )
    return f"""
    WITH daily AS ({daily_sql}),
    base AS (
      SELECT {date_col} AS d, CAST({value_col} AS BIGINT) AS v FROM daily
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS s
      FROM base
    ),
    wu AS (
      SELECT d, n, n * v - s AS u FROM base CROSS JOIN tot
    ),
    leads AS (
      SELECT n, u, {lead_cols} FROM wu
    ),
    agg AS (
      SELECT CAST(SUM(u * u) AS BIGINT) AS den, {num_cols}
      FROM leads GROUP BY n
    )
    SELECT CAST(lag AS INT) AS lag,
           CAST(num AS BIGINT) AS num,
           CAST(den AS BIGINT) AS den,
           CASE WHEN den > 0 THEN
             CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
           END AS acf
    FROM ({unpivot})
    """
