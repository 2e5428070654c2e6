"""Distributed two-sample / drift test statistics.

The data-drift layer of a training-data pipeline: before a new crawl
snapshot is admitted, its feature distributions are compared against
the reference corpus with classical test statistics.  Every statistic
here is computed in ONE scan + ONE (small) aggregate, from EXACT
integer/decimal sums, with the final floating-point formula written in
a fixed textual order so the DuckDB oracle reproduces it bit-for-bit
(see NOTES.md "FP determinism contract" — no libm beyond correctly
rounded sqrt).

Reference provenance: the reference repo has no statistics module —
this extends SURVEY.md §2.E's aggregate surface (exact percentile /
stats batteries) with the drift tests a 100 TB ingest gate needs.

Scale shapes:
- ``ks_statistic``: group-by-value first (domain-sized, optionally
  quantized), then ONE window over the distinct-value table.  The
  window is a single sort over the *domain*, not the data — quantize
  continuous columns (``round_to``) to keep the domain bounded.
- ``tvd_drift`` / ``chi_squared`` / ``welch_ttest``: conditional
  aggregation, one hash-agg row, no joins.
- ``group_ols``: one hash aggregate keyed by the group column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------
# Kolmogorov–Smirnov two-sample D statistic
# ---------------------------------------------------------------------


def ks_statistic(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    round_to: int | None = None,
    allow_unbounded_domain: bool = False,
) -> DataFrame:
    """Two-sample KS D = max_x |F_a(x) - F_b(x)| as a 1-row DataFrame.

    Counts per distinct value per sample (ONE scan, hash agg), then a
    cumulative-count window over the distinct-value axis.  ``round_to``
    quantizes continuous values first so the distinct domain — and the
    final sort — stays bounded at 100 TB (the D of the quantized
    distributions; document the bucket width with the result).

    ``round_to`` is REQUIRED unless ``allow_unbounded_domain=True``:
    with raw continuous doubles the distinct "domain" equals the row
    count and the cumulative window degenerates to a single partition
    over n — the opt-out is for provably low-cardinality inputs only.

    Exact integer cross-multiplied form: the numerator
    |cum_a*n_b - cum_b*n_a| stays in integer arithmetic — only ONE
    double division at the very end, so the statistic is order-free
    and engine-portable.

    Output: d_stat (double), n_a, n_b (bigint).
    """
    if round_to is None and not allow_unbounded_domain:
        raise ValueError(
            "ks_statistic: pass round_to= to bound the value domain "
            "(the cumulative window is domain-sized), or set "
            "allow_unbounded_domain=True for provably low-cardinality "
            "inputs"
        )
    v = F.col(value_col)
    if round_to is not None:
        v = F.round(v, round_to)
    # NULL values are dropped (standard missing-data handling for rank
    # statistics) — and load-bearing for portability: a NULL tie group
    # sorts FIRST in Spark's cumulative window but LAST in DuckDB/
    # Postgres, shifting every cumulative count differently per engine
    # (found by the operator fuzzer, round 8)
    counts = (
        df.filter(F.col(group_col).isin(group_a, group_b))
        .filter(F.col(value_col).isNotNull())
        .groupBy(v.alias("v"))
        .agg(
            F.count(F.when(F.col(group_col) == group_a, 1)).alias("ca"),
            F.count(F.when(F.col(group_col) == group_b, 1)).alias("cb"),
        )
    )
    # bounded input: `counts` is one row per DISTINCT value of v (the
    # post-agg domain), never the corpus — the single-partition
    # cumulative window is domain-sized at any data scale
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    with_tot = cum.select(
        "cum_a",
        "cum_b",
        F.max("cum_a").over(wt).alias("n_a"),
        F.max("cum_b").over(wt).alias("n_b"),
    )
    return with_tot.groupBy("n_a", "n_b").agg(
        F.max(
            F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a"))
        ).alias("num")
    ).select(
        # ANSI guard: an empty sample (n_a*n_b = 0) must yield NULL,
        # not a DIVIDE_BY_ZERO (Spark 4 ANSI throws on double/0 too)
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            F.col("num").cast("double")
            / (F.col("n_a") * F.col("n_b")).cast("double"),
        ).alias("d_stat"),
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
    )


def ks_oracle_sql(
    table: str,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    round_to: int | None = None,
) -> str:
    v = f"round({value_col}, {round_to})" if round_to is not None else value_col
    return f"""
    WITH counts AS (
      SELECT {v} AS v,
             COUNT(*) FILTER ({group_col} = '{group_a}') AS ca,
             COUNT(*) FILTER ({group_col} = '{group_b}') AS cb
      FROM {table}
      WHERE {group_col} IN ('{group_a}', '{group_b}')
        AND {value_col} IS NOT NULL
      GROUP BY 1
    ), cum AS (
      SELECT SUM(ca) OVER (ORDER BY v) AS cum_a,
             SUM(cb) OVER (ORDER BY v) AS cum_b
      FROM counts
    ), tot AS (
      SELECT cum_a, cum_b,
             MAX(cum_a) OVER () AS n_a, MAX(cum_b) OVER () AS n_b
      FROM cum
    )
    SELECT CASE WHEN n_a > 0 AND n_b > 0 THEN
             CAST(MAX(ABS(cum_a * n_b - cum_b * n_a)) AS DOUBLE)
             / CAST(n_a * n_b AS DOUBLE) END AS d_stat,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b
    FROM tot GROUP BY n_a, n_b
    """


# ---------------------------------------------------------------------
# Total variation distance (drift over a categorical / bucketed column)
# ---------------------------------------------------------------------


def tvd_drift(
    df: DataFrame,
    bucket_col: str,
    split_col,
) -> DataFrame:
    """TVD = 0.5 * Σ_b |p_a(b) - p_b(b)| between the two sides of a
    boolean split, as a 1-row DataFrame.

    Exact form: Σ|ca*n_b - cb*n_a| / (2*n_a*n_b) — the numerator is an
    exact integer sum (order-free), the single division happens once.
    ONE scan, one bucket-keyed hash agg, one scalar agg.

    ``split_col`` is a boolean Column (True → sample a).
    """
    counts = df.groupBy(F.col(bucket_col).alias("b")).agg(
        F.count(F.when(split_col, 1)).alias("ca"),
        F.count(F.when(~split_col, 1)).alias("cb"),
    )
    # bounded input: one row per bucket (post-agg), so the global
    # window is bucket-count-sized at any data scale
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    with_tot = counts.select(
        "ca",
        "cb",
        F.sum("ca").over(wt).alias("n_a"),
        F.sum("cb").over(wt).alias("n_b"),
    )
    return with_tot.groupBy("n_a", "n_b").agg(
        F.sum(
            F.abs(
                F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a")
            ).cast("decimal(38,0)")
        ).alias("num")
    ).select(
        # ANSI guard (operator fuzzer, round 8): an empty side makes
        # the divisor 0 — defined NULL, matching the oracle's CASE
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            F.col("num").cast("double")
            / (F.lit(2) * F.col("n_a") * F.col("n_b")).cast("double"),
        ).alias("tvd"),
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
    )


def tvd_oracle_sql(table: str, bucket_col: str, split_sql: str) -> str:
    return f"""
    WITH counts AS (
      SELECT {bucket_col} AS b,
             COUNT(*) FILTER ({split_sql}) AS ca,
             COUNT(*) FILTER (NOT ({split_sql})) AS cb
      FROM {table} GROUP BY 1
    ), tot AS (
      SELECT ca, cb, SUM(ca) OVER () AS n_a, SUM(cb) OVER () AS n_b
      FROM counts
    )
    SELECT CASE WHEN n_a > 0 AND n_b > 0 THEN
             CAST(SUM(CAST(ABS(ca * n_b - cb * n_a) AS DECIMAL(38,0)))
                  AS DOUBLE)
             / CAST(2 * n_a * n_b AS DOUBLE) END AS tvd,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b
    FROM tot GROUP BY n_a, n_b
    """


# ---------------------------------------------------------------------
# Chi-squared independence statistic over two SMALL categorical columns
# ---------------------------------------------------------------------


def _ident(cat: str) -> str:
    """Category value -> identifier-safe AND injective alias fragment
    (cats like '1-URGENT' would break the generated SQL; 'A B' vs
    'A/B' would COLLIDE under plain substitution — the md5 suffix
    keeps distinct values distinct, review finding round 6)."""
    import hashlib
    import re

    safe = re.sub(r"[^A-Za-z0-9]", "_", cat)
    if safe == cat:
        return cat
    return f"{safe}_{hashlib.md5(cat.encode()).hexdigest()[:8]}"


def _lit(cat: str) -> str:
    """Category value -> single-quoted SQL literal, quote-escaped
    (portable: '' is the escape in both Spark and DuckDB)."""
    return "'" + cat.replace("'", "''") + "'"


def _chi2_term(a: str, b: str) -> str:
    """One cell's (o - e)^2 / e with e = r*c/n, fixed textual order.

    Degenerate guard (operator fuzzer, round 8): a category whose
    margin is empty has e = 0, and Spark 4 ANSI throws on the double
    division (DuckDB returned a NULL-poisoned sum). Standard
    chi-squared practice excludes zero-expected cells, so the shared
    text makes them contribute 0e0 on BOTH engines; the guard also
    covers the empty-input n = 0 edge (chi2 = 0 then).
    """
    a, b = _ident(a), _ident(b)
    o, r, c = f"o_{a}_{b}", f"r_{a}", f"c_{b}"
    return (
        f"(case when n > 0e0 and {r} * {c} > 0e0 then "
        f"(({o} - {r} * {c} / n) * ({o} - {r} * {c} / n) / ({r} * {c} / n))"
        f" else 0e0 end)"
    )


def chi2_exprs(
    col_x: str, cats_x: list[str], col_y: str, cats_y: list[str]
) -> tuple[list[tuple[str, str]], str]:
    """(alias, SQL-aggregate) pairs + the final chi2 formula.

    Categories must be enumerated ahead (the operator targets LOW
    cardinality dims — flags, statuses); the statistic is then a
    fixed-order sum of |X|*|Y| double terms, textually identical on
    both engines (order-free inputs: all sums are integer counts).
    """
    aggs: list[tuple[str, str]] = []
    for a in cats_x:
        aggs.append(
            (
                f"r_{_ident(a)}",
                f"CAST(COUNT(*) FILTER (WHERE {col_x} = {_lit(a)}) AS DOUBLE)",
            )
        )
    for b in cats_y:
        aggs.append(
            (
                f"c_{_ident(b)}",
                f"CAST(COUNT(*) FILTER (WHERE {col_y} = {_lit(b)}) AS DOUBLE)",
            )
        )
    for a in cats_x:
        for b in cats_y:
            aggs.append(
                (
                    f"o_{_ident(a)}_{_ident(b)}",
                    f"CAST(COUNT(*) FILTER (WHERE {col_x} = {_lit(a)} "
                    f"AND {col_y} = {_lit(b)}) AS DOUBLE)",
                )
            )
    terms = [_chi2_term(a, b) for a in cats_x for b in cats_y]
    formula = " + ".join(terms)
    return aggs, f"({formula})"


def chi_squared(
    df: DataFrame,
    col_x: str,
    cats_x: list[str],
    col_y: str,
    cats_y: list[str],
) -> DataFrame:
    """Chi-squared independence statistic: ONE scan, one aggregate row.

    Output: chi2 (double), dof (bigint), n (bigint).
    """
    aggs, formula = chi2_exprs(col_x, cats_x, col_y, cats_y)
    row = df.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        *[F.expr(sql).alias(alias) for alias, sql in aggs],
    )
    dof = (len(cats_x) - 1) * (len(cats_y) - 1)
    return row.select(
        F.expr(formula).alias("chi2"),
        F.lit(dof).cast("bigint").alias("dof"),
        F.col("n").cast("bigint").alias("n"),
    )


def chi2_oracle_sql(
    table: str,
    col_x: str,
    cats_x: list[str],
    col_y: str,
    cats_y: list[str],
) -> str:
    aggs, formula = chi2_exprs(col_x, cats_x, col_y, cats_y)
    agg_sql = ", ".join(f"{sql} AS {alias}" for alias, sql in aggs)
    dof = (len(cats_x) - 1) * (len(cats_y) - 1)
    return f"""
    WITH cells AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n, {agg_sql} FROM {table}
    )
    SELECT {formula} AS chi2,
           CAST({dof} AS BIGINT) AS dof,
           CAST(n AS BIGINT) AS n
    FROM cells
    """


# ---------------------------------------------------------------------
# Welch's two-sample t statistic from exact scaled integer sums
# ---------------------------------------------------------------------


def _welch_formula() -> str:
    """t and Welch–Satterthwaite dof from per-sample n/sum/sumsq.

    Inputs are exact (integer-scaled) so every engine sees identical
    doubles; the formula below is textually shared.  Scaling by S
    cancels: mean_a - mean_b and sqrt(var/n) both carry 1/S.
    """
    # degenerate guard (operator fuzzer, round 8): a group with < 2
    # rows or zero pooled variance crashes ANSI Spark's double
    # division. NESTED case is load-bearing: AND does not
    # short-circuit in vectorized evaluation, so the variance
    # expression (divisors na-1, nb-1) may only be evaluated once the
    # outer condition guarantees na > 1 and nb > 1.
    var = (
        "((qa - sa * sa / na) / (na - 1) / na "
        "+ (qb - sb * sb / nb) / (nb - 1) / nb)"
    )
    return (
        "(case when na > 1e0 and nb > 1e0 then "
        f"case when {var} > 0e0 then "
        f"((sa / na - sb / nb) / sqrt{var}) "
        "else null end else null end)"
    )


def welch_ttest(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    scale: int = 100,
) -> DataFrame:
    """Welch's t between two groups: ONE scan, one aggregate row.

    ``scale`` makes ``round(value*scale)`` an exact integer (values with
    ≤ log10(scale) decimal places); sums/sum-squares run in DECIMAL, so
    the aggregation is order-free, and t is scale-invariant.

    Output: t_stat (double), n_a, n_b (bigint).
    """
    xd = F.round(F.col(value_col) * scale).cast("bigint").cast(
        "decimal(18,0)"
    )
    ga, gb = F.col(group_col) == group_a, F.col(group_col) == group_b
    row = df.filter(ga | gb).agg(
        F.count(F.when(ga, 1)).cast("double").alias("na"),
        F.count(F.when(gb, 1)).cast("double").alias("nb"),
        F.sum(F.when(ga, xd)).cast("double").alias("sa"),
        F.sum(F.when(gb, xd)).cast("double").alias("sb"),
        F.sum(F.when(ga, xd * xd)).cast("double").alias("qa"),
        F.sum(F.when(gb, xd * xd)).cast("double").alias("qb"),
    )
    return row.select(
        F.expr(_welch_formula()).alias("t_stat"),
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
    )


def welch_oracle_sql(
    table: str,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    scale: int = 100,
) -> str:
    x = f"CAST(CAST(ROUND({value_col} * {scale}) AS BIGINT) AS HUGEINT)"
    ga = f"{group_col} = '{group_a}'"
    gb = f"{group_col} = '{group_b}'"
    return f"""
    WITH sums AS (
      SELECT CAST(COUNT(*) FILTER ({ga}) AS DOUBLE) AS na,
             CAST(COUNT(*) FILTER ({gb}) AS DOUBLE) AS nb,
             CAST(SUM({x}) FILTER ({ga}) AS DOUBLE) AS sa,
             CAST(SUM({x}) FILTER ({gb}) AS DOUBLE) AS sb,
             CAST(SUM({x} * {x}) FILTER ({ga}) AS DOUBLE) AS qa,
             CAST(SUM({x} * {x}) FILTER ({gb}) AS DOUBLE) AS qb
      FROM {table} WHERE ({ga}) OR ({gb})
    )
    SELECT {_welch_formula()} AS t_stat,
           CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b
    FROM sums
    """


# ---------------------------------------------------------------------
# Per-group OLS (y ~ x): slope / intercept / r2 from exact sums
# ---------------------------------------------------------------------


def _ols_exprs() -> dict[str, str]:
    """slope/intercept/r2 from n, sx, sy, sxx, syy, sxy (exact inputs).

    With x scaled by Sx and y by Sy: slope carries Sy/Sx (undone by the
    caller via a literal factor), intercept carries Sy, r2 is
    scale-free.  We keep x and y at the SAME scale here so slope is
    scale-free too; intercept is divided by the scale literal.
    """
    return {
        "slope": "(n * sxy - sx * sy) / (n * sxx - sx * sx)",
        "intercept": "(sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n",
        "r2": "((n * sxy - sx * sy) * (n * sxy - sx * sy)) / "
        "((n * sxx - sx * sx) * (n * syy - sy * sy))",
    }


def group_ols(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    scale: int = 100,
) -> DataFrame:
    """Per-group simple linear regression: ONE scan, one grouped agg.

    x and y are integer-scaled by the same factor (slope scale-free;
    intercept divided back by the literal).  Output one row per group:
    slope, intercept, r2 rounded to 9 dp (identical double pipelines on
    both engines — rounding only trims display noise).
    """
    xs = F.round(F.col(x_col) * scale).cast("bigint").cast("decimal(18,0)")
    ys = F.round(F.col(y_col) * scale).cast("bigint").cast("decimal(18,0)")
    sums = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(xs).cast("double").alias("sx"),
        F.sum(ys).cast("double").alias("sy"),
        F.sum(xs * xs).cast("double").alias("sxx"),
        F.sum(ys * ys).cast("double").alias("syy"),
        F.sum(xs * ys).cast("double").alias("sxy"),
    )
    e = _ols_exprs()
    # fixed-point floor, not round(x, 9): round's 9-dp rescale path is
    # engine-specific (BigDecimal on Spark, double rescale on DuckDB);
    # floor(x*1e9+0.5)/1e9 is the identical IEEE sequence everywhere.
    return sums.select(
        "grp",
        F.expr(f"floor(({e['slope']}) * 1e9 + 0.5d) / 1e9").alias("slope"),
        F.expr(
            f"floor((({e['intercept']}) / {scale}) * 1e9 + 0.5d) / 1e9"
        ).alias("intercept"),
        F.expr(f"floor(({e['r2']}) * 1e9 + 0.5d) / 1e9").alias("r2"),
    )


def ols_oracle_sql(
    table: str, group_col: str, x_col: str, y_col: str, scale: int = 100
) -> str:
    xs = f"CAST(CAST(ROUND({x_col} * {scale}) AS BIGINT) AS HUGEINT)"
    ys = f"CAST(CAST(ROUND({y_col} * {scale}) AS BIGINT) AS HUGEINT)"
    e = _ols_exprs()
    return f"""
    WITH sums AS (
      SELECT {group_col} AS grp,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM({xs}) AS DOUBLE) AS sx,
             CAST(SUM({ys}) AS DOUBLE) AS sy,
             CAST(SUM({xs} * {xs}) AS DOUBLE) AS sxx,
             CAST(SUM({ys} * {ys}) AS DOUBLE) AS syy,
             CAST(SUM({xs} * {ys}) AS DOUBLE) AS sxy
      FROM {table} GROUP BY 1
    )
    SELECT grp,
           FLOOR(({e['slope']}) * 1e9 + 5e-1) / 1e9 AS slope,
           FLOOR((({e['intercept']}) / {scale}) * 1e9 + 5e-1) / 1e9
             AS intercept,
           FLOOR(({e['r2']}) * 1e9 + 5e-1) / 1e9 AS r2
    FROM sums
    """


# ---------------------------------------------------------------------
# One-scan higher moments: skewness / excess kurtosis per group
# ---------------------------------------------------------------------


def _moment_formulas() -> dict[str, str]:
    """Central moments from raw power sums (n, s1..s4 as doubles).

    Fixed textual order; inputs are exact DECIMAL sums cast to double
    (correctly rounded on both engines), every later op is shared IEEE
    arithmetic.  skew and kurtosis are scale-invariant, so the ×scale
    integerization cancels.
    """
    m2 = "((s2 - s1 * s1 / n) / n)"
    m3 = "((s3 - 3.0 * s1 * s2 / n + 2.0 * s1 * s1 * s1 / (n * n)) / n)"
    m4 = (
        "((s4 - 4.0 * s1 * s3 / n + 6.0 * s1 * s1 * s2 / (n * n) "
        "- 3.0 * s1 * s1 * s1 * s1 / (n * n * n)) / n)"
    )
    # zero-variance guard (operator fuzzer, round 8): a constant group
    # has m2 = 0 — ANSI Spark throws on the double division where
    # DuckDB yields NULL; shared NULL branch on both engines. The m2
    # condition itself is division-by-n only (n >= 1 per group).
    return {
        "skew": f"(case when {m2} > 0e0 then"
        f" ({m3} / ({m2} * sqrt({m2}))) else null end)",
        "kurt": f"(case when {m2} > 0e0 then"
        f" ({m4} / ({m2} * {m2}) - 3.0) else null end)",
    }


def group_moments(
    df: DataFrame,
    group_col: str,
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """Per-group skewness + excess kurtosis in ONE scan, one hash agg.

    Power sums Σx..Σx⁴ of the integer-scaled value accumulate in
    DECIMAL(38,0) (order-free); the moment arithmetic is the shared
    double formula rounded to 6 dp.  Output: (grp, n, skew, kurt).
    """
    # products run DECIMAL-first: x^4 of a 10^7-scale value overflows
    # int64 (found by the sf0.1 sweep under ANSI mode) — decimal
    # multiplication is exact to 38 digits on both engines
    xd = F.round(F.col(value_col) * scale).cast("bigint").cast(
        "decimal(18,0)"
    )
    sums = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(xd).cast("double").alias("s1"),
        F.sum(xd * xd).cast("double").alias("s2"),
        F.sum(xd * xd * xd).cast("double").alias("s3"),
        F.sum(xd * xd * xd * xd).cast("double").alias("s4"),
    )
    e = _moment_formulas()
    # fixed-point floor, not round(x, 6): the inputs are bit-identical
    # doubles on both engines, but round's 6-dp rescale path is not
    # (BigDecimal exact expansion on Spark, double rescale on DuckDB) —
    # floor(x*1e6+0.5)/1e6 is the identical IEEE sequence everywhere.
    return sums.select(
        "grp",
        F.col("n").cast("bigint").alias("n"),
        F.expr(f"floor(({e['skew']}) * 1e6 + 0.5d) / 1e6").alias("skew"),
        F.expr(f"floor(({e['kurt']}) * 1e6 + 0.5d) / 1e6").alias("kurt"),
    )


def moments_oracle_sql(
    table: str, group_col: str, value_col: str, scale: int = 100
) -> str:
    x = f"CAST(CAST(ROUND({value_col} * {scale}) AS BIGINT) AS HUGEINT)"
    e = _moment_formulas()
    return f"""
    WITH sums AS (
      SELECT {group_col} AS grp,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM({x}) AS DOUBLE) AS s1,
             CAST(SUM({x} * {x}) AS DOUBLE) AS s2,
             CAST(SUM({x} * {x} * {x}) AS DOUBLE) AS s3,
             CAST(SUM({x} * {x} * {x} * {x}) AS DOUBLE) AS s4
      FROM {table} GROUP BY 1
    )
    SELECT grp, CAST(n AS BIGINT) AS n,
           FLOOR(({e['skew']}) * 1e6 + 5e-1) / 1e6 AS skew,
           FLOOR(({e['kurt']}) * 1e6 + 5e-1) / 1e6 AS kurt
    FROM sums
    """


# ---------------------------------------------------------------------
# Mann–Whitney U (rank-sum) with tie correction
# ---------------------------------------------------------------------

# Degenerate-input guard (operator fuzzer, round 8): Spark 4 ANSI mode
# throws DIVIDE_BY_ZERO even for DOUBLE division, so an empty group
# (na*nb = 0) or an all-tied sample (variance 0) must take a defined
# NULL branch instead of reaching the division. NESTED CASE is
# load-bearing: AND does not short-circuit in vectorized evaluation,
# so the variance expression (whose inner divisor (na+nb)(na+nb-1)
# is 0 when na+nb <= 1) may only be evaluated once na>0 AND nb>0
# guarantees na+nb >= 2. Shared text — DuckDB CASE semantics match.
_MW_VAR = (
    "(na * nb / 12.0 * ((na + nb + 1.0) "
    "- ties / ((na + nb) * (na + nb - 1.0))))"
)
_MW_FINAL = (
    "CASE WHEN na > 0 AND nb > 0 THEN "
    "CASE WHEN " + _MW_VAR + " > 0 THEN "
    "((r2a - na * (na + 1.0)) / 2.0 - na * nb / 2.0) / sqrt"
    + _MW_VAR + " ELSE NULL END ELSE NULL END"
)


def mannwhitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    round_to: int | None = None,
    allow_unbounded_domain: bool = False,
) -> DataFrame:
    """Mann–Whitney U statistic + tie-corrected normal z, one row.

    ``round_to`` is REQUIRED unless ``allow_unbounded_domain=True``
    (same domain-growth guard as :func:`ks_statistic`: a raw
    continuous column makes the cumulative window single-partition
    over n rows).

    Rank sums never materialize per-row ranks: per distinct value,
    sample-a's average-rank contribution is
    ``ca·(cum_prev + (t+1)/2)`` — doubled to stay integer
    (``ca·(2·cum_prev + t + 1)``) and summed exactly, like the KS
    cumulative trick.  Tie correction ``Σ(t³−t)`` is an exact decimal
    sum.  ONE scan + domain-sized window; final z is the shared
    sqrt formula.  Output: (u_a double, z double, n_a, n_b bigint).
    """
    if round_to is None and not allow_unbounded_domain:
        raise ValueError(
            "mannwhitney_u: pass round_to= to bound the value domain "
            "(the cumulative window is domain-sized), or set "
            "allow_unbounded_domain=True for provably low-cardinality "
            "inputs"
        )
    v = F.col(value_col)
    if round_to is not None:
        v = F.round(v, round_to)
    # NULL values dropped — same portability seam as ks_statistic: a
    # NULL tie group sorts first in Spark's rank-cum window but last
    # in DuckDB, changing the rank sums per engine (operator fuzzer)
    counts = (
        df.filter(F.col(group_col).isin(group_a, group_b))
        .filter(F.col(value_col).isNotNull())
        .groupBy(v.alias("v"))
        .agg(
            F.count(F.when(F.col(group_col) == group_a, 1)).alias("ca"),
            F.count(F.when(F.col(group_col) == group_b, 1)).alias("cb"),
        )
        .select("v", "ca", "cb", (F.col("ca") + F.col("cb")).alias("t"))
    )
    # bounded input: `counts` is one row per DISTINCT value (post-agg
    # domain) — the single-partition rank-cum window never sees the
    # corpus
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    td = F.col("t").cast("decimal(18,0)")
    with_cum = counts.select(
        "ca",
        "cb",
        "t",
        F.coalesce(F.sum("t").over(w), F.lit(0)).alias("cum_prev"),
    )
    agg = with_cum.agg(
        F.sum("ca").cast("double").alias("na"),
        F.sum("cb").cast("double").alias("nb"),
        F.sum(
            (
                F.col("ca")
                * (2 * F.col("cum_prev") + F.col("t") + 1)
            ).cast("decimal(38,0)")
        )
        .cast("double")
        .alias("r2a"),
        F.sum(td * td * td - td).cast("double").alias("ties"),
    )
    return agg.select(
        ((F.col("r2a") - F.col("na") * (F.col("na") + 1.0)) / 2.0).alias(
            "u_a"
        ),
        F.expr(_MW_FINAL).alias("z"),
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
    )


def mannwhitney_oracle_sql(
    table: str,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    round_to: int | None = None,
) -> str:
    v = f"round({value_col}, {round_to})" if round_to is not None else value_col
    return f"""
    WITH counts AS (
      SELECT {v} AS v,
             COUNT(*) FILTER ({group_col} = '{group_a}') AS ca,
             COUNT(*) FILTER ({group_col} = '{group_b}') AS cb
      FROM {table}
      WHERE {group_col} IN ('{group_a}', '{group_b}')
        AND {value_col} IS NOT NULL
      GROUP BY 1
    ), cum AS (
      SELECT ca, cb, ca + cb AS t,
             COALESCE(SUM(ca + cb) OVER (
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS cum_prev
      FROM counts
    ), agg AS (
      SELECT CAST(SUM(ca) AS DOUBLE) AS na,
             CAST(SUM(cb) AS DOUBLE) AS nb,
             CAST(SUM(CAST(ca * (2 * cum_prev + t + 1) AS DECIMAL(38,0)))
                  AS DOUBLE) AS r2a,
             CAST(SUM(CAST(t AS DECIMAL(18,0)) * CAST(t AS DECIMAL(18,0))
                      * CAST(t AS DECIMAL(18,0)) - CAST(t AS DECIMAL(18,0)))
                  AS DOUBLE) AS ties
      FROM cum
    )
    SELECT (r2a - na * (na + 1.0)) / 2.0 AS u_a,
           {_MW_FINAL} AS z,
           CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b
    FROM agg
    """


# ---------------------------------------------------------------------
# Population Stability Index (PSI)
# ---------------------------------------------------------------------

_PSI_TERM = (
    "(CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb) * "
    "ln((CAST(ca AS DOUBLE) / na) / (CAST(cb AS DOUBLE) / nb))"
)


def psi_drift(
    df: DataFrame,
    bucket_col: str,
    split_col,
    epsilon: int = 1,
) -> DataFrame:
    """Population Stability Index between the two sides of a boolean
    split: PSI = Σ_b (p_a − p_b)·ln(p_a/p_b), one row.

    Buckets missing on one side get an ``epsilon`` pseudo-count (the
    standard PSI smoothing; without it an empty bucket is ±∞).  Each
    bucket's term is fixed-point quantized to 1e-12 via the shared
    ``floor(t·1e12 + 0.5)`` BEFORE the cross-bucket sum, which then
    accumulates exactly in DECIMAL — the aggregation is order-free even
    though ln() is involved (an engine-ulp difference in ln flips a
    quantized term only within 1e-16 of a boundary).  ONE scan, one
    bucket hash-agg.  Industry rule of thumb: PSI < 0.1 stable,
    > 0.25 action.
    """
    counts = df.groupBy(F.col(bucket_col).alias("b")).agg(
        (F.count(F.when(split_col, 1)) + epsilon).alias("ca"),
        (F.count(F.when(~split_col, 1)) + epsilon).alias("cb"),
    )
    # bounded input: one row per bucket (post-agg) — the global window
    # is bucket-count-sized at any data scale
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    with_tot = counts.select(
        "ca",
        "cb",
        F.sum("ca").over(wt).cast("double").alias("na"),
        F.sum("cb").over(wt).cast("double").alias("nb"),
    )
    term_q = (
        f"cast(floor(({_PSI_TERM}) * 1000000000000.0d + 0.5d) "
        "as decimal(38,0))"
    )
    return (
        with_tot.groupBy("na", "nb")
        .agg(F.sum(F.expr(term_q)).alias("psi_e12"))
        .select(
            (F.col("psi_e12").cast("double") / 1.0e12).alias("psi"),
            F.col("na").cast("bigint").alias("n_a"),
            F.col("nb").cast("bigint").alias("n_b"),
        )
    )


def psi_oracle_sql(
    table: str, bucket_col: str, split_sql: str, epsilon: int = 1
) -> str:
    return f"""
    WITH counts AS (
      SELECT {bucket_col} AS b,
             COUNT(*) FILTER ({split_sql}) + {epsilon} AS ca,
             COUNT(*) FILTER (NOT ({split_sql})) + {epsilon} AS cb
      FROM {table} GROUP BY 1
    ), tot AS (
      SELECT ca, cb,
             CAST(SUM(ca) OVER () AS DOUBLE) AS na,
             CAST(SUM(cb) OVER () AS DOUBLE) AS nb
      FROM counts
    )
    SELECT CAST(SUM(CAST(FLOOR(({_PSI_TERM}) * 1e12 + 0.5)
                         AS DECIMAL(38,0))) AS DOUBLE) / 1.0e12 AS psi,
           CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b
    FROM tot GROUP BY na, nb
    """


def _anova_formula() -> str:
    """One-way ANOVA F from (n_g, s_g) group sums + global sumsq, all
    doubles derived from exact DECIMAL sums (shared textual IEEE
    sequence on both engines):

        SSB = Σ_g s_g²/n_g − S²/N
        SSW = Q − Σ_g s_g²/n_g
        F   = (SSB/(k−1)) / (SSW/(N−k))

    Inputs bound as columns: n (N), k, q (Q = Σx²), st (S = Σx),
    sb (Σ_g s_g²/n_g). Scale-invariant, so integer ×scale cancels."""
    ssb = "(sb - st * st / n)"
    ssw = "(q - sb)"
    # degenerate guard (operator fuzzer, round 8): one group (k = 1),
    # all-singleton groups (n = k) or zero within-variance make a
    # divisor 0 — ANSI Spark throws on double/0; both engines now take
    # the defined NULL branch. Condition operands are division-free.
    return (
        f"(case when k > 1e0 and n > k and {ssw} > 0e0 then "
        f"(({ssb} / (k - 1e0)) / ({ssw} / (n - k))) else null end)"
    )


def anova_f(
    df: DataFrame,
    value_col: str,
    group_col: str,
    scale: int = 100,
) -> DataFrame:
    """One-way ANOVA F statistic across ALL groups of ``group_col``:
    two aggregates (per-group sums, then the k-row combine) — both
    map-side combinable, ONE scan of the fact table.  Values are
    integer-scaled so the power sums accumulate exactly in DECIMAL
    (order-free); the F formula is the shared double pipeline,
    fixed-point-floored to 9 dp.  Output: one row
    ``(f_stat, k_groups, n_total)``.
    """
    xd = F.round(F.col(value_col) * scale).cast("bigint").cast(
        "decimal(18,0)"
    )
    per = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("decimal(18,0)").alias("ng"),
        F.sum(xd).alias("sg"),
        F.sum(xd * xd).alias("qg"),
    )
    row = per.agg(
        F.sum("ng").cast("double").alias("n"),
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum("sg").cast("double").alias("st"),
        F.sum("qg").cast("double").alias("q"),
        # Σ s_g²/n_g: per-group doubles summed in a FIXED order (by
        # group key) via a sorted array fold — order-free inputs, one
        # deterministic double reduction on both engines
        F.expr(
            "aggregate("
            f"  array_sort(collect_list(struct({group_col} as g, "
            "    cast(sg as double) / cast(ng as double) * "
            "    cast(sg as double) as v))),"
            "  cast(0 as double), (a, x) -> a + x.v)"
        ).alias("sb"),
    )
    e = _anova_formula()
    return row.select(
        F.expr(f"floor(({e}) * 1e9 + 0.5d) / 1e9").alias("f_stat"),
        F.col("k").cast("bigint").alias("k_groups"),
        F.col("n").cast("bigint").alias("n_total"),
    )


def anova_oracle_sql(
    table: str, value_col: str, group_col: str, scale: int = 100
) -> str:
    x = f"CAST(CAST(ROUND({value_col} * {scale}) AS BIGINT) AS HUGEINT)"
    e = _anova_formula()
    return f"""
    WITH per AS (
      SELECT {group_col} AS g,
             CAST(COUNT(*) AS HUGEINT) AS ng,
             SUM({x}) AS sg, SUM({x} * {x}) AS qg
      FROM {table} GROUP BY 1
    ), comb AS (
      SELECT CAST(SUM(ng) AS DOUBLE) AS n,
             CAST(COUNT(*) AS DOUBLE) AS k,
             CAST(SUM(sg) AS DOUBLE) AS st,
             CAST(SUM(qg) AS DOUBLE) AS q,
             list_aggregate(list_transform(
               list_sort(list(ROW(g, CAST(sg AS DOUBLE)
                                     / CAST(ng AS DOUBLE)
                                     * CAST(sg AS DOUBLE)))),
               r -> r[2]), 'sum') AS sb
      FROM per
    )
    SELECT FLOOR(({e}) * 1e9 + 5e-1) / 1e9 AS f_stat,
           CAST(k AS BIGINT) AS k_groups,
           CAST(n AS BIGINT) AS n_total
    FROM comb
    """


# ---------------------------------------------------------------------
# Inter-annotator agreement: Cohen's kappa (two raters, C classes)
# ---------------------------------------------------------------------


def cohen_kappa(df: DataFrame, rater_a: str, rater_b: str) -> DataFrame:
    """Cohen's kappa between two categorical rating columns.

    The labeled-data quality gate: chance-corrected agreement between
    two annotators (or an annotator and a model).  With N items,
    diagonal mass A = Σ_k n_kk and marginals r_k (rater-a rows),
    c_k (rater-b rows):

        kappa = (N·A − Σ_k r_k·c_k) / (N² − Σ_k r_k·c_k)

    Everything is exact integer math up to one final double division
    of two exactly-representable BIGINTs (valid while N < 2^26 — far
    beyond any human-labeled set; raise and shard beyond that).

    Plan: ONE scan — a (rater_a, rater_b) hash aggregate to the C²-row
    confusion matrix (map-side combinable), then class-marginal
    aggregates over that tiny table joined back on the class key.
    Output: one row ``(n_items bigint, n_agree bigint, pe_num bigint,
    kappa_num bigint, kappa_den bigint, kappa double)``.  When both
    raters assign one identical class to every item the denominator is
    0 and kappa is undefined — emitted as NULL (engines disagree on
    0/0: Spark NULL vs IEEE NaN, so the contract is explicit).
    """
    cm = df.groupBy(
        F.col(rater_a).alias("ra"), F.col(rater_b).alias("rb")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    # The C²-row matrix feeds four downstream aggregates; truncating
    # its lineage keeps the input at ONE scan instead of re-reading it
    # per branch (same trick as operators/graph.py).
    cm = cm.localCheckpoint(eager=False)
    ra_marg = cm.groupBy(F.col("ra").alias("k")).agg(
        F.sum("cnt").alias("rk")
    )
    rb_marg = cm.groupBy(F.col("rb").alias("k")).agg(
        F.sum("cnt").alias("ck")
    )
    pe = (
        ra_marg.join(rb_marg, "k", "inner")
        .agg(F.sum(F.col("rk") * F.col("ck")).alias("pe_num"))
    )
    tot = cm.agg(
        F.sum("cnt").alias("n_items"),
        F.sum(F.when(F.col("ra") == F.col("rb"), F.col("cnt"))
              .otherwise(F.lit(0))).alias("n_agree"),
    )
    return tot.crossJoin(pe).select(
        F.col("n_items").cast("bigint").alias("n_items"),
        F.col("n_agree").cast("bigint").alias("n_agree"),
        F.col("pe_num").cast("bigint").alias("pe_num"),
        (F.col("n_items") * F.col("n_agree") - F.col("pe_num"))
        .cast("bigint")
        .alias("kappa_num"),
        (F.col("n_items") * F.col("n_items") - F.col("pe_num"))
        .cast("bigint")
        .alias("kappa_den"),
        F.when(
            F.col("n_items") * F.col("n_items") != F.col("pe_num"),
            (F.col("n_items") * F.col("n_agree") - F.col("pe_num"))
            .cast("double")
            / (F.col("n_items") * F.col("n_items") - F.col("pe_num"))
            .cast("double"),
        ).alias("kappa"),
    )


def cohen_kappa_oracle_sql(rated_sql: str, rater_a: str, rater_b: str) -> str:
    """DuckDB twin of :func:`cohen_kappa` over ``rated_sql`` (a query
    producing the two rating columns)."""
    return f"""
    WITH rated AS ({rated_sql}),
    cm AS (
      SELECT {rater_a} AS ra, {rater_b} AS rb, COUNT(*) AS cnt
      FROM rated GROUP BY 1, 2
    ),
    marg AS (
      SELECT a.k, a.rk, b.ck FROM
        (SELECT ra AS k, SUM(cnt) AS rk FROM cm GROUP BY 1) a
        JOIN (SELECT rb AS k, SUM(cnt) AS ck FROM cm GROUP BY 1) b
        USING (k)
    ),
    pe AS (SELECT SUM(rk * ck) AS pe_num FROM marg),
    tot AS (
      SELECT SUM(cnt) AS n_items,
             SUM(CASE WHEN ra = rb THEN cnt ELSE 0 END) AS n_agree
      FROM cm
    )
    SELECT CAST(n_items AS BIGINT) AS n_items,
           CAST(n_agree AS BIGINT) AS n_agree,
           CAST(pe_num AS BIGINT) AS pe_num,
           CAST(n_items * n_agree - pe_num AS BIGINT) AS kappa_num,
           CAST(n_items * n_items - pe_num AS BIGINT) AS kappa_den,
           CASE WHEN n_items * n_items <> pe_num THEN
             CAST(n_items * n_agree - pe_num AS DOUBLE)
               / CAST(n_items * n_items - pe_num AS DOUBLE)
           END AS kappa
    FROM tot CROSS JOIN pe
    """


# ---------------------------------------------------------------------
# Kendall rank correlation (tau-b), exact by grid prefix sums
# ---------------------------------------------------------------------

def kendall_tau(df: DataFrame, x: str, y: str) -> DataFrame:
    """Exact tie-corrected Kendall tau-b between two INTEGER-valued
    columns (bucketize continuous signals first, as for
    :func:`ks_statistic`).

    The naive definition is an all-pairs scan (O(n²) — impossible at
    corpus scale).  This computes the same pair counts exactly from
    the joint DOMAIN: collapse the data to (x, y, cnt) cells with one
    hash aggregate, densify to the dx·dy grid, then two cumulative
    window passes give every cell its strict 2-D dominance count

        dom(x, y)  = Σ_{x'<x, y'<y} cnt(x', y')   (concordant mates)
        disc(x, y) = Σ_{x'<x, y'>y} cnt(x', y')   (discordant mates)

    so  C = Σ cnt·dom  and  D = Σ cnt·disc  count every unordered pair
    exactly once (ordered by the strictly-smaller x).  Tie terms come
    from the marginals: n1 = Σ_x C(n_x,2), n2 = Σ_y C(n_y,2),
    n0 = C(n,2), and

        tau_b = (C − D) / sqrt((n0 − n1) · (n0 − n2)).

    All counts are exact BIGINTs; the single double expression is a
    division by a correctly-rounded sqrt of a product of two exactly-
    representable ints (the cohen_kappa contract — sqrt and divide are
    IEEE correctly rounded, unlike exp/log).  Degenerate inputs (a
    constant column ⇒ a zero factor) emit NULL tau.

    Scale shape: the only data-sized stage is the first hash
    aggregate (map-side combinable).  Everything after runs on the
    dx·dy grid — bounded by construction because the caller buckets —
    and the two window passes are PARTITIONED (by x, then by y), so no
    single-partition stage exists even on a large grid.

    Verified identity (pinned in tests): C + D + (pairs tied in x or
    y) = n0, with ties-in-both counted once.
    """
    cells = (
        df.select(F.col(x).alias("gx"), F.col(y).alias("gy"))
        .where(F.col("gx").isNotNull() & F.col("gy").isNotNull())
        .groupBy("gx", "gy")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # grid feeds the dominance windows AND the marginal tie terms
    cells = cells.localCheckpoint(eager=False)
    xs = cells.select("gx").distinct()
    ys = cells.select("gy").distinct()
    grid = (
        xs.crossJoin(ys)
        .join(cells, ["gx", "gy"], "left")
        .select("gx", "gy", F.coalesce("cnt", F.lit(0)).alias("c"))
    )
    w_lt_y = (
        Window.partitionBy("gx")
        .orderBy("gy")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_gt_y = (
        Window.partitionBy("gx")
        .orderBy("gy")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    g1 = grid.select(
        "gx",
        "gy",
        "c",
        F.coalesce(F.sum("c").over(w_lt_y), F.lit(0)).alias("lt_y"),
        F.coalesce(F.sum("c").over(w_gt_y), F.lit(0)).alias("gt_y"),
    )
    w_lt_x = (
        Window.partitionBy("gy")
        .orderBy("gx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    g2 = g1.select(
        "c",
        F.coalesce(F.sum("lt_y").over(w_lt_x), F.lit(0)).alias("dom"),
        F.coalesce(F.sum("gt_y").over(w_lt_x), F.lit(0)).alias("disc"),
    )
    cd = g2.agg(
        F.sum(F.col("c") * F.col("dom")).alias("concordant"),
        F.sum(F.col("c") * F.col("disc")).alias("discordant"),
    )
    tx = (
        cells.groupBy("gx")
        .agg(F.sum("cnt").alias("nx"))
        .agg(F.sum(F.expr("nx * (nx - 1) div 2")).alias("ties_x"))
    )
    ty = (
        cells.groupBy("gy")
        .agg(F.sum("cnt").alias("ny"))
        .agg(F.sum(F.expr("ny * (ny - 1) div 2")).alias("ties_y"))
    )
    txy = cells.agg(
        F.sum("cnt").alias("n"),
        F.sum(F.expr("cnt * (cnt - 1) div 2")).alias("ties_xy"),
    )
    out = cd.crossJoin(tx).crossJoin(ty).crossJoin(txy)
    return out.select(
        F.col("n").cast("bigint").alias("n"),
        F.expr("n * (n - 1) div 2").cast("bigint").alias("n_pairs"),
        F.col("concordant").cast("bigint").alias("concordant"),
        F.col("discordant").cast("bigint").alias("discordant"),
        F.col("ties_x").cast("bigint").alias("ties_x"),
        F.col("ties_y").cast("bigint").alias("ties_y"),
        F.col("ties_xy").cast("bigint").alias("ties_xy"),
        F.when(
            (F.expr("n * (n - 1) div 2 - ties_x") > 0)
            & (F.expr("n * (n - 1) div 2 - ties_y") > 0),
            F.expr(
                "cast(concordant - discordant as double)"
                " / sqrt(cast(n * (n - 1) div 2 - ties_x as double)"
                "        * cast(n * (n - 1) div 2 - ties_y as double))"
            ),
        ).alias("tau_b"),
    )


def kendall_tau_oracle_sql(src_sql: str, x: str, y: str) -> str:
    """DuckDB twin of :func:`kendall_tau` over ``src_sql`` (a query
    producing the two integer columns)."""
    return f"""
    WITH src AS ({src_sql}),
    cells AS (
      SELECT {x} AS gx, {y} AS gy, COUNT(*) AS cnt
      FROM src WHERE {x} IS NOT NULL AND {y} IS NOT NULL
      GROUP BY 1, 2
    ),
    grid AS (
      SELECT xs.gx, ys.gy, COALESCE(c.cnt, 0) AS c
      FROM (SELECT DISTINCT gx FROM cells) xs
      CROSS JOIN (SELECT DISTINCT gy FROM cells) ys
      LEFT JOIN cells c USING (gx, gy)
    ),
    g1 AS (
      SELECT gx, gy, c,
             COALESCE(SUM(c) OVER (PARTITION BY gx ORDER BY gy
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS lt_y,
             COALESCE(SUM(c) OVER (PARTITION BY gx ORDER BY gy
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0)
               AS gt_y
      FROM grid
    ),
    g2 AS (
      SELECT c,
             COALESCE(SUM(lt_y) OVER (PARTITION BY gy ORDER BY gx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS dom,
             COALESCE(SUM(gt_y) OVER (PARTITION BY gy ORDER BY gx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS disc
      FROM g1
    ),
    cd AS (
      SELECT SUM(c * dom) AS concordant, SUM(c * disc) AS discordant
      FROM g2
    ),
    tx AS (SELECT SUM(nx * (nx - 1) // 2) AS ties_x FROM
           (SELECT SUM(cnt) AS nx FROM cells GROUP BY gx)),
    ty AS (SELECT SUM(ny * (ny - 1) // 2) AS ties_y FROM
           (SELECT SUM(cnt) AS ny FROM cells GROUP BY gy)),
    txy AS (SELECT SUM(cnt) AS n, SUM(cnt * (cnt - 1) // 2) AS ties_xy
            FROM cells)
    SELECT CAST(n AS BIGINT) AS n,
           CAST(n * (n - 1) // 2 AS BIGINT) AS n_pairs,
           CAST(concordant AS BIGINT) AS concordant,
           CAST(discordant AS BIGINT) AS discordant,
           CAST(ties_x AS BIGINT) AS ties_x,
           CAST(ties_y AS BIGINT) AS ties_y,
           CAST(ties_xy AS BIGINT) AS ties_xy,
           CASE WHEN n * (n - 1) // 2 - ties_x > 0
                 AND n * (n - 1) // 2 - ties_y > 0 THEN
             CAST(concordant - discordant AS DOUBLE)
               / sqrt(CAST(n * (n - 1) // 2 - ties_x AS DOUBLE)
                      * CAST(n * (n - 1) // 2 - ties_y AS DOUBLE))
           END AS tau_b
    FROM cd CROSS JOIN tx CROSS JOIN ty CROSS JOIN txy
    """


# ---------------------------------------------------------------------
# Spearman rank correlation, exact by centered domain-rank algebra
# ---------------------------------------------------------------------

def spearman_rho(df: DataFrame, x: str, y: str) -> DataFrame:
    """Exact tie-corrected Spearman rho between two INTEGER-valued
    columns (bucketize continuous signals first).

    Spearman = Pearson on average ranks.  Ranking 100 TB row-by-row is
    a global sort; instead ranks come from the value DOMAIN: for a
    value v with cnt(v) occurrences and cum(v) rows strictly below,
    the doubled average rank  r2(v) = 2·cum(v) + cnt(v) + 1  is an
    exact integer, and doubled CENTERED ranks  u(v) = r2(v) − (n+1)
    sum to exactly zero (the doubled mean rank IS n+1).  So

        rho = Σ c·ux·uy / sqrt(Σ c·ux² · Σ c·uy²)

    over the joint-domain cells — no mean-subtraction residue, no
    global sort, and the factor-of-2 cancels.  Sums run in
    DECIMAL(38,0)/HUGEINT for the PRODUCTS too, not just the sums — a
    single term c·ux·uy can reach ~4n³/27, past int64 near n ≈ 4·10⁶,
    while the sums reach ~n³/3.  The single
    double expression divides by a correctly-rounded sqrt, the
    cohen_kappa contract.  Degenerate inputs (a constant column)
    emit NULL rho.

    Output: one row ``(n bigint, rho_s double)`` — the DECIMAL
    intermediates never surface (decimal output columns are the known
    cross-engine hash seam, NOTES.md round-5 post-mortem).

    Scale shape: one data-sized hash aggregate to (x, y, cnt) cells;
    marginal rank tables are domain-sized windows (PARTITIONED
    trivially small) broadcast back onto the cells; one final scalar
    aggregate.
    """
    cells = (
        df.select(F.col(x).alias("gx"), F.col(y).alias("gy"))
        .where(F.col("gx").isNotNull() & F.col("gy").isNotNull())
        .groupBy("gx", "gy")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cells = cells.localCheckpoint(eager=False)
    n_df = cells.agg(F.sum("cnt").cast("bigint").alias("n"))

    def marginal(col: str, out: str) -> DataFrame:
        # bounded input: one row per distinct value (domain-sized)
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        m = cells.groupBy(col).agg(F.sum("cnt").alias("mc"))
        return m.select(
            col,
            (
                F.lit(2) * F.coalesce(F.sum("mc").over(w), F.lit(0))
                + F.col("mc")
                + F.lit(1)
            )
            .cast("bigint")
            .alias(out),
        )

    mx = marginal("gx", "r2x")
    my = marginal("gy", "r2y")
    joined = (
        cells.join(F.broadcast(mx), "gx")
        .join(F.broadcast(my), "gy")
        .crossJoin(F.broadcast(n_df))
        .select(
            "cnt",
            "n",
            (F.col("r2x") - (F.col("n") + 1)).alias("ux"),
            (F.col("r2y") - (F.col("n") + 1)).alias("uy"),
        )
    )
    # cast the FIRST operand to decimal so every product runs in
    # decimal arithmetic — (cnt*ux*uy).cast(decimal) would multiply in
    # int64 first and overflow per-TERM near n~4e6, far below the
    # decimal sum's capacity (review finding, round 6 wave 3)
    cdec = F.col("cnt").cast("decimal(38,0)")
    agg = joined.groupBy("n").agg(
        F.sum(cdec * F.col("ux") * F.col("uy")).alias("sxy"),
        F.sum(cdec * F.col("ux") * F.col("ux")).alias("sxx"),
        F.sum(cdec * F.col("uy") * F.col("uy")).alias("syy"),
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        F.when(
            (F.col("sxx") > 0) & (F.col("syy") > 0),
            F.col("sxy").cast("double")
            / F.sqrt(
                F.col("sxx").cast("double") * F.col("syy").cast("double")
            ),
        ).alias("rho_s"),
    )


def spearman_oracle_sql(src_sql: str, x: str, y: str) -> str:
    """DuckDB twin of :func:`spearman_rho` (sums land in HUGEINT —
    DuckDB's native 128-bit SUM — mirroring the DECIMAL(38,0) path)."""
    return f"""
    WITH src AS ({src_sql}),
    cells AS (
      SELECT {x} AS gx, {y} AS gy, COUNT(*) AS cnt
      FROM src WHERE {x} IS NOT NULL AND {y} IS NOT NULL
      GROUP BY 1, 2
    ),
    nn AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM cells),
    mx AS (
      SELECT gx,
             CAST(2 * COALESCE(SUM(mc) OVER (ORDER BY gx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + mc + 1 AS BIGINT) AS r2x
      FROM (SELECT gx, SUM(cnt) AS mc FROM cells GROUP BY gx)
    ),
    my AS (
      SELECT gy,
             CAST(2 * COALESCE(SUM(mc) OVER (ORDER BY gy
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + mc + 1 AS BIGINT) AS r2y
      FROM (SELECT gy, SUM(cnt) AS mc FROM cells GROUP BY gy)
    ),
    terms AS (
      SELECT c.cnt, nn.n,
             mx.r2x - (nn.n + 1) AS ux,
             my.r2y - (nn.n + 1) AS uy
      FROM cells c JOIN mx USING (gx) JOIN my USING (gy)
      CROSS JOIN nn
    ),
    agg AS (
      SELECT n, SUM(CAST(cnt AS HUGEINT) * ux * uy) AS sxy,
             SUM(CAST(cnt AS HUGEINT) * ux * ux) AS sxx,
             SUM(CAST(cnt AS HUGEINT) * uy * uy) AS syy
      FROM terms GROUP BY n
    )
    SELECT CAST(n AS BIGINT) AS n,
           CASE WHEN sxx > 0 AND syy > 0 THEN
             CAST(sxy AS DOUBLE)
               / sqrt(CAST(sxx AS DOUBLE) * CAST(syy AS DOUBLE))
           END AS rho_s
    FROM agg
    """


# ---------------------------------------------------------------------
# Gini concentration coefficient, exact by domain-rank algebra
# ---------------------------------------------------------------------

def gini_exact(df: DataFrame, value_col: str) -> DataFrame:
    """Exact Gini coefficient of a nonnegative INTEGER measure — the
    corpus-concentration audit (how dominated is the corpus by its
    largest sources/documents?).

    The textbook form needs globally sorted data:
    G = Σ_i (2i − n − 1)·x_(i) / (n·Σx).  Within a block of tied
    values the positions i sum in closed form, so the whole numerator
    collapses onto the value DOMAIN: with B(v) rows strictly below v
    and cnt(v) ties,

        num = Σ_v x_v·cnt_v·(2·B_v + cnt_v − n),   den = n·Σx

    — one hash aggregate to (v, cnt), one cumulative window over the
    domain, no row-level sort.  Sums run in DECIMAL(38,0) (num is
    O(n²·x), past int64 for large corpora); the output is
    ``(n bigint, total bigint, gini double)`` with the single double
    division of two exactly-converted decimals (decimal→double and
    divide are correctly rounded; no libm).  NULL gini when total
    is 0.  Negative values are the caller's bug (Gini is defined on
    nonnegative measures); NULLs are excluded.
    """
    cells = (
        df.select(F.col(value_col).cast("bigint").alias("v"))
        .where(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cells = cells.localCheckpoint(eager=False)
    tot = cells.agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum(F.col("v") * F.col("cnt")).cast("bigint").alias("total"),
    )
    # bounded input: one row per DISTINCT value (domain-sized)
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = cells.select(
        "v",
        "cnt",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("below"),
    )
    agg = ranked.crossJoin(F.broadcast(tot)).agg(
        F.first("n").alias("n"),
        F.first("total").alias("total"),
        # decimal-cast the first operand so the PRODUCT runs in
        # decimal — casting only the result would overflow int64
        # per-term in exactly the large-corpus regime the decimal
        # accumulator exists for (review finding, round 6 wave 3)
        F.sum(
            F.col("v").cast("decimal(38,0)")
            * F.col("cnt")
            * (
                F.lit(2) * F.col("below")
                + F.col("cnt")
                - F.col("n")
            )
        ).alias("num"),
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("total").cast("bigint").alias("total"),
        F.when(
            F.col("total") > 0,
            # the denominator n*total also multiplies in decimal —
            # int64 overflows near n*total ~ 9.2e18 (same review
            # finding); decimal->double is correctly rounded
            F.col("num").cast("double")
            / (
                F.col("n").cast("decimal(38,0)") * F.col("total")
            ).cast("double"),
        ).alias("gini"),
    )


def gini_oracle_sql(src_sql: str, value_col: str) -> str:
    """DuckDB twin of :func:`gini_exact` (sums land in HUGEINT)."""
    return f"""
    WITH src AS ({src_sql}),
    cells AS (
      SELECT CAST({value_col} AS BIGINT) AS v, COUNT(*) AS cnt
      FROM src WHERE {value_col} IS NOT NULL
      GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(SUM(v * cnt) AS BIGINT) AS total
      FROM cells
    ),
    ranked AS (
      SELECT v, cnt,
             COALESCE(SUM(cnt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS below
      FROM cells
    ),
    agg AS (
      SELECT MIN(n) AS n, MIN(total) AS total,
             SUM(CAST(v AS HUGEINT) * cnt * (2 * below + cnt - n)) AS num
      FROM ranked CROSS JOIN tot
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(total AS BIGINT) AS total,
           CASE WHEN total > 0 THEN
             CAST(num AS DOUBLE)
               / CAST(CAST(n AS HUGEINT) * total AS DOUBLE)
           END AS gini
    FROM agg
    """


# ---------------------------------------------------------------------
# Cramér's V — chi-squared effect size on the same fixed-order terms
# ---------------------------------------------------------------------

def cramers_v(
    df: DataFrame,
    col_x: str,
    cats_x: list[str],
    col_y: str,
    cats_y: list[str],
) -> DataFrame:
    """Cramér's V effect size: V = sqrt(chi² / (n·min(r−1, c−1))).

    Chi-squared alone grows with n — at corpus scale EVERYTHING is
    "significant"; V is the scale-free association strength a drift
    gate can threshold.  Reuses :func:`chi2_exprs`'s fixed-textual-
    order terms; the extra math is one division and one correctly-
    rounded sqrt, so the value stays engine-portable.

    Output: one row ``(v double, chi2 double, dof bigint, n bigint)``.
    """
    if min(len(cats_x), len(cats_y)) < 2:
        raise ValueError(
            "cramers_v needs >= 2 categories per dimension "
            "(min(r-1, c-1) would be 0)"
        )
    aggs, formula = chi2_exprs(col_x, cats_x, col_y, cats_y)
    row = df.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        *[F.expr(sql).alias(alias) for alias, sql in aggs],
    )
    dof = (len(cats_x) - 1) * (len(cats_y) - 1)
    kmin = min(len(cats_x) - 1, len(cats_y) - 1)
    return row.select(
        F.expr(
            f"case when n > 0 then sqrt(({formula}) / (n * {kmin})) end"
        ).alias("v"),
        F.expr(formula).alias("chi2"),
        F.lit(dof).cast("bigint").alias("dof"),
        F.col("n").cast("bigint").alias("n"),
    )


def cramers_v_oracle_sql(
    table: str,
    col_x: str,
    cats_x: list[str],
    col_y: str,
    cats_y: list[str],
) -> str:
    """DuckDB twin of :func:`cramers_v` (same textual formula)."""
    aggs, formula = chi2_exprs(col_x, cats_x, col_y, cats_y)
    agg_sql = ", ".join(f"{sql} AS {alias}" for alias, sql in aggs)
    dof = (len(cats_x) - 1) * (len(cats_y) - 1)
    kmin = min(len(cats_x) - 1, len(cats_y) - 1)
    return f"""
    WITH cells AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n, {agg_sql} FROM {table}
    )
    SELECT CASE WHEN n > 0
                THEN sqrt(({formula}) / (n * {kmin})) END AS v,
           {formula} AS chi2,
           CAST({dof} AS BIGINT) AS dof,
           CAST(n AS BIGINT) AS n
    FROM cells
    """


# ---------------------------------------------------------------------
# Lorenz curve points, exact by tie-block interpolation on the domain
# ---------------------------------------------------------------------

def lorenz_points(
    df: DataFrame, value_col: str, n_bands: int = 10
) -> DataFrame:
    """Exact Lorenz curve L(k/B) for k = 1..B over a nonnegative
    INTEGER measure — the curve behind :func:`gini_exact` ("the
    poorest p of documents hold L(p) of the tokens").

    For band k the boundary sits at row n_k = ⌊n·k/B⌋ of the sorted
    data.  That row falls inside ONE tie block of the value DOMAIN,
    and every row in a block carries the same value v, so the
    cumulative mass at the boundary is EXACT without sorting rows:

        L_num(k) = mass_below(block) + (n_k − rows_below(block))·v
        L_den    = total mass

    Output: B rows ``(band, n_k, l_num, l_den)`` — all BIGINT; the
    share is l_num/l_den downstream.  Bands whose boundary is row 0
    report 0 mass.  Same scale shape as gini_exact: one hash
    aggregate to the domain, one domain-sized cumulative window, the
    B-row band spine broadcast onto it.
    """
    spark = df.sparkSession
    cells = (
        df.select(F.col(value_col).cast("bigint").alias("v"))
        .where(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cells = cells.localCheckpoint(eager=False)
    tot = cells.agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum(
            F.col("v").cast("decimal(38,0)") * F.col("cnt")
        ).cast("decimal(38,0)").alias("total"),
    )
    # bounded input: one row per DISTINCT value (domain-sized)
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = cells.select(
        "v",
        "cnt",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("rows_below"),
        F.coalesce(
            F.sum(
                F.col("v").cast("decimal(38,0)") * F.col("cnt")
            ).over(w),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("mass_below"),
    )
    bands = spark.range(1, n_bands + 1).select(
        F.col("id").cast("int").alias("band")
    )
    joined = F.broadcast(bands).crossJoin(F.broadcast(tot)).join(
        ranked,
        (
            (F.col("rows_below") < F.expr(f"(n * band) div {n_bands}"))
            & (
                F.expr(f"(n * band) div {n_bands}")
                <= F.col("rows_below") + F.col("cnt")
            )
        ),
        "left",
    )
    return joined.select(
        "band",
        F.expr(f"(n * band) div {n_bands}")
        .cast("bigint")
        .alias("n_k"),
        F.coalesce(
            F.col("mass_below")
            + (
                F.expr(f"(n * band) div {n_bands}") - F.col("rows_below")
            ).cast("decimal(38,0)")
            * F.col("v"),
            F.lit(0).cast("decimal(38,0)"),
        )
        .cast("bigint")
        .alias("l_num"),
        F.col("total").cast("bigint").alias("l_den"),
    ).orderBy("band")


def lorenz_oracle_sql(
    src_sql: str, value_col: str, n_bands: int = 10
) -> str:
    """DuckDB twin of :func:`lorenz_points`."""
    return f"""
    WITH src AS ({src_sql}),
    cells AS (
      SELECT CAST({value_col} AS BIGINT) AS v, COUNT(*) AS cnt
      FROM src WHERE {value_col} IS NOT NULL
      GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n,
             SUM(CAST(v AS HUGEINT) * cnt) AS total
      FROM cells
    ),
    ranked AS (
      SELECT v, cnt,
             COALESCE(SUM(cnt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS rows_below,
             COALESCE(SUM(CAST(v AS HUGEINT) * cnt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS mass_below
      FROM cells
    ),
    bands AS (SELECT UNNEST(generate_series(1, {n_bands})) AS band)
    SELECT band,
           CAST((n * band) // {n_bands} AS BIGINT) AS n_k,
           CAST(COALESCE(
             mass_below + ((n * band) // {n_bands} - rows_below) * v,
             0) AS BIGINT) AS l_num,
           CAST(total AS BIGINT) AS l_den
    FROM bands CROSS JOIN tot
    LEFT JOIN ranked
      ON rows_below < (n * band) // {n_bands}
     AND (n * band) // {n_bands} <= rows_below + cnt
    ORDER BY band
    """


# ---------------------------------------------------------------------
# Wilcoxon signed-rank test (paired samples)
# ---------------------------------------------------------------------

# e-notation literals: a bare 2.0 parses as DECIMAL(2,1) in Spark
# (decimal-division rescale path) but DOUBLE in DuckDB; 2e0 is DOUBLE
# in both engines (the stat_runs_test convention).
_WX_Z = (
    "(w_plus_x2 / 2e0 - np * (np + 1e0) / 4e0) / "
    "sqrt(np * (np + 1e0) * (2e0 * np + 1e0) / 24e0 - ties / 48e0)"
)


def wilcoxon_signed_rank(df: DataFrame, diff_col: str) -> DataFrame:
    """Wilcoxon signed-rank statistic over EXACT-INTEGER paired
    differences — the paired-samples sibling of
    :func:`mannwhitney_u`, completing the nonparametric battery
    (KS / MWU / Kendall / Spearman / Wilcoxon).

    Standard zero-handling: zero differences are dropped (Wilcoxon
    1945); ties in |diff| take average ranks, carried DOUBLED so every
    rank sum stays an exact integer (the mannwhitney trick — per
    distinct |d| block the doubled average rank is
    ``2·cum_prev + t + 1`` and the positive side contributes
    ``cpos`` of them). Tie correction Σ(t³−t) accumulates in
    DECIMAL(38,0).

    Scale shape: ONE hash aggregate onto the |diff| value DOMAIN, a
    domain-sized cumulative window (post-agg, bounded — the ks/mwu
    allowlist pattern), one final reduce. Caller supplies integer
    diffs (e.g. cents), which also bounds the domain.

    Output one row: ``(n_pairs, n_zero, w_plus_x2, w_minus_x2,
    tie_term, z)`` — the doubled rank sums and tie term exact
    BIGINTs, z the shared-formula double.
    """
    d = F.col(diff_col)
    counts = (
        df.where(d.isNotNull() & (d != 0))
        .groupBy(F.abs(d).alias("ad"))
        .agg(
            F.count(F.lit(1)).alias("t"),
            F.count(F.when(d > 0, 1)).alias("cpos"),
        )
    )
    # bounded input: one row per DISTINCT |diff| (post-agg domain)
    w = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, -1)
    td = F.col("t").cast("decimal(18,0)")
    cum = counts.select(
        "t",
        "cpos",
        F.coalesce(F.sum("t").over(w), F.lit(0)).alias("cum_prev"),
    )
    zeros = df.where(d.isNotNull() & (d == 0)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_zero")
    )
    agg = cum.agg(
        F.sum("t").cast("bigint").alias("n_pairs"),
        F.sum(
            (F.col("cpos") * (2 * F.col("cum_prev") + F.col("t") + 1)).cast(
                "decimal(38,0)"
            )
        )
        .cast("bigint")
        .alias("w_plus_x2"),
        F.sum(td * td * td - td).cast("bigint").alias("tie_term"),
    )
    return agg.crossJoin(zeros).select(
        "n_pairs",
        "n_zero",
        "w_plus_x2",
        (
            F.col("n_pairs") * (F.col("n_pairs") + 1) - F.col("w_plus_x2")
        ).alias("w_minus_x2"),
        "tie_term",
        F.expr(
            _WX_Z.replace("np", "cast(n_pairs as double)").replace(
                "ties", "cast(tie_term as double)"
            )
        ).alias("z"),
    )


def wilcoxon_oracle_sql(pairs_sql: str, diff_col: str) -> str:
    """DuckDB twin of :func:`wilcoxon_signed_rank` over ``pairs_sql``."""
    z = _WX_Z.replace("np", "CAST(n_pairs AS DOUBLE)").replace(
        "ties", "CAST(tie_term AS DOUBLE)"
    )
    return f"""
    WITH wx_pairs AS ({pairs_sql}),
    wx_counts AS (
      SELECT ABS({diff_col}) AS ad,
             COUNT(*) AS t,
             COUNT(*) FILTER ({diff_col} > 0) AS cpos
      FROM wx_pairs
      WHERE {diff_col} IS NOT NULL AND {diff_col} <> 0
      GROUP BY 1
    ),
    wx_cum AS (
      SELECT t, cpos,
             COALESCE(SUM(t) OVER (ORDER BY ad
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_prev
      FROM wx_counts
    ),
    wx_zero AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_zero FROM wx_pairs
      WHERE {diff_col} = 0
    ),
    wx_agg AS (
      SELECT CAST(SUM(t) AS BIGINT) AS n_pairs,
             CAST(SUM(CAST(cpos * (2 * cum_prev + t + 1)
                  AS DECIMAL(38,0))) AS BIGINT) AS w_plus_x2,
             CAST(SUM(CAST(t AS DECIMAL(18,0)) * CAST(t AS DECIMAL(18,0))
                  * CAST(t AS DECIMAL(18,0)) - CAST(t AS DECIMAL(18,0)))
                  AS BIGINT) AS tie_term
      FROM wx_cum
    )
    SELECT n_pairs, n_zero, w_plus_x2,
           CAST(n_pairs * (n_pairs + 1) - w_plus_x2 AS BIGINT)
             AS w_minus_x2,
           tie_term,
           {z} AS z
    FROM wx_agg CROSS JOIN wx_zero
    """


# ---------------------------------------------------------------------
# Shared per-group lower-median selection over value-domain cells
# ---------------------------------------------------------------------

def group_kth_from_cells(
    cells: DataFrame,
    group_col: str = "g",
    val_col: str = "v",
    cnt_col: str = "cnt",
) -> DataFrame:
    """Lower median (the ``(n+1)//2``-th smallest) per group from a
    ``(group, value, count)`` CELL table — the shared rank-interval
    selection behind :func:`~...queries50.q_stat_mad` (twice: median
    and MAD) and ``q_stat_levene``; hoisted here so the five former
    copies stay in sync (round-8 review finding).

    The value DOMAIN carries the cumulative window (group-partitioned,
    bounded, no row sort): the selected value is the one whose
    ``(below, below+cnt]`` rank interval contains k. Output:
    ``(group_col, med, n)`` — exact integers.
    """
    wb = (
        Window.partitionBy(group_col)
        .orderBy(val_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wg = Window.partitionBy(group_col)
    cum = cells.select(
        group_col,
        val_col,
        cnt_col,
        F.coalesce(F.sum(cnt_col).over(wb), F.lit(0)).alias("__below"),
        F.sum(cnt_col).over(wg).alias("__n"),
    )
    k = F.expr("(__n + 1) div 2")
    return (
        cum.where(
            (F.col("__below") < k)
            & (k <= F.col("__below") + F.col(cnt_col))
        )
        .groupBy(group_col)
        .agg(
            F.max(val_col).alias("med"), F.max("__n").alias("n")
        )
    )


def group_kth_cells_sql(
    cells_sql: str,
    group_col: str = "g",
    val_col: str = "v",
    cnt_col: str = "cnt",
) -> str:
    """DuckDB twin of :func:`group_kth_from_cells` over ``cells_sql``
    (a query producing (group, value, count) rows). Returns SQL
    selecting ``(group_col, med, n)``."""
    return f"""
      SELECT {group_col}, MAX({val_col}) AS med, MAX(n) AS n FROM (
        SELECT {group_col}, {val_col}, {cnt_col},
               COALESCE(SUM({cnt_col}) OVER (PARTITION BY {group_col}
                 ORDER BY {val_col} ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), 0) AS below,
               SUM({cnt_col}) OVER (PARTITION BY {group_col}) AS n
        FROM ({cells_sql})
      ) WHERE below < (n + 1) // 2 AND (n + 1) // 2 <= below + {cnt_col}
      GROUP BY {group_col}
    """
