"""t2 query registry, batch 22: drift / two-sample test statistics.

Registered into the shared registry (imported from queries18 at module
end). Same determinism rules as the queries.py docstring.

The data-drift gate of a training-data pipeline (operators/stats.py):
before a new crawl snapshot joins the corpus, its distributions are
compared to the reference with classical statistics — each in ONE scan
from EXACT integer/decimal sums, final double arithmetic textually
identical to the DuckDB oracle (no libm beyond sqrt):

- ``stat_ks_test``: two-sample Kolmogorov–Smirnov D over quantized
  price (returned vs non-returned lineitems) — cumulative counts over
  the *domain*, integer cross-multiplied numerator.
- ``stat_tvd_drift``: total variation distance of the order-priority
  mix, 1990s orders vs later — the categorical drift score.
- ``stat_chi_squared``: returnflag × linestatus independence, a
  fixed-order sum over the enumerated contingency cells.
- ``stat_ttest``: Welch's t on event value, purchase vs view.
- ``stat_linreg``: per-returnflag OLS of extendedprice ~ quantity
  (slope/intercept/r2 from exact scaled power sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_extensions_spark.queries import _register, _t
from spark_extensions_spark.operators.stats import (
    chi2_oracle_sql,
    chi_squared,
    group_ols,
    ks_oracle_sql,
    ks_statistic,
    ols_oracle_sql,
    tvd_drift,
    tvd_oracle_sql,
    welch_oracle_sql,
    welch_ttest,
)


@_register(
    "stat_ks_test",
    ks_oracle_sql("lineitem", "l_extendedprice", "l_returnflag", "R", "N", 0),
    doc="Two-sample KS D statistic (operators/stats.py:ks_statistic): "
    "price distribution of returned vs non-returned lineitems, "
    "quantized to whole dollars so the cumulative window runs over the "
    "bounded value DOMAIN, not the data. One scan + domain-sized "
    "window; numerator exact integer cross-multiplication, one double "
    "division at the end.",
)
def q_stat_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return ks_statistic(li, "l_extendedprice", "l_returnflag", "R", "N", 0)


@_register(
    "stat_tvd_drift",
    tvd_oracle_sql(
        "orders", "o_orderpriority", "o_orderdate < DATE '1998-01-01'"
    ),
    doc="Total variation distance of the order-priority mix between "
    "pre-1998 and later orders (operators/stats.py:tvd_drift) — the "
    "categorical drift score of an ingest gate. Exact integer "
    "numerator sum(|ca*n_b - cb*n_a|), one division; one scan, one "
    "bucket hash-agg.",
)
def q_stat_tvd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")["orders"]
    return tvd_drift(
        orders,
        "o_orderpriority",
        F.col("o_orderdate") < F.lit("1998-01-01").cast("date"),
    )


_CHI_X = ["A", "N", "R"]
_CHI_Y = ["F", "O"]


@_register(
    "stat_chi_squared",
    chi2_oracle_sql(
        "lineitem", "l_returnflag", _CHI_X, "l_linestatus", _CHI_Y
    ),
    doc="Chi-squared independence statistic over the returnflag × "
    "linestatus contingency table (operators/stats.py:chi_squared): "
    "conditional counts in ONE aggregate row, then a FIXED-ORDER sum "
    "of the 6 enumerated (o-e)^2/e terms — order-free integer inputs, "
    "textually shared double formula.",
)
def q_stat_chi_squared(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return chi_squared(li, "l_returnflag", _CHI_X, "l_linestatus", _CHI_Y)


@_register(
    "stat_ttest",
    welch_oracle_sql("events", "value", "event_type", "purchase", "view"),
    doc="Welch's two-sample t statistic on event value, purchase vs "
    "view (operators/stats.py:welch_ttest): integer-scaled exact "
    "DECIMAL sums/sum-squares in one scan; t from the shared "
    "sqrt-formula (correctly rounded, engine-portable).",
)
def q_stat_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")["events"]
    return welch_ttest(ev, "value", "event_type", "purchase", "view")


@_register(
    "stat_linreg",
    ols_oracle_sql(
        "lineitem", "l_returnflag", "l_quantity", "l_extendedprice"
    ),
    doc="Per-returnflag OLS of extendedprice ~ quantity "
    "(operators/stats.py:group_ols): slope/intercept/r2 from exact "
    "integer-scaled power sums — one scan, one grouped hash-agg, "
    "shared final double formula rounded to 9 dp.",
)
def q_stat_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return group_ols(li, "l_returnflag", "l_quantity", "l_extendedprice")

from spark_extensions_spark import queries20  # noqa: E402,F401  (registration side effect)
