"""Declarative data-quality validation over DataFrames.

A rule set compiles to ONE aggregate pass (conditional counts — no
per-rule scans): a single ``agg`` computes every violation count plus
the row total, and the 1-row result is unpivoted with ``stack`` into
one output row per rule. This is the expectations layer a production
ingestion pipeline runs before publishing a partition; at 100 TB the
single-pass shape matters — N rules cost one scan, not N.

The referential-integrity check is likewise lazy and single-job: a
left join against the (broadcastable) dimension keys feeds a
conditional count — no eager ``.count()`` actions, and it composes
with ``check_rules`` via ``referential_rule`` so fact-table rules AND
the FK check share one scan of the fact table.

Each rule is (name, violation_predicate Column). Output one row per
rule: (rule, n_violations, n_rows, violation_rate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def check_rules(df: DataFrame, rules: list[tuple[str, Column]]) -> DataFrame:
    """Evaluate violation predicates in a single aggregate pass.

    ``rules``: list of (rule_name, predicate) where the predicate is
    TRUE for a VIOLATING row. Returns (rule, n_violations, n_rows,
    violation_rate) — rate as an exact integer-division double.

    Plan shape: one scan + one partial/final agg producing a single
    row, then a ``stack`` unpivot of that row (no re-execution of the
    aggregate per rule, which a naive union-of-selects would cause).
    """
    if not rules:
        raise ValueError("check_rules requires at least one rule")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for name, pred in rules:
        aggs.append(
            F.sum(pred.cast("long")).cast("bigint").alias(f"__v_{name}")
        )
    row = df.agg(*aggs)
    pairs: list[Column] = []
    for name, _ in rules:
        pairs.append(F.lit(name))
        pairs.append(F.coalesce(F.col(f"__v_{name}"), F.lit(0)))
    return row.select(
        F.stack(F.lit(len(rules)), *pairs).alias("rule", "n_violations"),
        F.col("__n").alias("n_rows"),
    ).select(
        "rule",
        "n_violations",
        "n_rows",
        (F.col("n_violations").cast("double") / F.col("n_rows")).alias(
            "violation_rate"
        ),
    )


def referential_rule(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    hit_col: str = "__ref_hit",
) -> tuple[DataFrame, Column]:
    """Stage a referential-integrity check as a check_rules rule.

    Left-joins the fact against the distinct (broadcast) dimension
    keys and returns (joined_fact, violation_predicate) so the FK
    check rides the SAME single aggregate scan as the other rules.
    The join preserves fact cardinality (dim keys deduplicated).
    """
    keys = (
        dim.select(F.col(dim_key).alias(fact_key))
        .distinct()
        .withColumn(hit_col, F.lit(1))
    )
    joined = fact.join(F.broadcast(keys), fact_key, "left")
    return joined, F.col(hit_col).isNull()


def check_referential(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    rule_name: str = "referential",
) -> DataFrame:
    """Count fact rows whose key has no match in the dimension.

    Lazy, single-job shape: broadcast the distinct dimension keys,
    left-join, and take one conditional-count aggregate — never an
    eager ``.count()`` on the driver, never a row explosion (the join
    is at-most-one-match because the dim side is deduplicated).
    """
    joined, violated = referential_rule(fact, fact_key, dim, dim_key)
    return check_rules(joined, [(rule_name, violated)])


def diagnose_skew(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
) -> DataFrame:
    """Join-key skew audit: the top-``k`` heaviest keys with their share
    of rows and the ratio to a perfectly uniform key.

    The pre-flight check before choosing a join strategy at scale —
    a max_share ≳ 1% of a 1000-partition shuffle means one straggler
    task; ratio-to-uniform ≫ 1 says salt this key or let AQE split it.
    ONE count aggregate + deterministic top-k; the distinct-key count
    rides the same aggregate (no second scan).

    Output: (key string, n_rows, share, ratio_to_uniform) — share and
    ratio as exact cross-multiplied doubles, rounded to 9 dp.
    """
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    # bounded input: one row per distinct key (post-agg domain) — the
    # global window never sees the corpus
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    tot = counts.select(
        "key",
        "n_rows",
        F.sum("n_rows").over(wt).alias("n_total"),
        F.count(F.lit(1)).over(wt).alias("n_keys"),
    )
    return (
        tot.orderBy(F.col("n_rows").desc(), F.col("key"))
        .limit(top_k)
        .select(
            "key",
            F.col("n_rows").cast("bigint").alias("n_rows"),
            # floor(x*1e9+0.5)/1e9, not round(x, 9): round's dp rescale
            # path differs between engines on identical doubles
            # (BigDecimal vs double rescale) — the floor form is the
            # same IEEE sequence everywhere.
            F.expr(
                "floor(cast(n_rows as double) / cast(n_total as double)"
                " * 1e9 + 0.5d) / 1e9"
            ).alias("share"),
            F.expr(
                "floor(cast(n_rows * n_keys as double)"
                " / cast(n_total as double) * 1e9 + 0.5d) / 1e9"
            ).alias("ratio_to_uniform"),
        )
    )


def skew_oracle_sql(table: str, key_col: str, top_k: int = 10) -> str:
    return f"""
    WITH counts AS (
      SELECT CAST({key_col} AS VARCHAR) AS key, COUNT(*) AS n_rows
      FROM {table} GROUP BY 1
    ), tot AS (
      SELECT key, n_rows, SUM(n_rows) OVER () AS n_total,
             COUNT(*) OVER () AS n_keys,
             ROW_NUMBER() OVER (ORDER BY n_rows DESC, key) AS rn
      FROM counts
    )
    SELECT key, CAST(n_rows AS BIGINT) AS n_rows,
           FLOOR(CAST(n_rows AS DOUBLE) / CAST(n_total AS DOUBLE)
                 * 1e9 + 5e-1) / 1e9 AS share,
           FLOOR(CAST(n_rows * n_keys AS DOUBLE)
                 / CAST(n_total AS DOUBLE) * 1e9 + 5e-1) / 1e9
             AS ratio_to_uniform
    FROM tot WHERE rn <= {top_k}
    """


def expectation_suite(
    df: DataFrame,
    expectations: list[tuple[str, str, dict]],
) -> DataFrame:
    """Declarative data-expectation runner (the SmartDataLakeBuilder
    `expectations` concept, Spark-first): every expectation compiles
    into ONE aggregate pass — one scan for all row-local kinds plus the
    distinct counts the ``unique`` kind needs, never a job per
    expectation.

    ``expectations``: (name, kind, params) with kinds

    - ``not_null``:   {"col"}                   — no NULLs
    - ``between``:    {"col", "lo", "hi"}       — all values in range
    - ``matches``:    {"col", "regex"}          — all values match
    - ``in_set``:     {"col", "values"}         — all values in set
    - ``unique``:     {"col"}                   — no duplicate values
    - ``row_count``:  {"lo", "hi"}              — table size in range

    Output: (expectation, kind, passed, n_bad, n_rows) — ``n_bad`` is
    the violating-row count (or excess duplicates for ``unique``, or 0
    /1 distance for ``row_count``).
    """
    if not expectations:
        raise ValueError("expectation_suite requires expectations")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for name, kind, p in expectations:
        if kind == "not_null":
            bad = F.col(p["col"]).isNull()
        elif kind == "between":
            c = F.col(p["col"])
            bad = ~c.between(p["lo"], p["hi"]) | c.isNull()
        elif kind == "matches":
            c = F.col(p["col"])
            bad = c.isNull() | ~c.rlike(p["regex"])
        elif kind == "in_set":
            c = F.col(p["col"])
            bad = c.isNull() | ~c.isin(*p["values"])
        elif kind == "unique":
            aggs.append(
                (
                    F.count(F.col(p["col"]))
                    - F.countDistinct(F.col(p["col"]))
                )
                .cast("bigint")
                .alias(f"__b_{name}")
            )
            continue
        elif kind == "row_count":
            aggs.append(
                F.when(
                    F.count(F.lit(1)).between(p["lo"], p["hi"]), 0
                )
                .otherwise(1)
                .cast("bigint")
                .alias(f"__b_{name}")
            )
            continue
        else:
            raise ValueError(f"unknown expectation kind: {kind}")
        aggs.append(F.sum(bad.cast("long")).cast("bigint").alias(f"__b_{name}"))
    row = df.agg(*aggs)
    pairs: list[Column] = []
    for name, kind, _ in expectations:
        pairs.append(F.lit(name))
        pairs.append(F.lit(kind))
        pairs.append(F.coalesce(F.col(f"__b_{name}"), F.lit(0)))
    return row.select(
        F.stack(
            F.lit(len(expectations)), *pairs
        ).alias("expectation", "kind", "n_bad"),
        F.col("__n").alias("n_rows"),
    ).select(
        "expectation",
        "kind",
        (F.col("n_bad") == 0).alias("passed"),
        "n_bad",
        "n_rows",
    )


def observe_quality(
    df: DataFrame,
    name: str,
    rules: list[tuple[str, Column]],
):
    """Attach zero-cost quality counters to a DataFrame via Spark's
    native ``Observation`` (CollectMetrics): violation counts ride the
    NEXT action on ``df`` — no extra scan, no extra job, executor-side
    accumulation only.  The in-flight twin of :func:`check_rules`
    (same (name, violation-predicate) contract): check_rules is the
    standalone audit pass, observe_quality instruments a pipeline that
    is running anyway.

    Returns ``(instrumented_df, observation)``; after any action on
    the instrumented frame, ``observation.get`` yields
    ``{"n_rows": ..., "v_<rule>": ...}``.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(pred.cast("long")).alias(f"v_{rname}")
        for rname, pred in rules
    ]
    return df.observe(obs, *metrics), obs


# ---------------------------------------------------------------------
# Benford first-digit audit (exact fixed-point form)
# ---------------------------------------------------------------------

# log10(1 + 1/d) in e6 fixed point — published constants of Benford's
# law (literals, never computed: log10 is libm and not hash-portable)
BENFORD_E6: tuple[int, ...] = (
    301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757,
)


def benford_audit(df: DataFrame, amount_col: str) -> DataFrame:
    """First-significant-digit distribution of a positive amount
    column against Benford's law — the classic fabricated-data /
    unit-mix-up audit for financial-ish measures.

    The first digit is taken from the DECIMAL STRING of the floored
    integer amount (``substr(cast(floor(x) as bigint) as string, 1, 1)``)
    — pure integer/string ops, no log10, so both engines agree
    bit-for-bit. Rows with amount < 1 are excluded (their first
    significant digit needs log scaling).

    Output: 9 rows ``(digit, cnt, total, observed_e6, expected_e6,
    dev_e6)`` — observed share in e6 fixed point (positive intdiv,
    portable), expected from the published constants, dev their
    difference. All exact integers; the MAD / chi-square style
    roll-up is one driver-side fold over 9 rows.

    Scale shape: one row-local projection + one 9-group hash
    aggregate (map-side combinable); the digit spine is a 9-row
    literal table so digits absent from the data still report 0.
    """
    spark = df.sparkSession
    spine = spark.createDataFrame(
        [(d, BENFORD_E6[d - 1]) for d in range(1, 10)],
        "digit int, expected_e6 bigint",
    )
    digits = (
        df.where(F.col(amount_col) >= 1)
        .select(
            F.expr(
                f"cast(substr(cast(cast(floor({amount_col}) as bigint)"
                " as string), 1, 1) as int)"
            ).alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = digits.agg(F.sum("cnt").cast("bigint").alias("total"))
    return (
        F.broadcast(spine)
        .join(digits, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce("cnt", F.lit(0)).cast("bigint").alias("cnt"),
            "total",
            F.expr("(coalesce(cnt, 0) * 1000000) div total")
            .cast("bigint")
            .alias("observed_e6"),
            "expected_e6",
            (
                F.expr("(coalesce(cnt, 0) * 1000000) div total")
                - F.col("expected_e6")
            )
            .cast("bigint")
            .alias("dev_e6"),
        )
    )


def benford_oracle_sql(src_sql: str, amount_col: str) -> str:
    """DuckDB twin of :func:`benford_audit` over ``src_sql``."""
    spine = " UNION ALL ".join(
        f"SELECT {d} AS digit, CAST({BENFORD_E6[d-1]} AS BIGINT)"
        " AS expected_e6"
        for d in range(1, 10)
    )
    return f"""
    WITH src AS ({src_sql}),
    spine AS ({spine}),
    digits AS (
      SELECT CAST(SUBSTR(CAST(CAST(FLOOR({amount_col}) AS BIGINT)
               AS VARCHAR), 1, 1) AS INT) AS digit,
             COUNT(*) AS cnt
      FROM src WHERE {amount_col} >= 1
      GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM digits)
    SELECT s.digit,
           CAST(COALESCE(d.cnt, 0) AS BIGINT) AS cnt,
           t.total,
           CAST((COALESCE(d.cnt, 0) * 1000000) // t.total AS BIGINT)
             AS observed_e6,
           s.expected_e6,
           CAST((COALESCE(d.cnt, 0) * 1000000) // t.total
                - s.expected_e6 AS BIGINT) AS dev_e6
    FROM spine s
    LEFT JOIN digits d USING (digit)
    CROSS JOIN tot t
    """
