"""Privacy risk auditing: k-anonymity / l-diversity over DataFrames.

Before a dataset ships to training or an external party, the release
gate asks: how re-identifiable is each row from its quasi-identifiers
(the attacker-observable columns), and how much does a matched class
leak about the sensitive column? The standard measures (Sweeney 2002,
"k-Anonymity: a model for protecting privacy"; Machanavajjhala et al.
2006, "l-Diversity") reduce to one hash aggregate over the
quasi-identifier tuple:

- a table is k-anonymous iff every equivalence class (distinct
  quasi-identifier combination) contains ≥ k rows;
- a class is l-diverse iff its sensitive column takes ≥ l distinct
  values (a k-large class with ONE sensitive value still leaks).

Scale shape: one scan + one groupBy on the quasi columns (map-side
partial aggregation collapses the long Zipf tail before the shuffle);
the summary is a second aggregate over class-level rows — vocabulary-
sized, trivial. No driver state, no window over the whole table.

Reference scope note: the reference library has no privacy surface;
this belongs to the LLM-data-pipeline extension layer (SURVEY.md §7
M5 — release gating). Fully SQL-expressible → exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_classes(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
    l: int = 2,
) -> DataFrame:
    """Per-equivalence-class anonymity audit.

    One row per distinct quasi-identifier combination:
    (quasi..., class_size, n_sensitive, k_ok, l_ok). ``class_size`` is
    the k-anonymity level of every row in the class; ``n_sensitive``
    its l-diversity (distinct-count of the sensitive column).
    """
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("class_size"),
            F.countDistinct(F.col(sensitive_col))
            .cast("bigint")
            .alias("n_sensitive"),
        )
        .select(
            *quasi_cols,
            "class_size",
            "n_sensitive",
            (F.col("class_size") >= k).alias("k_ok"),
            (F.col("n_sensitive") >= l).alias("l_ok"),
        )
    )


def k_anonymity_summary(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
    l: int = 2,
) -> DataFrame:
    """Table-level release-gate verdict in one row.

    (n_rows, n_classes, min_class_size, n_rows_at_risk — rows in
    classes below k, min_l — worst l-diversity, k_anonymous, l_diverse).
    ``min_class_size`` IS the table's k-anonymity; the gate passes iff
    both flags are true. Two chained aggregates (class level → table
    level), one corpus scan total.
    """
    cls = k_anonymity_classes(df, quasi_cols, sensitive_col, k, l)
    return cls.agg(
        F.sum("class_size").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("class_size").cast("bigint").alias("min_class_size"),
        F.sum(
            F.when(F.col("class_size") < k, F.col("class_size")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("n_rows_at_risk"),
        F.min("n_sensitive").cast("bigint").alias("min_l"),
    ).select(
        "n_rows",
        "n_classes",
        "min_class_size",
        "n_rows_at_risk",
        "min_l",
        (F.col("min_class_size") >= k).alias("k_anonymous"),
        (F.col("min_l") >= l).alias("l_diverse"),
    )


def k_anonymity_classes_oracle_sql(
    table_sql: str,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
    l: int = 2,
) -> str:
    q = ", ".join(quasi_cols)
    return f"""
    SELECT {q},
           CAST(COUNT(*) AS BIGINT) AS class_size,
           CAST(COUNT(DISTINCT {sensitive_col}) AS BIGINT) AS n_sensitive,
           COUNT(*) >= {k} AS k_ok,
           COUNT(DISTINCT {sensitive_col}) >= {l} AS l_ok
    FROM {table_sql} GROUP BY {q}
    """


def k_anonymity_summary_oracle_sql(
    table_sql: str,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
    l: int = 2,
) -> str:
    inner = k_anonymity_classes_oracle_sql(
        table_sql, quasi_cols, sensitive_col, k, l
    )
    return f"""
    WITH cls AS ({inner})
    SELECT CAST(SUM(class_size) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(MIN(class_size) AS BIGINT) AS min_class_size,
           CAST(SUM(CASE WHEN class_size < {k} THEN class_size ELSE 0 END)
                AS BIGINT) AS n_rows_at_risk,
           CAST(MIN(n_sensitive) AS BIGINT) AS min_l,
           MIN(class_size) >= {k} AS k_anonymous,
           MIN(n_sensitive) >= {l} AS l_diverse
    FROM cls
    """


# ---------------------------------------------------------------------
# PII detection (pre-training release gate)
# ---------------------------------------------------------------------

# Pattern classes shared with the scrub pass
# (functions/text.py:pii_redact / PII_EMAIL..PII_CC — one source of
# truth so audit counts and redaction always agree), plus IPv4 which is
# audited but not scrubbed.  All stay inside the Java-regex ∩ RE2
# common subset (no lookaround, no backreferences) so Spark and DuckDB
# match identically.
def _pii_patterns() -> tuple[tuple[str, str], ...]:
    from spark_extensions_spark.functions.text import (
        PII_CC,
        PII_EMAIL,
        PII_IPV4,
        PII_PHONE,
        PII_SSN,
    )

    return (
        ("email", PII_EMAIL),
        ("cc", PII_CC),
        ("ssn", PII_SSN),
        ("phone", PII_PHONE),
        ("ipv4", PII_IPV4),
    )


def pii_scan(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document PII hit counts, one column per pattern class.

    The audit half of the release gate: before a crawl ships to
    training, count how much personally-identifiable text survives
    curation (the C4/RefinedWeb-style PII pass; the scrub half is
    ``functions/text.py:pii_redact``, exercised by the
    ``text_pii_redact`` query).  Entirely row-local regexp built-ins —
    zero shuffle, codegen'd JVM regex; at 100 TB this is a pure map
    over the corpus scan.

    Output: ``(id, n_email, n_cc, n_ssn, n_phone, n_ipv4,
    n_pii_total bigint)``.
    """
    pats = _pii_patterns()
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        .cast("bigint")
        .alias(f"n_{name}")
        for name, pat in pats
    ]
    out = df.select(F.col(id_col), *counts)
    total = None
    for name, _ in pats:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.withColumn("n_pii_total", total.cast("bigint"))


def pii_scan_oracle_sql(table_sql: str, id_col: str, text_col: str) -> str:
    """DuckDB twin of :func:`pii_scan` (same patterns, RE2 side)."""
    counts = ",\n           ".join(
        "CAST(LEN(regexp_extract_all({t}, '{p}')) AS BIGINT) AS n_{n}".format(
            t=text_col, p=p.replace("'", "''"), n=n
        )
        for n, p in _pii_patterns()
    )
    total = " + ".join(f"n_{n}" for n, _ in _pii_patterns())
    return f"""
    WITH hits AS (
      SELECT {id_col},
           {counts}
      FROM {table_sql}
    )
    SELECT *, CAST({total} AS BIGINT) AS n_pii_total FROM hits
    """


# ---------------------------------------------------------------------
# t-closeness (Li, Li & Venkatasubramanian, ICDE 2007) — exact TVD
# ---------------------------------------------------------------------

def t_closeness_classes(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t_e6: int = 200_000,
) -> DataFrame:
    """Per-equivalence-class t-closeness audit with EXACT arithmetic.

    t-closeness bounds the total-variation distance between each
    class's sensitive-value distribution and the table-wide one:
    TVD(c) = ½ Σ_v |n_cv/N_c − n_v/N|.  Clearing denominators keeps
    it integral:

        tvd_num(c) = Σ_{v∈c} |n_cv·N − n_v·N_c|
                     + N_c·(N − Σ_{v∈c} n_v)        (absent values)
        tvd_den(c) = 2·N_c·N,     TVD = tvd_num / tvd_den

    — the absent-value fold means the sensitive DOMAIN is never
    densified per class.  The gate compares cross-multiplied in
    DECIMAL(38,0) (1e6·tvd_num ≤ t_e6·tvd_den overflows int64 once
    N_c·N > ~4.6·10¹², far below the count math's own bound — review
    finding, round 6 wave 3).  Counts are exact while N < ~3·10⁹
    (n_cv·N must fit int64); shard or lift to DECIMAL beyond.

    NULL handling: a NULL sensitive value is a CATEGORY (its mass
    shapes every class's distribution) and a NULL quasi value is a
    CLASS — both computed via windows over the joint cells, whose
    NULL keys fall into a single partition (null-safe grouping), so
    no null-unsafe join can drop them (review finding: the original
    equi-join silently discarded all-NULL classes from the audit).

    Output: one row per class ``(quasi..., class_size, tvd_num,
    tvd_den, t_ok)`` — all BIGINT + boolean.

    Scale shape: one (quasi, sensitive) hash aggregate over the data,
    then two PARTITIONED windows over the joint-cell table (bounded
    by the distinct combination count) and one class-level aggregate.
    No data-sized window, no densified grid.
    """
    from pyspark.sql import Window

    joint = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("n_cv")
    )
    joint = joint.localCheckpoint(eager=False)
    tot = joint.agg(F.sum("n_cv").cast("bigint").alias("n_all"))
    # marginals via PARTITIONED windows, not joins: a window partition
    # keyed by NULL is one group, so NULL sensitive values stay a
    # category and NULL quasi values stay a class
    w_v = Window.partitionBy(sensitive_col)
    w_c = Window.partitionBy(*quasi_cols)
    marged = joint.select(
        *quasi_cols,
        "n_cv",
        F.sum("n_cv").over(w_v).alias("n_v"),
        F.sum("n_cv").over(w_c).alias("n_c"),
    )
    terms = (
        marged.crossJoin(F.broadcast(tot))
        .groupBy(*quasi_cols)
        .agg(
            F.first("n_c").alias("class_size"),
            F.first("n_all").alias("n_all"),
            F.sum(
                F.abs(
                    F.col("n_cv") * F.col("n_all")
                    - F.col("n_v") * F.col("n_c")
                )
            ).alias("present_num"),
            F.sum("n_v").alias("present_mass"),
        )
    )
    return terms.select(
        *quasi_cols,
        F.col("class_size").cast("bigint").alias("class_size"),
        (
            F.col("present_num")
            + F.col("class_size")
            * (F.col("n_all") - F.col("present_mass"))
        )
        .cast("bigint")
        .alias("tvd_num"),
        (F.lit(2) * F.col("class_size") * F.col("n_all"))
        .cast("bigint")
        .alias("tvd_den"),
        (
            F.lit(1_000_000).cast("decimal(38,0)")
            * (
                F.col("present_num")
                + F.col("class_size")
                * (F.col("n_all") - F.col("present_mass"))
            )
            <= F.lit(t_e6).cast("decimal(38,0)")
            * F.lit(2)
            * F.col("class_size")
            * F.col("n_all")
        ).alias("t_ok"),
    )


def t_closeness_oracle_sql(
    table_sql: str,
    quasi_cols: list[str],
    sensitive_col: str,
    t_e6: int = 200_000,
) -> str:
    """DuckDB twin of :func:`t_closeness_classes`."""
    q = ", ".join(quasi_cols)
    return f"""
    WITH src AS ({table_sql}),
    joint AS (
      SELECT {q}, {sensitive_col} AS sv, COUNT(*) AS n_cv
      FROM src GROUP BY {q}, {sensitive_col}
    ),
    tot AS (SELECT CAST(SUM(n_cv) AS BIGINT) AS n_all FROM joint),
    marged AS (
      SELECT {q}, n_cv,
             SUM(n_cv) OVER (PARTITION BY sv) AS n_v,
             SUM(n_cv) OVER (PARTITION BY {q}) AS n_c
      FROM joint
    ),
    terms AS (
      SELECT {q},
             MIN(n_c) AS class_size,
             MIN(t.n_all) AS n_all,
             SUM(ABS(n_cv * t.n_all - n_v * n_c)) AS present_num,
             SUM(n_v) AS present_mass
      FROM marged CROSS JOIN tot t
      GROUP BY {q}
    )
    SELECT {q},
           CAST(class_size AS BIGINT) AS class_size,
           CAST(present_num + class_size * (n_all - present_mass)
                AS BIGINT) AS tvd_num,
           CAST(2 * class_size * n_all AS BIGINT) AS tvd_den,
           CAST(1000000 AS HUGEINT)
             * (present_num + class_size * (n_all - present_mass))
             <= CAST({t_e6} AS HUGEINT) * 2 * class_size * n_all AS t_ok
    FROM terms
    """
