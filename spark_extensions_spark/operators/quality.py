"""Declarative data-quality validation over DataFrames.

A rule set compiles to ONE aggregate pass (conditional counts — no
per-rule scans), plus an optional referential-integrity check that
anti-joins a foreign key against its dimension. This is the
expectations layer a production ingestion pipeline runs before
publishing a partition; at 100 TB the single-pass shape matters — N
rules cost one scan, not N.

Each rule is (name, violation_predicate Column). Output one row per
rule: (rule, n_violations, n_rows, violation_rate).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_rules(df: DataFrame, rules: list[tuple[str, Column]]) -> DataFrame:
    """Evaluate violation predicates in a single aggregate pass.

    ``rules``: list of (rule_name, predicate) where the predicate is
    TRUE for a VIOLATING row. Returns (rule, n_violations, n_rows,
    violation_rate) — rate as an exact integer-division double.
    """
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for name, pred in rules:
        aggs.append(
            F.sum(pred.cast("long")).cast("bigint").alias(f"__v_{name}")
        )
    row = df.agg(*aggs)
    per_rule = [
        row.select(
            F.lit(name).alias("rule"),
            F.col(f"__v_{name}").alias("n_violations"),
            F.col("__n").alias("n_rows"),
            (F.col(f"__v_{name}").cast("double") / F.col("__n")).alias(
                "violation_rate"
            ),
        )
        for name, _ in rules
    ]
    return reduce(DataFrame.unionAll, per_rule)


def check_referential(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    rule_name: str = "referential",
) -> DataFrame:
    """Count fact rows whose key has no match in the dimension.

    Anti-join shape: the dimension side is typically broadcastable; at
    scale this is one broadcast (or one shuffle for giant dims) — never
    a row explosion, since only missing keys survive.
    """
    n_rows = fact.count()
    missing = fact.join(
        dim.select(F.col(dim_key).alias(fact_key)).distinct(),
        fact_key,
        "left_anti",
    ).count()
    spark = fact.sparkSession
    return spark.createDataFrame(
        [(rule_name, missing, n_rows, missing / n_rows if n_rows else 0.0)],
        "rule string, n_violations bigint, n_rows bigint, violation_rate double",
    )
