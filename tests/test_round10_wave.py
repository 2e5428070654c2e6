"""Round-10 wave: ADVICE-r9 guard fixes + new gates.

- Bradley-Terry int64-headroom refusal (ADVICE r9 #2): the e13
  fixed-point multiply wraps silently in non-ANSI Spark while DuckDB
  raises; the operator must refuse loudly before the engines can
  diverge.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_bradley_terry_overflow_guard_refuses(spark):
    from spark_extensions_spark.operators.evals import (
        BT_TERM_SCALE,
        bradley_terry_strengths,
    )

    over = 9223372036854775807 // BT_TERM_SCALE + 1
    matches = spark.range(over).select(
        F.lit("a").alias("winner"),
        F.lit("a").alias("m_a"),
        F.lit("b").alias("m_b"),
    )
    with pytest.raises(ValueError, match="int64 headroom"):
        bradley_terry_strengths(matches, iters=1)


def test_bradley_terry_guard_passes_under_bound(spark):
    from spark_extensions_spark.operators.evals import bradley_terry_strengths

    matches = spark.range(10).select(
        F.when(F.col("id") % 3 == 0, "b").otherwise("a").alias("winner"),
        F.lit("a").alias("m_a"),
        F.lit("b").alias("m_b"),
    )
    rows = {r["model"]: r for r in bradley_terry_strengths(matches).collect()}
    assert set(rows) == {"a", "b"}
    assert rows["a"]["strength_e9"] > rows["b"]["strength_e9"]
