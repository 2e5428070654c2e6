"""Engine-portable fixed-point quantization for graded double surfaces.

``round(x, n)`` with ``n > 0`` is NOT portable across engines (or even
across builds of the same engine): Spark routes doubles through
BigDecimal's exact decimal expansion while DuckDB rescales in double
arithmetic, and the two can disagree by one ulp near a tie.  The
portable form is ``floor(x * 1eN + 0.5) / 1eN`` — multiply, add, floor,
divide are each correctly-rounded IEEE ops, so two engines fed
bit-identical ``x`` produce bit-identical results.

``5e-1`` / ``1eN`` literals parse as DOUBLE on both Spark and DuckDB
(plain ``0.5`` parses as DECIMAL on both — a known promotion hazard,
see NOTES.md), so :func:`fp_sql` emits one shared text form.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fp_sql(expr: str, n: int = 6) -> str:
    """Shared Spark/DuckDB SQL text: ``expr`` quantized to ``n`` dp."""
    return f"floor(({expr}) * 1e{n} + 5e-1) / 1e{n}"


def fp_col(col: Column, n: int = 6) -> Column:
    """Column form of :func:`fp_sql` (same IEEE sequence)."""
    scale = float(10**n)
    return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)
