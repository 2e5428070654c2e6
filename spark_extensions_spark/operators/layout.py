"""Data-layout operators: Z-order (Morton) clustering for data skipping.

At 100 TB the fastest scan is the one that never reads the file:
parquet row-group min/max statistics prune reads ONLY if the writer
clustered rows so each file covers a narrow value range. Sorting does
that for one column; Z-ORDERING interleaves the bits of several
columns' scaled ranks so every file is a small hyper-rectangle in the
multi-column space — point/range filters on ANY of the z-columns then
skip most files (the same layout trick Delta/Iceberg OPTIMIZE ZORDER
applies; public algorithm, Morton 1966).

Pipeline shape: one tiny min/max aggregate (broadcast back — fully
declarative, no driver scalars in the data path), a codegen'd
bit-interleave projection, then ``repartitionByRange`` on the z-value +
``sortWithinPartitions`` so both file assignment AND within-file order
follow the curve. All integer math — the DuckDB oracle reproduces the
z-values bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scaled(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Linear-scale a numeric column to an integer in [0, 2^bits)."""
    span = F.greatest(cmax - cmin, F.lit(1)).cast("double")
    frac = (col - cmin).cast("double") * float(2**bits - 1) / span
    return F.floor(frac).cast("long")


def zorder_key(scaled_cols: list[Column], bits: int) -> Column:
    """Interleave the low ``bits`` bits of each scaled column (Morton
    code). Disjoint target bits, so summation == bitwise OR — written
    as + to keep the SQL oracle expression identical."""
    k = len(scaled_cols)
    z: Column = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(scaled_cols):
            z = z + F.shiftleft(
                F.shiftright(c, i).bitwiseAND(F.lit(1)), i * k + j
            )
    return z


def zorder_sql(scaled_exprs: list[str], bits: int) -> str:
    """DuckDB/ANSI SQL mirror of :func:`zorder_key` over pre-scaled
    integer expressions."""
    k = len(scaled_exprs)
    terms = [
        f"((({e} >> {i}) & 1) << {i * k + j})"
        for i in range(bits)
        for j, e in enumerate(scaled_exprs)
    ]
    return " + ".join(terms)


def with_zorder(
    df: DataFrame, cols: list[str], bits: int = 8, out_col: str = "zval"
) -> DataFrame:
    """Attach the Morton z-value of ``cols`` (numeric) as ``out_col``.

    Min/max come from one aggregate broadcast-joined back — the stats
    pass every layout optimizer needs, kept inside the plan.
    """
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"__mn_{c}"))
        aggs.append(F.max(c).alias(f"__mx_{c}"))
    stats = df.agg(*aggs)
    joined = df.join(F.broadcast(stats))
    scaled = [
        _scaled(
            F.col(c), F.col(f"__mn_{c}"), F.col(f"__mx_{c}"), bits
        )
        for c in cols
    ]
    drop = [f"__mn_{c}" for c in cols] + [f"__mx_{c}" for c in cols]
    return joined.withColumn(out_col, zorder_key(scaled, bits)).drop(*drop)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    n_files: int = 8,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` clustered along the Z-curve of ``cols``.

    ``repartitionByRange`` on the z-value assigns each output file a
    contiguous curve segment (a small hyper-rectangle per file);
    ``sortWithinPartitions`` orders rows inside the file so page-level
    stats benefit too. Filters on any of ``cols`` then skip most
    row groups via parquet min/max pruning.
    """
    z = with_zorder(df, cols, bits)
    (
        z.repartitionByRange(n_files, "zval")
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.format(fmt)
        .mode("overwrite")
        .save(path)
    )
