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

from pyspark.sql import Column, DataFrame, Window
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


# ---------------------------------------------------------------------
# Small-file compaction planning (lakehouse OPTIMIZE bin-packing)
# ---------------------------------------------------------------------


def compaction_plan(
    files: DataFrame,
    partition_col: str,
    file_col: str,
    size_col: str,
    target_bytes: int,
) -> DataFrame:
    """Assign files to compaction bins of ~``target_bytes`` per
    partition — the planning half of a lakehouse OPTIMIZE/compact job.

    Deterministic cumulative-sum packing: files ordered (size desc,
    name) inside each partition, bin = floor((cumsum - size) / target)
    — every bin lands within [target, target + max_file) bytes except
    the last, no driver state, ONE window shuffle on the partition
    column.  (Greedy first-fit would need sequential state; the
    cumulative-sum rule is the order-free distributed equivalent and
    within one file of optimal for size-sorted input.)

    Output: (partition, bin, n_files, bin_bytes, file list csv) — the
    driver of the actual rewrite job.
    """
    w = Window.partitionBy(partition_col).orderBy(
        F.col(size_col).desc(), F.col(file_col)
    )
    cum = files.select(
        F.col(partition_col).alias("part"),
        F.col(file_col).alias("file"),
        F.col(size_col).alias("bytes"),
        F.sum(size_col)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    binned = cum.select(
        "part",
        "file",
        "bytes",
        F.floor((F.col("cum") - F.col("bytes")) / F.lit(target_bytes))
        .cast("bigint")
        .alias("bin"),
    )
    return (
        binned.groupBy("part", "bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("bytes").cast("bigint").alias("bin_bytes"),
            F.array_join(F.sort_array(F.collect_list("file")), ",").alias(
                "files"
            ),
        )
    )


def compaction_oracle_sql(
    table: str,
    partition_col: str,
    file_col: str,
    size_col: str,
    target_bytes: int,
) -> str:
    return f"""
    WITH cum AS (
      SELECT {partition_col} AS part, {file_col} AS file,
             {size_col} AS bytes,
             SUM({size_col}) OVER (
               PARTITION BY {partition_col}
               ORDER BY {size_col} DESC, {file_col}
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM {table}
    )
    SELECT part, CAST(FLOOR((cum - bytes) / {target_bytes}) AS BIGINT)
             AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(bytes) AS BIGINT) AS bin_bytes,
           array_to_string(list_sort(list(file)), ',') AS files
    FROM cum
    GROUP BY 1, 2
    """


# ---------------------------------------------------------------------
# Hilbert-curve clustering key
# ---------------------------------------------------------------------


def hilbert_step_exprs(i: int, s: int) -> tuple[str, str, str]:
    """One unrolled step of the classic 2-D Hilbert xy→d walk (the
    Wikipedia/Warren formulation) over column names ``x{i} y{i} d{i}``,
    as SQL text that parses IDENTICALLY in Spark and DuckDB: the
    ``(3·rx) xor ry`` quadrant index is enumerated as a CASE (Spark
    spells xor ``^`` but DuckDB's ``^`` is POWER — avoiding the
    operator keeps one shared fragment), and the conditional
    flip+swap rotation is two CASE chains. All exact integer
    arithmetic, so the key is bit-identical cross-engine.

    Returns ``(x_next, y_next, d_next)`` expressions.
    """
    rx = f"(case when (x{i} & {s}) > 0 then 1 else 0 end)"
    ry = f"(case when (y{i} & {s}) > 0 then 1 else 0 end)"
    quad = (
        f"(case when {rx} = 0 and {ry} = 0 then 0 "
        f"when {rx} = 0 then 1 when {ry} = 0 then 3 else 2 end)"
    )
    d_next = f"d{i} + {s * s} * {quad}"
    x_next = (
        f"case when {ry} = 1 then x{i} else "
        f"(case when {rx} = 1 then {s - 1} - y{i} else y{i} end) end"
    )
    y_next = (
        f"case when {ry} = 1 then y{i} else "
        f"(case when {rx} = 1 then {s - 1} - x{i} else x{i} end) end"
    )
    return x_next, y_next, d_next


def with_hilbert(
    df: DataFrame, cols: list[str], bits: int = 8, out_col: str = "hval"
) -> DataFrame:
    """Attach the 2-D Hilbert-curve index of ``cols`` as ``out_col``.

    Same stats-pass shape as :func:`with_zorder` (one min/max
    aggregate broadcast back, linear scale to [0, 2^bits)), then the
    unrolled per-bit walk as chained projections — all codegen, zero
    shuffle beyond the 1-row broadcast. Versus Morton, Hilbert has no
    long diagonal jumps, so range predicates touch fewer clustered
    files — the curve Delta/Databricks liquid clustering moved to.
    """
    assert len(cols) == 2, "2-D Hilbert (extend with axis folding for more)"
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"__mn_{c}"))
        aggs.append(F.max(c).alias(f"__mx_{c}"))
    stats = df.agg(*aggs)
    joined = df.join(F.broadcast(stats))
    out = joined.withColumn(
        "x0",
        _scaled(F.col(cols[0]), F.col(f"__mn_{cols[0]}"), F.col(f"__mx_{cols[0]}"), bits),
    ).withColumn(
        "y0",
        _scaled(F.col(cols[1]), F.col(f"__mn_{cols[1]}"), F.col(f"__mx_{cols[1]}"), bits),
    ).withColumn("d0", F.lit(0).cast("long"))
    for i in range(bits):
        s = 1 << (bits - 1 - i)
        xn, yn, dn = hilbert_step_exprs(i, s)
        out = (
            out.withColumn(f"x{i+1}", F.expr(xn).cast("long"))
            .withColumn(f"y{i+1}", F.expr(yn).cast("long"))
            .withColumn(f"d{i+1}", F.expr(dn).cast("long"))
        )
    drop = [f"__mn_{c}" for c in cols] + [f"__mx_{c}" for c in cols]
    for i in range(bits):
        drop += [f"x{i}", f"y{i}", f"d{i}"]
    return out.withColumn(out_col, F.col(f"d{bits}")).drop(
        *drop, f"x{bits}", f"y{bits}", f"d{bits}"
    )


def hilbert_xy2d_py(x: int, y: int, bits: int) -> int:
    """Pure-Python reference of the same walk (test twin)."""
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d
