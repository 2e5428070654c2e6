

def test_hilbert_matches_reference_walk(spark):
    """Hilbert key: Spark's unrolled walk equals the classic loop for
    every cell of a 16x16 grid, and consecutive d values are always
    grid neighbors (the locality property Morton lacks)."""
    from pyspark.sql import functions as F

    from spark_extensions_spark.operators.layout import (
        hilbert_step_exprs,
        hilbert_xy2d_py,
    )

    bits = 4
    cells = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(cells, "px int, py int").withColumn(
        "x0", F.col("px").cast("long")
    ).withColumn("y0", F.col("py").cast("long")).withColumn(
        "d0", F.lit(0).cast("long")
    )
    for i in range(bits):
        s = 1 << (bits - 1 - i)
        xn, yn, dn = hilbert_step_exprs(i, s)
        df = (
            df.withColumn(f"x{i+1}", F.expr(xn).cast("long"))
            .withColumn(f"y{i+1}", F.expr(yn).cast("long"))
            .withColumn(f"d{i+1}", F.expr(dn).cast("long"))
        )
    got = {
        (r["px"], r["py"]): r[f"d{bits}"] for r in df.collect()
    }
    for x, y in cells:
        assert got[(x, y)] == hilbert_xy2d_py(x, y, bits)
    # curve property: d is a bijection and consecutive cells adjacent
    by_d = sorted(got.items(), key=lambda kv: kv[1])
    assert [d for _, d in by_d] == list(range(256))
    for ((x1, y1), _), ((x2, y2), _) in zip(by_d, by_d[1:]):
        assert abs(x1 - x2) + abs(y1 - y2) == 1
