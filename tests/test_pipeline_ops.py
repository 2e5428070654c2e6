

def test_weighted_sample_inclusion_bias(spark):
    """A-ExpJ sample: heavier rows are included more often (aggregate
    over many disjoint salts), sample size exact, no duplicates, and
    the plan is a global top-k (TakeOrderedAndProject), not a sort."""
    from pyspark.sql import functions as F

    from spark_extensions_spark.operators.sampling import weighted_sample

    df = spark.range(400).select(
        F.col("id"),
        F.when(F.col("id") < 40, F.lit(50)).otherwise(F.lit(1)).alias("w"),
    )
    heavy_hits = 0
    for s in range(12):
        got = weighted_sample(df, "id", "w", 40, salt=f"s{s}").collect()
        ids = [r["id"] for r in got]
        assert len(ids) == 40 and len(set(ids)) == 40
        heavy_hits += sum(1 for i in ids if i < 40)
    # heavy ids are 10% of rows but carry ~85% of total weight;
    # uniform sampling would give ~4 hits/round, weighted ~>15
    assert heavy_hits / 12 > 12

    plan = weighted_sample(df, "id", "w", 40)._jdf.queryExecution()
    assert "TakeOrderedAndProject" in plan.executedPlan().toString()


def test_weighted_sample_partitioning_invariant(spark):
    """Same sample regardless of physical layout."""
    from pyspark.sql import functions as F

    from spark_extensions_spark.operators.sampling import weighted_sample

    df = spark.range(500).select("id", (F.col("id") % 7 + 1).alias("w"))
    a = {r["id"] for r in weighted_sample(df, "id", "w", 50).collect()}
    b = {
        r["id"]
        for r in weighted_sample(df.repartition(13), "id", "w", 50).collect()
    }
    assert a == b


def test_sorted_neighborhood_pairs_window(spark):
    """Sorted-neighborhood blocking: exactly the pairs within w sorted
    positions, no self-pairs, partition-layout invariant."""
    from pyspark.sql import functions as F

    from spark_extensions_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    rows = [(i, f"name_{i:03d}") for i in range(30)]
    df = spark.createDataFrame(rows, "id int, name string")
    got = {
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(df, "id", "name", window=3).collect()
    }
    expected = {
        (a, b) for a in range(30) for b in range(a + 1, min(a + 4, 30))
    }
    assert got == expected

    got2 = {
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(
            df.repartition(7), "id", "name", window=3
        ).collect()
    }
    assert got2 == expected


def test_stratified_split_exact_proportions(spark):
    """Every group's split sizes are the floor-boundary cuts (±1), even
    for tiny groups, and assignment is layout-invariant."""
    from pyspark.sql import functions as F

    from spark_extensions_spark.operators.sampling import stratified_split

    rows = [(i, f"g{i % 4}") for i in range(100)] + [
        (1000 + i, "tiny") for i in range(5)
    ]
    df = spark.createDataFrame(rows, "id bigint, g string")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = stratified_split(df, "g", "id", fr)
    sizes = {
        (r["g"], r["split"]): r["n"]
        for r in out.groupBy("g", "split").agg(F.count("*").alias("n")).collect()
    }
    for g, n in [("g0", 25), ("g1", 25), ("g2", 25), ("g3", 25), ("tiny", 5)]:
        tr = sizes.get((g, "train"), 0)
        va = sizes.get((g, "val"), 0)
        te = sizes.get((g, "test"), 0)
        assert tr + va + te == n
        assert tr == int(n * 0.8)
        assert va == int(n * 0.9) - int(n * 0.8)
    a = {(r["id"], r["split"]) for r in out.collect()}
    b = {
        (r["id"], r["split"])
        for r in stratified_split(df.repartition(9), "g", "id", fr).collect()
    }
    assert a == b


def test_temperature_sample_flattens(spark):
    """alpha<1 narrows the kept-count spread between large and small
    groups relative to their raw sizes; alpha=1 is proportional."""
    from pyspark.sql import functions as F

    from spark_extensions_spark.operators.sampling import temperature_sample

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "id bigint, g string")

    def kept_ratio(alpha):
        out = temperature_sample(df, "g", "id", alpha, 200)
        n = {
            r["g"]: r["c"]
            for r in out.groupBy("g").agg(F.count("*").alias("c")).collect()
        }
        return n.get("big", 0) / max(1, n.get("small", 1))

    # raw ratio is 9:1; alpha=0.5 should compress it well below that
    assert kept_ratio(1.0) > 5
    assert kept_ratio(0.5) < 5
    assert kept_ratio(0.5) > 1
