"""t2 query registry, batch 6: grouping sets, correlated EXISTS,
lateral join, scale-free heavy hitters, bloom-filtered join.

Registered into the same registry as :mod:`spark_extensions_spark.queries`
(imported from there via queries2 at module end). Same determinism rules
as the queries.py docstring. Noteworthy here:

- ``agg_grouping_sets`` pins the grouping_id bit convention: Spark's
  ``grouping_id(a, b)`` and DuckDB/Postgres ``GROUPING(a, b)`` both put
  the leftmost argument in the most significant bit (1 = aggregated).
- ``join_bloom_filtered`` routes the fact table through
  :func:`~spark_extensions_spark.operators.sketches.bloom_semi_join`
  before the real semi join — false positives are removed by the join,
  so the result is EXACT and the plain semi-join SQL is its oracle.
  This is the explicit form of the runtime-filter pushdown a 100 TB
  fact-dim join wants: the fixed-size bit array ships to every
  executor and non-matching rows never enter the shuffle.
- ``agg_heavy_hitters`` keeps the support threshold scale-free
  (1.5 x the mean orders-per-customer) so the query is meaningful at
  every sf; the single-row totals aggregate is broadcast, not collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_extensions_spark.queries import (
    _register,
    _t,
    dsum,
    dsum_duck,
)


@_register(
    "agg_grouping_sets",
    """
    SELECT o_orderpriority, o_orderstatus,
           CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
           COUNT(*) AS n_orders,
           """
    + dsum_duck("o_totalprice", "sum_price")
    + """
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), (o_orderstatus), ())
    """,
    doc="Explicit GROUPING SETS with grouping_id bitmask "
    "(SURVEY §2.E grouping sets/rollup/cube).",
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               CAST(grouping_id(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
               COUNT(*) AS n_orders,
               cast(round(sum(cast(o_totalprice as decimal(18,4))), 2) as double)
                 AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), (o_orderstatus), ())
        """
    )


@_register(
    "subquery_exists",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 250000)
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey
                        AND o2.o_orderstatus = 'F'
                        AND o2.o_totalprice < 50000)
    """,
    doc="Correlated EXISTS + NOT EXISTS (decorrelated by Catalyst into "
    "semi/anti joins; SURVEY §2.E subqueries).",
)
def q_subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 250000)
          AND NOT EXISTS (SELECT 1 FROM orders o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderstatus = 'F'
                            AND o2.o_totalprice < 50000)
        """
    )


@_register(
    "join_lateral",
    """
    SELECT n.n_name, t.c_custkey, t.c_acctbal
    FROM nation n, LATERAL (
      SELECT c_custkey, c_acctbal FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey
      LIMIT 2
    ) t
    """,
    doc="Correlated LATERAL subquery: top-2 customers by balance per "
    "nation (SURVEY §2.E joins; Spark rewrites to join + per-key limit).",
)
def q_join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "nation", "customer")
    return spark.sql(
        """
        SELECT n.n_name, t.c_custkey, t.c_acctbal
        FROM nation n, LATERAL (
          SELECT c_custkey, c_acctbal FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey
          LIMIT 2
        ) t
        """
    )


@_register(
    "agg_heavy_hitters",
    """
    SELECT o_custkey, COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) > (SELECT 1.5 * COUNT(*) / COUNT(DISTINCT o_custkey)
                       FROM orders)
    """,
    doc="Exact heavy hitters with a scale-free support threshold "
    "(1.5 x mean orders per customer); the oracle for what "
    "count_min_sketch / freq_items approximate.",
)
def q_agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    counts = o.groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
    totals = o.agg(
        (F.lit(1.5) * F.count("*") / F.countDistinct("o_custkey")).alias("__thr")
    )
    return (
        counts.join(F.broadcast(totals))
        .filter(F.col("n_orders") > F.col("__thr"))
        .select("o_custkey", "n_orders")
    )


@_register(
    "join_bloom_filtered",
    """
    SELECT l_returnflag, COUNT(*) AS n_items,
           """
    + dsum_duck("l_extendedprice", "revenue")
    + """
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                         WHERE o_totalprice > 400000)
    GROUP BY l_returnflag
    """,
    doc="Bloom-runtime-filtered fact-dim semi join: bloom_semi_join "
    "prunes non-matching lineitems before the shuffle, the real semi "
    "join removes false positives, so the plain semi join is the exact "
    "oracle (operators/sketches.py:bloom_semi_join).",
)
def q_join_bloom_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.operators.sketches import bloom_semi_join

    t = _t(spark, sf_dir, "lineitem", "orders")
    dim = t["orders"].filter(F.col("o_totalprice") > 400000).select("o_orderkey")
    # Prune before the Arrow-batched bloom stage: mapInPandas passes its
    # input schema through, so projecting first keeps the parquet scan
    # (and every Arrow batch) at 3 columns instead of 11.
    fact = t["lineitem"].select("l_orderkey", "l_returnflag", "l_extendedprice")
    pre = bloom_semi_join(
        fact, dim, "l_orderkey", "o_orderkey",
        expected_items=100_000, fpp=0.01,
    )
    return (
        pre.join(
            F.broadcast(dim),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_semi",
        )
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_items"), dsum("l_extendedprice").alias("revenue"))
    )


# batch-7 queries register themselves into the shared registry on import
from spark_extensions_spark import queries4  # noqa: E402,F401  (registration side effect)
