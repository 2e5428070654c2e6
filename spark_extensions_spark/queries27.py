"""t2 query registry, batch 30: Spark 4 SQL-surface additions —
recursive CTEs and pipe syntax.

Registered into the shared registry (imported from queries26 at module
end). Same determinism rules as the queries.py docstring.

- ``sql_recursive_cte``: WITH RECURSIVE (new in Spark 4) reconstructing
  a parent-pointer hierarchy (root + depth per node) — the declarative
  replacement for the driver-looped iterate-until-fixpoint shape; the
  parent function is ``floor(key/2)`` (portable: ANSI double→bigint
  casts truncate in Spark but ROUND in DuckDB, so the shared
  formulation goes through ``floor``).
- ``sql_pipe_syntax``: SQL pipe operators (``|>``, Spark 4) running the
  pricing-summary aggregation; the oracle is the same query in standard
  ANSI form — proving the pipe chain compiles to the identical result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spark_extensions_spark.queries import _register, _t


@_register(
    "sql_recursive_cte",
    """
    WITH RECURSIVE h(node, root, depth) AS (
      SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey = 1
      UNION ALL
      SELECT c.c_custkey, h.root, h.depth + 1
      FROM customer c JOIN h
        ON CAST(floor(c.c_custkey / 2.0) AS BIGINT) = h.node
       AND c.c_custkey >= 2
    )
    SELECT node, root, CAST(depth AS INT) AS depth FROM h
    """,
    doc="Recursive CTE (WITH RECURSIVE, new in Spark 4): parent-pointer "
    "hierarchy walk (parent = floor(key/2)) emitting root + depth per "
    "node — the declarative form of iterate-until-fixpoint that "
    "previously needed a driver loop (operators/graph.py). Each "
    "recursion level is one self-join the optimizer plans normally; "
    "depth is O(log n) so the unrolled plan stays small at any scale.",
)
def q_sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer")
    return spark.sql(
        """
        WITH RECURSIVE h(node, root, depth) AS (
          SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey = 1
          UNION ALL
          SELECT c.c_custkey, h.root, h.depth + 1
          FROM customer c JOIN h
            ON CAST(floor(c.c_custkey / 2.0) AS BIGINT) = h.node
           AND c.c_custkey >= 2
        )
        SELECT node, root, CAST(depth AS INT) AS depth FROM h
        """
    )


@_register(
    "sql_pipe_syntax",
    """
    SELECT l_returnflag, l_linestatus,
           SUM(CAST(l_quantity AS DECIMAL(20,4))) AS sum_qty,
           SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS sum_price,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="SQL pipe syntax (|>, new in Spark 4): the pricing-summary "
    "aggregation written as a linear FROM -> WHERE -> AGGREGATE -> "
    "SELECT pipeline. Compiles to the exact same hash-aggregate plan "
    "as the ANSI form (the oracle), decimal sums keep the aggregation "
    "order-free and engine-exact.",
)
def q_sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate <= DATE '1998-09-02'
        |> AGGREGATE SUM(CAST(l_quantity AS DECIMAL(20,4))) AS sum_qty,
                     SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS sum_price,
                     CAST(COUNT(*) AS BIGINT) AS n
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, sum_qty, sum_price, n
        """
    )


_BLOCKED_DOMAINS = ("src1.org", "src3.org", "cdn.src5.org", "src7.org")


@_register(
    "url_blocklist_filter",
    f"""
    WITH u AS (
      SELECT doc_id,
             lower((CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'cdn.'
                    WHEN 1 THEN 'www.' ELSE '' END)
                   || source || '.org') AS host
      FROM documents
    ), b(domain) AS (
      VALUES {", ".join(f"('{d}')" for d in _BLOCKED_DOMAINS)}
    )
    SELECT doc_id, host FROM u
    WHERE NOT EXISTS (
      SELECT 1 FROM b
      WHERE u.host = b.domain OR ends_with(u.host, '.' || b.domain)
    )
    """,
    doc="Domain-suffix URL blocklist filtering (functions/url.py:"
    "url_blocklist_filter) — the standard crawl-cleaning step: "
    "blocking example.com also blocks cdn.example.com but never "
    "badexample.com. Spark plan is per-label-count broadcast HASH "
    "equi-joins on the host suffix (zero shuffle, no nested loop); "
    "the oracle is the naive NOT EXISTS ends_with formulation — "
    "equivalence of the two IS the check. URLs synthesized from "
    "source + doc_id (fixture corpus has no native ones); blocklist "
    "mixes 2- and 3-label domains to exercise multiple levels.",
)
def q_url_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from spark_extensions_spark.functions.url import url_blocklist_filter

    docs = _t(spark, sf_dir, "documents")["documents"]
    sub = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("cdn."))
        .when(F.col("doc_id") % 3 == 1, F.lit("www."))
        .otherwise(F.lit(""))
    )
    u = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"), sub, F.col("source"), F.lit(".org/doc/"),
            F.col("doc_id"),
        ).alias("url"),
    )
    block = spark.createDataFrame(
        [(d,) for d in _BLOCKED_DOMAINS], "domain string"
    )
    kept = url_blocklist_filter(u, "url", block)
    return kept.select(
        "doc_id",
        F.expr("lower(parse_url(url, 'HOST'))").alias("host"),
    )
