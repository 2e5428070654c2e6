"""t2 query registry, batch 13: XML/CSV codec functions, index-aware
higher-order functions, approximate percentiles.

Registered into the shared registry (imported from queries9 at module
end). Same determinism rules as the queries.py docstring.

The XML query is the runtime face of the reference's XML surface: its
XsdSchemaConverter (SURVEY §2.B) produces the StructType that Spark 4's
built-in ``from_xml`` then parses with — schema/xsd.py supplies the
converter, this query exercises the parse path end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_extensions_spark.queries import _register, _t


@_register(
    "xml_parse",
    """
    SELECT o_orderkey,
           o_orderkey AS xk,
           o_orderpriority AS xp,
           o_totalprice AS xt
    FROM orders
    """,
    doc="from_xml (Spark 4): per-row XML documents parsed against an "
    "explicit StructType — the runtime pairing of the XSD->StructType "
    "converter (schema/xsd.py; reference XsdSchemaConverter.scala:51-85). "
    "XML is built from columns, parsed back, and must equal the source "
    "(doubles survive because Spark's double->string is the shortest "
    "roundtrip repr and xml parse reads it back exactly).",
)
def q_xml_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    xml = F.concat(
        F.lit("<o><k>"),
        F.col("o_orderkey").cast("string"),
        F.lit("</k><p>"),
        F.col("o_orderpriority"),
        F.lit("</p><t>"),
        F.col("o_totalprice").cast("string"),
        F.lit("</t></o>"),
    )
    parsed = o.select(
        "o_orderkey", F.from_xml(xml, "k BIGINT, p STRING, t DOUBLE").alias("x")
    )
    return parsed.select(
        "o_orderkey",
        F.col("x.k").alias("xk"),
        F.col("x.p").alias("xp"),
        F.col("x.t").alias("xt"),
    )


@_register(
    "csv_roundtrip",
    """
    SELECT p_partkey,
           p_brand || ',' || p_size AS as_csv,
           p_brand AS c_brand,
           CAST(p_size AS INT) AS c_size,
           'STRUCT<k: BIGINT, s: STRING>' AS json_ddl,
           'STRUCT<_c0: INT, _c1: STRING, _c2: DOUBLE>' AS csv_ddl
    FROM part
    """,
    doc="to_csv / from_csv struct codec roundtrip plus schema inference "
    "DDL (schema_of_json / schema_of_csv on literals — constant-folded "
    "at plan time, pinned as literals in the oracle).",
)
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")["part"]
    as_csv = F.to_csv(F.struct(F.col("p_brand"), F.col("p_size")))
    parsed = F.from_csv(as_csv, F.lit("b STRING, s INT"))
    return p.select(
        "p_partkey",
        as_csv.alias("as_csv"),
        parsed["b"].alias("c_brand"),
        parsed["s"].alias("c_size"),
        F.schema_of_json(F.lit('{"k":1,"s":"x"}')).alias("json_ddl"),
        F.schema_of_csv(F.lit("1,abc,2.5")).alias("csv_ddl"),
    )


@_register(
    "hof_battery",
    """
    WITH t AS (SELECT p_partkey, p_size, string_split(p_type, ' ') AS toks
               FROM part)
    SELECT p_partkey,
           CAST(len(list_filter(toks, x -> x = 'STEEL')) > 0 AS BOOLEAN) AS has_steel,
           CAST(len(list_filter(toks, x -> length(x) > 2)) = len(toks) AS BOOLEAN)
             AS all_long,
           CAST(list_sum(range(1, (p_size % 5) + 2)) AS BIGINT) AS tri_sum,
           array_to_string(list_filter(toks, (x, i) -> i % 2 = 1), ',') AS odd_toks,
           array_to_string(list_transform(range(1, len(toks) + 1),
                                          i -> i - 1 || '@' || toks[i]), ',')
             AS indexed
    FROM t
    """,
    doc="Higher-order function battery: exists, forall, aggregate "
    "(integer fold — order-free), index-aware filter and transform "
    "lambdas. Index alignment: Spark lambda indices are 0-based, "
    "DuckDB's 1-based — the oracle shifts accordingly.",
)
def q_hof_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")["part"]
    toks = F.split(F.col("p_type"), " ")
    seq = F.sequence(F.lit(1), (F.col("p_size") % 5 + 1).cast("int"))
    return p.select(
        "p_partkey",
        F.exists(toks, lambda x: x == "STEEL").alias("has_steel"),
        F.forall(toks, lambda x: F.length(x) > 2).alias("all_long"),
        F.aggregate(seq, F.lit(0).cast("bigint"), lambda acc, x: acc + x).alias(
            "tri_sum"
        ),
        F.concat_ws(
            ",", F.filter(toks, lambda x, i: i % 2 == 0)
        ).alias("odd_toks"),
        F.concat_ws(
            ",",
            F.transform(
                toks, lambda x, i: F.concat(i.cast("string"), F.lit("@"), x)
            ),
        ).alias("indexed"),
    )


@_register(
    "agg_percentile_approx",
    """
    SELECT l_returnflag,
           quantile_disc(l_quantity, 0.25) AS qty_q25,
           quantile_disc(l_quantity, 0.5) AS qty_q50,
           quantile_disc(l_quantity, 0.75) AS qty_q75,
           quantile_disc(l_extendedprice, 0.95) AS price_p95
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="percentile_approx / approx_percentile with accuracy >> group "
    "size: the Greenwald-Khanna summary holds every value, so the "
    "result is the exact lower-discrete quantile — same definition as "
    "DuckDB's quantile_disc, making the approximate aggregate fully "
    "hash-checkable at fixture scale (its error-bounded behavior at "
    "low accuracy is covered in tests).",
)
def q_agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    # the three quartiles unpack into scalar columns (the driver
    # canonicalizer cannot hash the array-returning form)
    q = F.percentile_approx("l_quantity", [0.25, 0.5, 0.75], 1000000)
    return li.groupBy("l_returnflag").agg(
        q.getItem(0).alias("qty_q25"),
        q.getItem(1).alias("qty_q50"),
        q.getItem(2).alias("qty_q75"),
        F.approx_percentile("l_extendedprice", 0.95, 1000000).alias("price_p95"),
    )


from spark_extensions_spark import queries11  # noqa: E402,F401  (registration side effect)
