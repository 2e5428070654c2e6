"""SQL-UDF surface tests: equality with Column builders, plan purity."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_extensions_spark.functions.sql_registry import (
    install_sql_functions,
)
from spark_extensions_spark.functions.text import (
    doc_fingerprint,
    lang_id,
    token_count,
    word_count,
)
from spark_extensions_spark.functions.url import url_canonicalize
from spark_extensions_spark.operators.sampling import hash_bucket


def test_sql_udfs_match_column_builders(spark, sf_dir):
    installed = install_sql_functions(spark)
    assert "se_lang_id" in installed
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    docs.createOrReplaceTempView("sqlreg_docs")
    via_sql = spark.sql(
        """
        SELECT doc_id,
               se_word_count(text) AS wc,
               se_token_count(text) AS tc,
               se_fingerprint(text) AS fp,
               se_lang_id(text) AS lang,
               se_hash_bucket(CAST(doc_id AS STRING), 'split', 10000) AS b,
               se_url_canonical(
                 'HTTPS://Ex.COM/a/?utm_source=x&b=2&a=1#f') AS cu
        FROM sqlreg_docs
        """
    ).collect()
    via_cols = docs.select(
        "doc_id",
        word_count("text").cast("int").alias("wc"),
        token_count("text").alias("tc"),
        doc_fingerprint("text").alias("fp"),
        lang_id("text").alias("lang"),
        hash_bucket("doc_id", "split").alias("b"),
        url_canonicalize(
            "'HTTPS://Ex.COM/a/?utm_source=x&b=2&a=1#f'"
        ).alias("cu"),
    ).collect()
    a = {r["doc_id"]: tuple(r)[1:] for r in via_sql}
    b = {r["doc_id"]: tuple(r)[1:] for r in via_cols}
    assert a == b
    assert all(v[-1] == "https://ex.com/a?a=1&b=2" for v in a.values())


def test_sql_udfs_inline_no_python(spark, sf_dir):
    install_sql_functions(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.createOrReplaceTempView("sqlreg_docs2")
    df = spark.sql(
        "SELECT se_token_count(text) AS tc FROM sqlreg_docs2 "
        "WHERE se_word_count(text) > 3"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert df.count() > 0


def test_sql_udf_in_aggregation(spark, sf_dir):
    install_sql_functions(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.createOrReplaceTempView("sqlreg_docs3")
    got = {
        r["lang"]: r["n"]
        for r in spark.sql(
            "SELECT se_lang_id(text) AS lang, COUNT(*) AS n "
            "FROM sqlreg_docs3 GROUP BY 1"
        ).collect()
    }
    want = {
        r["lang"]: r["n"]
        for r in docs.groupBy(lang_id("text").alias("lang"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_recommended_conf_sizing():
    from spark_extensions_spark.session import recommended_conf

    # 100 TB on 1000 executors x 4 cores
    conf = recommended_conf(
        100 * 1024**4, executor_cores=4, num_executors=1000
    )
    parts = int(conf["spark.sql.shuffle.partitions"])
    # ~192 MiB per shuffle partition, multiple of total cores
    assert parts % 4000 == 0
    assert 500_000 <= parts <= 600_000
    assert conf["spark.sql.adaptive.skewJoin.enabled"] == "true"

    # small job: floor of 2x cores
    small = recommended_conf(10 * 1024**2, 4, num_executors=2)
    assert int(small["spark.sql.shuffle.partitions"]) == 16
    # broadcast threshold capped at 256 MiB
    assert int(small["spark.sql.autoBroadcastJoinThreshold"]) <= 256 * 1024**2
