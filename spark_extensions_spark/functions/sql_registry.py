"""Pure-SQL surface: register the engine's scalar operators as Spark
SQL UDFs (Spark 4.0 ``CREATE FUNCTION ... RETURN <expr>``).

The reference library exposes its operators as Column functions a
Scala/Java user imports; a PySpark-native engine should ALSO serve the
SQL-only user — notebooks, JDBC/Thrift clients, dbt-style tooling —
who never touches the Python API. ``install_sql_functions(spark)``
registers the row-local operator battery as temporary SQL functions,
each delegating to exactly the same SQL fragment the Column builders
compile to, so the two surfaces cannot drift.

SQL UDFs are macro-expanded into the caller's plan by the analyzer:
they inline, codegen, and push down like hand-written expressions —
zero wrapper overhead, unlike Python UDFs (pinned by test: the plan
contains no BatchEvalPython and results equal the Column builders).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from spark_extensions_spark.functions.text import (
    STOPWORDS,
    TOKEN_PATTERN,
    _stop_votes_sql,
)
from spark_extensions_spark.functions.url import url_canonicalize_sql


def _words(t: str) -> str:
    return f"regexp_extract_all(lower({t}), '{TOKEN_PATTERN}', 0)"


def sql_function_definitions() -> dict[str, str]:
    """name -> CREATE OR REPLACE TEMPORARY FUNCTION statement.

    Every body is the same fragment the corresponding Column builder
    (functions/text.py, functions/url.py, operators/sampling.py) emits,
    re-serialized against the UDF parameter name.
    """
    votes = {lang: _stop_votes_sql("t", lang) for lang in STOPWORDS}
    return {
        "se_word_count": f"""
            CREATE OR REPLACE TEMPORARY FUNCTION se_word_count(t STRING)
            RETURNS INT RETURN size({_words('t')})
        """,
        "se_token_count": f"""
            CREATE OR REPLACE TEMPORARY FUNCTION se_token_count(t STRING)
            RETURNS BIGINT RETURN aggregate({_words('t')}, 0L,
              (acc, w) -> acc + cast(ceil(length(w) / 4.0d) as bigint))
        """,
        "se_fingerprint": """
            CREATE OR REPLACE TEMPORARY FUNCTION se_fingerprint(t STRING)
            RETURNS STRING
            RETURN md5(trim(regexp_replace(lower(t), '\\\\s+', ' ')))
        """,
        "se_hash_bucket": """
            CREATE OR REPLACE TEMPORARY FUNCTION se_hash_bucket(
              k STRING, salt STRING, n_buckets INT)
            RETURNS BIGINT
            RETURN cast(conv(substring(md5(concat(k, ':', salt)), 1, 15),
                             16, 10) as bigint) % n_buckets
        """,
        "se_lang_id": f"""
            CREATE OR REPLACE TEMPORARY FUNCTION se_lang_id(t STRING)
            RETURNS STRING RETURN
            case when {votes['en']} = 0 and {votes['de']} = 0
                   and {votes['es']} = 0 and {votes['fr']} = 0 then 'und'
                 when {votes['en']} >= {votes['de']}
                   and {votes['en']} >= {votes['es']}
                   and {votes['en']} >= {votes['fr']} then 'en'
                 when {votes['de']} >= {votes['es']}
                   and {votes['de']} >= {votes['fr']} then 'de'
                 when {votes['es']} >= {votes['fr']} then 'es'
                 else 'fr' end
        """,
        "se_url_canonical": f"""
            CREATE OR REPLACE TEMPORARY FUNCTION se_url_canonical(u STRING)
            RETURNS STRING RETURN {url_canonicalize_sql('u')}
        """,
    }


def install_sql_functions(spark: SparkSession) -> list[str]:
    """Register every SQL UDF; returns the installed function names."""
    names = []
    for name, stmt in sql_function_definitions().items():
        spark.sql(stmt)
        names.append(name)
    return names
