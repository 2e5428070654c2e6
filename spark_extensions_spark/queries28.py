"""t2 query registry, batch 31: round-3 additions.

Registered into the shared registry (imported from queries27 at module
end). Same determinism rules as the queries.py docstring.

Families in this batch:

- PII release gate: ``pii_scan`` — per-doc typed hit counts, the audit
  half of the C4/RefinedWeb-style personally-identifiable-information
  pass (operators/privacy.py; the scrub half is the existing
  ``text_pii_redact`` query over functions/text.py:pii_redact — both
  share one set of pattern constants). Patterns held to the Java-regex
  ∩ RE2 common subset so both engines match identically. The fixture
  corpus carries no PII, so the query deterministically augments
  ``text`` from ``doc_id`` (identical string concatenation on both
  engines) before scanning — the operator works on real hits, not on
  zero-counts.
- Corpus mixing: ``sample_domain_cap`` (FineWeb-style per-site cap,
  skew-safe two-stage top-k), ``sample_domain_mixture`` (DoReMi-style
  softmax over per-domain bigram-LM excess loss, fixed-point).
- ``text_c4_rules``: the canonical C4 line/page cleaning rules as one
  zero-shuffle row-local pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_extensions_spark.operators.privacy import (
    pii_scan,
    pii_scan_oracle_sql,
)
from spark_extensions_spark.queries import _register, _t

# Inject synthetic PII derived from doc_id into every 3rd document —
# identical integer-to-string concatenation on both engines, so the
# scan/redact operators are exercised against real matches.
_PII_AUG_DUCK = """
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN
             text || ' reach me: user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                  || '.7, ssn 123-45-' || CAST(1000 + doc_id % 9000 AS VARCHAR)
                  || ' card 4111 1111 1111 1111'
           ELSE text END AS text
    FROM documents
"""


def _pii_aug_spark(docs: DataFrame) -> DataFrame:
    aug = F.concat(
        F.col("text"),
        F.lit(" reach me: user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7, ssn 123-45-"),
        (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
        F.lit(" card 4111 1111 1111 1111"),
    )
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, aug).otherwise(F.col("text")).alias(
            "text"
        ),
    )


@_register(
    "pii_scan",
    pii_scan_oracle_sql(f"({_PII_AUG_DUCK})", "doc_id", "text"),
    doc="PII audit pass (operators/privacy.py:pii_scan): per-document "
    "hit counts for email/credit-card/SSN/phone/IPv4 patterns over a "
    "deterministically PII-augmented corpus — row-local codegen'd "
    "regexp, zero shuffle; patterns restricted to the Java-regex ∩ RE2 "
    "common subset so Spark and DuckDB count identically.",
)
def q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    return pii_scan(_pii_aug_spark(docs), "doc_id", "text")


@_register(
    "sample_domain_cap",
    __import__(
        "spark_extensions_spark.operators.sampling", fromlist=["x"]
    ).domain_cap_oracle_sql("documents", "doc_id", "source", 5),
    doc="FineWeb-style per-domain document cap "
    "(operators/sampling.py:domain_cap): keep ≤5 docs per source, "
    "chosen by deterministic md5 priority. Skew-safe two-stage top-k "
    "(per-(domain,bucket) prefilter bounds every partition before the "
    "per-domain rank) — bit-identical to the oracle's single window.",
)
def q_sample_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.operators.sampling import domain_cap

    docs = _t(spark, sf_dir, "documents")["documents"]
    return domain_cap(docs, "doc_id", "source", 5)


@_register(
    "sample_domain_mixture",
    __import__(
        "spark_extensions_spark.operators.lm", fromlist=["x"]
    ).domain_mixture_oracle_sql("documents", "source"),
    doc="DoReMi-style static mixture reweighting "
    "(operators/lm.py:domain_mixture_weights): per-domain mean NLL "
    "under the corpus's own bigram LM (exact e6-integer sums), then "
    "softmax(excess loss) shares with fixed-point e8 exponent "
    "quantization. The only global window runs over the "
    "domain-cardinality aggregate, never the corpus.",
)
def q_sample_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.operators.lm import domain_mixture_weights

    docs = _t(spark, sf_dir, "documents")["documents"]
    return domain_mixture_weights(docs, "source")


@_register(
    "text_c4_rules",
    __import__(
        "spark_extensions_spark.functions.text", fromlist=["x"]
    ).c4_line_filters_duck(
        "(SELECT doc_id, replace(text, '. ', '.' || chr(10)) AS text"
        " FROM documents)",
        "doc_id",
        "text",
    ),
    doc="C4 line/page cleaning rules (Raffel et al. 2020 §2.2; "
    "functions/text.py:c4_line_filters): keep lines ending in terminal "
    "punctuation with ≥5 words, drop javascript lines, drop pages with "
    "lorem ipsum / curly braces / <3 surviving lines. Row-local "
    "array/string built-ins, zero shuffle; the fixture text is split "
    "into lines at sentence ends identically on both engines.",
)
def q_text_c4_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.functions.text import c4_line_filters

    docs = _t(spark, sf_dir, "documents")["documents"]
    lined = docs.select(
        "doc_id",
        F.expr("replace(text, '. ', concat('.', chr(10)))").alias("text"),
    )
    return c4_line_filters(lined, "doc_id", "text")

from spark_extensions_spark import queries29  # noqa: E402,F401  (registration side effect)
