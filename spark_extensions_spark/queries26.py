"""t2 query registry, batch 29: privacy release gate, BPE tokenizer,
HTML boilerplate extraction.

Registered into the shared registry (imported from queries25 at module
end). Same determinism rules as the queries.py docstring.

- ``privacy_k_anonymity`` / ``privacy_k_summary``: k-anonymity +
  l-diversity audit (operators/privacy.py) — one hash aggregate per
  level, exact SQL oracle.
- ``tokenizer_bpe``: distributed word-frequency aggregate → driver-side
  deterministic merge learning → broadcast-ranks Arrow-batched apply
  (functions/tokenizer.py). Inherently iterative per word → rows-only
  (pytest twin against an independent textbook implementation).
- ``text_html_extract``: crawl-to-corpus visible-text extraction
  (functions/text.py:html_extract_text) — the HTML is synthesized
  deterministically from the documents table inside the query, so both
  engines run the identical strip chain end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_extensions_spark.queries import _register, _t
from spark_extensions_spark.functions.text import (
    html_extract_duck,
    html_extract_text,
)
from spark_extensions_spark.operators.privacy import (
    k_anonymity_classes,
    k_anonymity_classes_oracle_sql,
    k_anonymity_summary,
    k_anonymity_summary_oracle_sql,
)

_QUASI_SQL = """(
    SELECT c_nationkey,
           c_mktsegment,
           CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band
    FROM customer
)"""


def _quasi_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")["customer"]
    return cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
    )


@_register(
    "privacy_k_anonymity",
    k_anonymity_classes_oracle_sql(
        _QUASI_SQL, ["c_nationkey", "c_mktsegment"], "bal_band", k=5, l=2
    ),
    doc="Per-equivalence-class k-anonymity/l-diversity audit "
    "(operators/privacy.py:k_anonymity_classes; Sweeney 2002, "
    "Machanavajjhala et al. 2006): quasi-identifiers (nation, market "
    "segment), sensitive = account-balance band; one scan + one hash "
    "aggregate, map-side combine collapses the tail pre-shuffle.",
)
def q_privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return k_anonymity_classes(
        _quasi_frame(spark, sf_dir),
        ["c_nationkey", "c_mktsegment"],
        "bal_band",
        k=5,
        l=2,
    )


@_register(
    "privacy_k_summary",
    k_anonymity_summary_oracle_sql(
        _QUASI_SQL, ["c_nationkey", "c_mktsegment"], "bal_band", k=5, l=2
    ),
    doc="Table-level release-gate verdict (operators/privacy.py:"
    "k_anonymity_summary): min class size IS the table's k; rows at "
    "risk + worst-case l in the same pass; two chained aggregates, "
    "one corpus scan.",
)
def q_privacy_k_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return k_anonymity_summary(
        _quasi_frame(spark, sf_dir),
        ["c_nationkey", "c_mktsegment"],
        "bal_band",
        k=5,
        l=2,
    )


@_register(
    "tokenizer_bpe",
    None,
    doc="BPE tokenizer train+apply (functions/tokenizer.py; Sennrich "
    "et al. 2016): ONE distributed scan builds the vocabulary-sized "
    "word-frequency table, deterministic greedy merge learning runs "
    "driver-side over it (the split every public trainer uses), and "
    "encoding applies broadcast merge ranks in an Arrow-batched "
    "pandas UDF with a Zipf-exploiting word cache. Rows-only: BPE is "
    "iterative per word (no SQL analogue); pytest verifies against an "
    "independent reference implementation + determinism.",
)
def q_tokenizer_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.functions.tokenizer import (
        bpe_encode,
        bpe_train_on_corpus,
    )

    docs = _t(spark, sf_dir, "documents")["documents"]
    merges = bpe_train_on_corpus(docs, "text", num_merges=100)
    enc = bpe_encode(docs, "text", merges)
    return enc.select(
        "doc_id",
        "n_tokens",
        F.md5(F.array_join("tokens", " ")).alias("tokens_md5"),
    )


_HTML_PARTS_SPARK = None  # built inline below; SQL twin mirrors exactly


@_register(
    "text_html_extract",
    f"""
    SELECT doc_id,
           {html_extract_duck(
        "'<html><head><script>if (1 < 2) {{ track(); }}</script>'"
        " || '<style>h1 {{color:#fff}}</style></head><body>'"
        " || '<!-- doc ' || CAST(doc_id AS VARCHAR) || ' -->'"
        " || '<h1>Doc &amp;amp; ' || CAST(doc_id AS VARCHAR) || '</h1>'"
        " || '<p>' || text || '</p></body></html>'"
    )} AS extracted
    FROM documents
    """,
    doc="Visible-text extraction from raw HTML (functions/text.py:"
    "html_extract_text): script/style/comment blocks dropped (dotall "
    "non-greedy), tags stripped, entities decoded in fixed order, "
    "whitespace collapsed — all row-local built-ins inside whole-stage "
    "codegen. The HTML is synthesized deterministically from the "
    "documents table so the full chain is oracle-checked end-to-end.",
)
def q_text_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    html = F.concat(
        F.lit(
            "<html><head><script>if (1 < 2) { track(); }</script>"
            "<style>h1 {color:#fff}</style></head><body>"
        ),
        F.lit("<!-- doc "),
        F.col("doc_id").cast("string"),
        F.lit(" -->"),
        F.lit("<h1>Doc &amp;amp; "),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit("</p></body></html>"),
    )
    return docs.select(
        "doc_id", html_extract_text(html).alias("extracted")
    )

from spark_extensions_spark import queries27  # noqa: E402,F401  (registration side effect)
