"""Column-level functions: text analysis, nullability, evaluation helpers."""

from spark_extensions_spark.functions.text import (
    token_count,
    word_count,
    quality_features,
    lang_id,
    doc_fingerprint,
)
from spark_extensions_spark.functions.text import (
    gopher_rules,
    pii_redact,
    chunk_windows,
    corpus_line_dedup,
    html_extract_text,
    word_ngrams_sql,
    dup_chars_from_sorted_sql,
    nfc_normalize_col,
    char_entropy_cols,
    hash_embedding_cols,
    hash_embedding_sql,
)
from spark_extensions_spark.functions.url import (
    url_canonicalize,
    url_blocklist_filter,
)
from spark_extensions_spark.functions.nullability import (
    make_nullable,
    make_not_nullable,
    set_nullable_schema,
)

__all__ = [
    "token_count",
    "word_count",
    "quality_features",
    "lang_id",
    "doc_fingerprint",
    "make_nullable",
    "make_not_nullable",
    "set_nullable_schema",
    "gopher_rules",
    "pii_redact",
    "chunk_windows",
    "corpus_line_dedup",
    "html_extract_text",
    "word_ngrams_sql",
    "dup_chars_from_sorted_sql",
    "nfc_normalize_col",
    "char_entropy_cols",
    "hash_embedding_cols",
    "hash_embedding_sql",
    "url_canonicalize",
    "url_blocklist_filter",
]
