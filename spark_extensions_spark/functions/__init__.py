"""Column-level functions: text analysis, nullability, evaluation helpers."""

from spark_extensions_spark.functions.text import (
    token_count,
    word_count,
    quality_features,
    lang_id,
    doc_fingerprint,
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
]
