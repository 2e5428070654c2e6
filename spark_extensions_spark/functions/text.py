"""Text-analysis column functions for training-data pipelines.

All are pure built-in-expression compositions (JVM-side, codegen'd, no
Python in the row path) and deterministic across engines, so every one
of them is oracle-checkable in DuckDB. Designed to run over a 100 TB
``documents`` corpus as a single projection — zero shuffles.

- token_count / word_count: regex token runs, BPE-ish sub-token count.
- quality_features: length / punctuation / stopword-ratio scoring.
- lang_id: stopword-vote n-gram heuristic (en/de/es/fr) with a
  deterministic tie-break.
- doc_fingerprint: md5 over whitespace-normalized lowercase text.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword seed sets (public common words). Kept small
# on purpose: the operator demonstrates the scalable *shape* (array
# intersection votes inside one projection); production would swap in a
# fuller lexicon via a broadcast map.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "with", "for", "on"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "nicht", "ein", "zu"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "para"),
    "fr": ("le", "la", "et", "les", "des", "est", "dans", "pour", "que", "une"),
}

TOKEN_PATTERN = "[a-z0-9]+"


def _words_sql(text_col: str) -> str:
    return f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)"


def word_count(text_col: str) -> Column:
    """Number of word tokens (letters+digits runs, case-folded)."""
    return F.expr(f"size({_words_sql(text_col)})")


def token_count(text_col: str, chars_per_token: float = 4.0) -> Column:
    """BPE-ish token estimate: whitespace tokens plus an overhead term for
    long words (a word of length L costs ceil(L / chars_per_token))."""
    return F.expr(
        f"aggregate({_words_sql(text_col)}, 0L, "
        f"(acc, w) -> acc + cast(ceil(length(w) / {chars_per_token}d) as bigint))"
    )


def quality_features(text_col: str) -> list[Column]:
    """Quality-scoring feature battery (each an exact, portable expression).

    Returns columns: ``n_chars_obs``, ``n_words``, ``avg_word_len``,
    ``alpha_ratio``, ``stopword_ratio`` (English seed set),
    ``upper_ratio``. Ratios are double divisions of exact ints →
    deterministic.
    """
    words = _words_sql(text_col)
    n_chars = f"length({text_col})"
    n_words = f"size({words})"
    n_alpha = f"length(regexp_replace({text_col}, '[^A-Za-z]', ''))"
    n_upper = f"length(regexp_replace({text_col}, '[^A-Z]', ''))"
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    n_stop = f"size(filter({words}, w -> array_contains(array({stop_list}), w)))"
    total_word_chars = f"aggregate({words}, 0L, (acc, w) -> acc + length(w))"
    return [
        F.expr(n_chars).alias("n_chars_obs"),
        F.expr(n_words).alias("n_words"),
        F.expr(
            f"case when {n_words} = 0 then 0.0d else {total_word_chars} / cast({n_words} as double) end"
        ).alias("avg_word_len"),
        F.expr(
            f"case when {n_chars} = 0 then 0.0d else {n_alpha} / cast({n_chars} as double) end"
        ).alias("alpha_ratio"),
        F.expr(
            f"case when {n_words} = 0 then 0.0d else {n_stop} / cast({n_words} as double) end"
        ).alias("stopword_ratio"),
        F.expr(
            f"case when {n_chars} = 0 then 0.0d else {n_upper} / cast({n_chars} as double) end"
        ).alias("upper_ratio"),
    ]


def gopher_rules(
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_stopword_hits: int = 2,
) -> list[Column]:
    """Gopher-style document-quality rule battery (Rae et al. 2021,
    "Scaling Language Models" §A1.1 repetition/quality filters — public
    thresholds, re-expressed as portable row-local SQL).

    Returns the rule inputs plus a ``gopher_pass`` flag: word count in
    range, mean word length in [3,10], symbol-to-word ratio (#/… )
    below 0.1, >80% of words containing an alphabetic character, and at
    least 2 distinct English stopwords present. Everything is exact
    integer arithmetic + one double division per ratio — zero shuffle,
    engine-portable.
    """
    words = _words_sql(text_col)
    n_words = f"size({words})"
    total_word_chars = f"aggregate({words}, 0L, (acc, w) -> acc + length(w))"
    # ratios quantize via floor(x*1e6+0.5)/1e6 — for positive x this IS
    # HALF_UP rounding, but both engines run the identical double ops
    # (round()'s rescale path differs: BigDecimal vs double — the NOTES
    # round()-hazard class)
    mean_wl = (
        f"case when {n_words} = 0 then 0.0d "
        f"else floor({total_word_chars} / cast({n_words} as double)"
        f" * 1000000.0d + 0.5d) / 1000000.0d end"
    )
    n_symbols = f"size(regexp_extract_all({text_col}, '#|\\\\.\\\\.\\\\.', 0))"
    sym_ratio = (
        f"case when {n_words} = 0 then 0.0d "
        f"else floor({n_symbols} / cast({n_words} as double)"
        f" * 1000000.0d + 0.5d) / 1000000.0d end"
    )
    n_alpha_words = f"size(filter({words}, w -> w rlike '[a-z]'))"
    alpha_ratio = (
        f"case when {n_words} = 0 then 0.0d "
        f"else floor({n_alpha_words} / cast({n_words} as double)"
        f" * 1000000.0d + 0.5d) / 1000000.0d end"
    )
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    stop_hits = (
        f"size(array_intersect(array_distinct({words}), "
        f"array({stop_list})))"
    )
    gpass = (
        f"{n_words} >= {min_words} AND {n_words} <= {max_words} "
        f"AND ({mean_wl}) >= {min_mean_word_len} "
        f"AND ({mean_wl}) <= {max_mean_word_len} "
        f"AND ({sym_ratio}) <= {max_symbol_ratio} "
        f"AND ({alpha_ratio}) > {min_alpha_word_ratio} "
        f"AND ({stop_hits}) >= {min_stopword_hits}"
    )
    return [
        F.expr(n_words).cast("int").alias("n_words"),
        F.expr(mean_wl).alias("mean_word_len"),
        F.expr(sym_ratio).alias("symbol_ratio"),
        F.expr(alpha_ratio).alias("alpha_word_ratio"),
        F.expr(stop_hits).cast("int").alias("stopword_hits"),
        F.expr(gpass).alias("gopher_pass"),
    ]


def _stop_votes_sql(text_col: str, lang: str) -> str:
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"size(filter({_words_sql(text_col)}, w -> array_contains(array({stop_list}), w)))"


def lang_id(text_col: str) -> Column:
    """Stopword-vote language guess over {en,de,es,fr}; 'und' when no
    votes. Ties break in fixed order en > de > es > fr (deterministic)."""
    votes = {lang: _stop_votes_sql(text_col, lang) for lang in STOPWORDS}
    v = {lang: f"__v_{lang}" for lang in STOPWORDS}
    # Single-pass CASE chain over named vote counts (computed once each
    # via a nested named_struct trick is overkill for 4 langs; Catalyst
    # CSEs the repeated subexpressions).
    cond = (
        f"case when {votes['en']} = 0 and {votes['de']} = 0 and {votes['es']} = 0 and {votes['fr']} = 0 then 'und' "
        f"when {votes['en']} >= {votes['de']} and {votes['en']} >= {votes['es']} and {votes['en']} >= {votes['fr']} then 'en' "
        f"when {votes['de']} >= {votes['es']} and {votes['de']} >= {votes['fr']} then 'de' "
        f"when {votes['es']} >= {votes['fr']} then 'es' "
        f"else 'fr' end"
    )
    return F.expr(cond)


def lang_id_oracle_sql(text_col: str) -> str:
    """DuckDB-SQL mirror of :func:`lang_id` (list_filter/list_contains)."""
    def votes(lang: str) -> str:
        stop_list = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        return (
            f"len(list_filter(regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}'), "
            f"w -> list_contains([{stop_list}], w)))"
        )

    en, de, es, fr = votes("en"), votes("de"), votes("es"), votes("fr")
    return (
        f"case when {en} = 0 and {de} = 0 and {es} = 0 and {fr} = 0 then 'und' "
        f"when {en} >= {de} and {en} >= {es} and {en} >= {fr} then 'en' "
        f"when {de} >= {es} and {de} >= {fr} then 'de' "
        f"when {es} >= {fr} then 'es' "
        f"else 'fr' end"
    )


def doc_fingerprint(text_col: str) -> Column:
    """Stable content fingerprint: md5 of lowercase, whitespace-collapsed
    text. Identical fingerprints ⇒ exact near-normalized duplicates."""
    return F.md5(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")))


def chunk_windows(
    df,
    id_col: str,
    text_col: str,
    window_tokens: int,
    stride: int,
):
    """Split documents into fixed-size token windows with overlap — the
    context-window chunking step that turns a cleaned corpus into
    training sequences.

    Tokens are whitespace words (swap in a BPE tokenizer behind the
    same signature). Windows start at 0, stride, 2*stride, ... while a
    window has at least one token; each output row is
    ``(id, chunk_id, chunk_text, n_tokens)``. Entirely row-local
    (split + sequence + transform + explode): zero shuffle, scales as a
    single pass at any corpus size, and chunk identity is deterministic
    under any partitioning.
    """
    from pyspark.sql import functions as F

    ws = F.split(F.col(text_col), " ")
    n = F.size(ws)
    n_chunks = F.when(
        n <= window_tokens, F.lit(1)
    ).otherwise(
        F.floor((n - window_tokens + stride - 1) / F.lit(stride)).cast("int") + 1
    )
    starts = F.sequence(F.lit(0), (n_chunks - 1) * stride, F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s, i: F.struct(
            i.cast("int").alias("chunk_id"),
            F.concat_ws(" ", F.slice(ws, s + 1, window_tokens)).alias(
                "chunk_text"
            ),
            F.least(n - s, F.lit(window_tokens)).cast("int").alias("n_tokens"),
        ),
    )
    return df.select(
        F.col(id_col), F.explode(chunks).alias("__c")
    ).select(
        id_col,
        F.col("__c.chunk_id").alias("chunk_id"),
        F.col("__c.chunk_text").alias("chunk_text"),
        F.col("__c.n_tokens").alias("n_tokens"),
    )


def pack_chunks(
    df,
    group_col: str,
    order_cols: list[str],
    token_col: str,
    budget: int,
    bin_col: str = "bin_id",
):
    """Greedy sequential packing of chunks into fixed-token-budget bins
    (training-batch/sequence packing).

    Within each group, chunks are taken in ``order_cols`` order and
    appended to the current bin until adding one would exceed
    ``budget``; then a new bin starts (an oversized chunk gets a bin of
    its own). Deterministic under any partitioning because the fill
    order is a total order, and parallel across groups — each group
    packs independently inside one ``applyInPandas`` call (the
    inherently sequential scan is per-group and memory-light: one
    counter, not the data).
    """
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401
    from pyspark.sql.types import IntegerType, StructType

    out_schema = StructType(
        list(df.schema.fields)
    ).add(bin_col, IntegerType(), False)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols).reset_index(drop=True)
        bins = []
        cur, b = 0, 0
        for t in pdf[token_col]:
            t = int(t)
            if cur > 0 and cur + t > budget:
                b += 1
                cur = 0
            cur += t
            bins.append(b)
        pdf[bin_col] = pd.array(bins, dtype="int32")
        return pdf

    from spark_extensions_spark.session import expansion_width

    # pin the grouped-map exchange's width (AQE coalesces by bytes and
    # cannot see the per-group python-call cost; the keyed repartition
    # replaces the exchange the groupBy inserts anyway)
    return (
        df.repartition(expansion_width(df.sparkSession), group_col)
        .groupBy(group_col)
        .applyInPandas(pack, out_schema)
    )


def corpus_line_dedup(df, id_col: str, text_col: str, sep: str = "\n"):
    """C4-style corpus-level line deduplication.

    Split every document into lines and keep only the FIRST occurrence
    (ordered by (doc id, line position)) of each distinct line across
    the WHOLE corpus — the boilerplate-removal pass that drops repeated
    headers/footers/navigation from a web crawl. Returns
    ``(id, pos, line)`` for the surviving lines; callers re-assemble
    documents with a grouped ``array_join`` when needed.

    Scale shape: posexplode (no driver state) then ONE shuffle keyed by
    the line text for the global first-occurrence window; skew from
    ultra-frequent lines (empty string, boilerplate) is bounded because
    only rank-1 survives — the window needs no full sort spill per key
    beyond the min (id, pos) pair. At 100 TB swap the raw line key for
    ``xxhash64(line)`` to shrink shuffle width (kept textual here so
    the DuckDB oracle can mirror it exactly).
    """
    from pyspark.sql.window import Window

    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    )
    w = Window.partitionBy("line").orderBy(id_col, "pos")
    return (
        lines.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"
PII_SSN = r"[0-9]{3}-[0-9]{2}-[0-9]{4}"
PII_CC = r"[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}"
# audited by operators/privacy.py:pii_scan (not scrubbed — IPs are
# often legitimate technical content)
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def pii_redact(text_col) -> Column:
    """Replace PII-shaped spans with typed placeholders.

    Order matters: credit-card first (its 4-4-4-4 shape embeds
    phone/SSN-shaped substrings), then SSN (3-2-4), then phone (3-3-4),
    then email. Pure regexp_replace chain — JVM-side, codegen'd, and
    the RE2/Java-common regex subset keeps the DuckDB oracle
    bit-identical (oracle needs the 'g' flag; Spark replaces all
    occurrences by default).
    """
    c = F.regexp_replace(text_col, PII_CC, "<CC>")
    c = F.regexp_replace(c, PII_SSN, "<SSN>")
    c = F.regexp_replace(c, PII_PHONE, "<PHONE>")
    c = F.regexp_replace(c, PII_EMAIL, "<EMAIL>")
    return c


def pseudonymize(col, secret: str, prefix: str = "id_", length: int = 16):
    """Deterministic keyed pseudonymization: a stable, irreversible
    token per value — referential integrity survives (the same value
    maps to the same token in every table pseudonymized with the same
    secret), unlike redaction, which destroys joinability.

    ``token = prefix || substr(sha2(secret || ':' || value, 256),
    length)`` — keyed so tokens can't be recomputed from public data
    without the secret; row-local built-in, codegen, zero shuffle.
    NULL stays NULL.
    """
    from pyspark.sql import functions as F

    c = col if not isinstance(col, str) else F.col(col)
    return F.when(
        c.isNotNull(),
        F.concat(
            F.lit(prefix),
            F.substring(
                F.sha2(
                    F.concat(F.lit(secret + ":"), c.cast("string")), 256
                ),
                1,
                length,
            ),
        ),
    )


def pseudonymize_duck(col_sql: str, secret: str, prefix: str = "id_", length: int = 16) -> str:
    """DuckDB twin of :func:`pseudonymize` (same hash, same slice)."""
    return (
        f"CASE WHEN {col_sql} IS NOT NULL THEN '{prefix}' || "
        f"substr(sha256('{secret}:' || CAST({col_sql} AS VARCHAR)), "
        f"1, {length}) END"
    )


# ---------------------------------------------------------------------
# HTML boilerplate stripping (web-crawl → training-text extraction)
# ---------------------------------------------------------------------

# Shared Spark/DuckDB regex constants: inline (?is) flags keep the
# pattern STRINGS identical on both engines (Java regex and RE2 both
# support inline flags; DuckDB only needs the 'g' option for global).
_HTML_BLOCK_PATTERNS: list[str] = [
    r"(?is)<script[^>]*>.*?</script>",
    r"(?is)<style[^>]*>.*?</style>",
    r"(?s)<!--.*?-->",
    r"<[^>]+>",
]
# Fixed decode order (applied AFTER tag removal); &amp; decoded last so
# double-escaped entities resolve one level per pass on both engines.
_HTML_ENTITIES: list[tuple[str, str]] = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]


def html_extract_text(col):
    """Extract visible text from raw HTML — the crawl-to-corpus step.

    Boilerplate chain, entirely row-local built-ins (codegen, zero
    shuffle, no Python): drop <script>/<style> blocks and comments
    (dotall non-greedy), strip remaining tags, decode the six common
    entities in a fixed order, collapse whitespace runs, trim. A
    deliberately deterministic heuristic (the trafilatura/jusText
    DOM-scoring extractors need an HTML parser library); at 100 TB the
    regex chain runs inside whole-stage codegen at scan speed.

    Reference scope note: no extraction surface in the reference;
    LLM-pipeline extension layer (SURVEY.md §7 M5).
    """
    from pyspark.sql import functions as F

    c = col if not isinstance(col, str) else F.col(col)
    for pat in _HTML_BLOCK_PATTERNS:
        c = F.regexp_replace(c, pat, " ")
    for ent, rep in _HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def html_extract_duck(col_sql: str) -> str:
    """DuckDB twin of :func:`html_extract_text` (same pattern strings)."""
    expr = col_sql
    for pat in _HTML_BLOCK_PATTERNS:
        p = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', ' ', 'g')"
    for ent, rep in _HTML_ENTITIES:
        e = ent.replace("'", "''")
        r = rep.replace("'", "''")
        expr = f"replace({expr}, '{e}', '{r}')"
    return f"trim(regexp_replace({expr}, '\\s+', ' ', 'g'))"


# ---------------------------------------------------------------------
# Duplicate-n-gram character fraction (Gopher repetition filter)
# ---------------------------------------------------------------------


def word_ngrams_sql(text_col: str, n: int) -> str:
    """Spark SQL fragment: the document's word n-grams as an array of
    space-joined strings (empty when fewer than n words)."""
    ws = f"split(trim({text_col}), '\\\\s+')"
    return (
        f"case when size({ws}) >= {n} then "
        f"transform(sequence(1, size({ws}) - {n} + 1), "
        f"i -> array_join(slice({ws}, i, {n}), ' ')) "
        f"else array() end"
    )


def dup_chars_from_sorted_sql(sorted_col: str, text_col: str) -> str:
    """Spark SQL fragment: fraction of characters in n-grams occurring
    ≥2 times, given a pre-SORTED gram array COLUMN (the Rae et al.
    2021 "fraction of characters in duplicate n-grams" repetition
    filter; the numerator counts every occurrence of a duplicated
    gram). Sorting makes duplicate detection a neighbor test — O(G)
    after the O(G log G) sort, all row-local, zero shuffle. Pass a
    materialized column (withColumn), not an inline expression: inline
    text would re-evaluate the sort per element."""
    s = sorted_col
    term = (
        f"case when (i > 1 and element_at({s}, i) = element_at({s}, i - 1)) "
        f"or (i < size({s}) and element_at({s}, i) = element_at({s}, i + 1)) "
        f"then cast(length(element_at({s}, i)) as bigint) else 0L end"
    )
    dup = (
        f"aggregate(transform(sequence(1, size({s})), i -> {term}), "
        f"0L, (acc, v) -> acc + v)"
    )
    return (
        f"case when size({s}) > 0 and length({text_col}) > 0 "
        f"then cast({dup} as double) / length({text_col}) else 0.0d end"
    )


def word_ngrams_duck(text_col: str, n: int) -> str:
    """DuckDB twin of :func:`word_ngrams_sql`."""
    ws = f"regexp_split_to_array(trim({text_col}), '\\s+')"
    return (
        f"CASE WHEN len({ws}) >= {n} THEN "
        f"list_transform(generate_series(1, len({ws}) - {n} + 1), "
        f"i -> array_to_string(list_slice({ws}, i, i + {n} - 1), ' ')) "
        f"ELSE [] END"
    )


def dup_chars_from_sorted_duck(sorted_col: str, text_col: str) -> str:
    """DuckDB twin of :func:`dup_chars_from_sorted_sql` (same neighbor
    test over the same sorted gram column)."""
    s = sorted_col
    term = (
        f"CASE WHEN (i > 1 AND {s}[i] = {s}[i - 1]) "
        f"OR (i < len({s}) AND {s}[i] = {s}[i + 1]) "
        f"THEN CAST(length({s}[i]) AS BIGINT) ELSE 0 END"
    )
    dup = f"list_sum(list_transform(generate_series(1, len({s})), i -> {term}))"
    return (
        f"CASE WHEN len({s}) > 0 AND length({text_col}) > 0 "
        f"THEN CAST(COALESCE({dup}, 0) AS DOUBLE) / length({text_col}) "
        f"ELSE 0.0 END"
    )


def nfc_normalize_col(col: Column) -> Column:
    """Unicode NFC normalization (Arrow-batched — Spark has no builtin;
    the canonical first step of a cross-source dedup key, collapsing
    composed vs decomposed encodings of the same visible text)."""

    @F.pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda v: unicodedata.normalize("NFC", v) if v is not None else None
        )

    return _nfc(col)


# ---------------------------------------------------------------------
# Character-entropy quality signal
# ---------------------------------------------------------------------


def char_entropy_cols(text_col: str):
    """Three Spark Columns ``(s, starts, ks)`` to materialize via
    withColumn (as ``__s``, ``__st``, ``__ks``) before calling
    :func:`char_entropy_sql`: the sorted char array, the 1-based run
    starts, and the per-distinct-char counts as run lengths — O(N)
    after the sort, vs the naive O(D·N) count-by-filter (the DuckDB
    twin keeps the naive form: the counts are the same integers in the
    same sorted-char order, so every entropy term is identical).
    Materializing keeps each array evaluated once per row."""
    s = F.array_sort(F.split(F.col(text_col), ""))
    starts = F.expr(
        "filter(sequence(1, size(__s)), i -> i = 1 or "
        "element_at(__s, i) != element_at(__s, i - 1))"
    )
    ks = F.expr(
        "transform(sequence(1, size(__st)), j -> "
        "(case when j < size(__st) then element_at(__st, j + 1) "
        "else size(__s) + 1 end) - element_at(__st, j))"
    )
    return s, starts, ks


def char_entropy_sql(ks_col: str, s_col: str) -> str:
    """Spark SQL fragment: Shannon character entropy (nats) from the
    materialized count array — Σ (k/n)·ln(n/k), each term fixed-point
    quantized to 1e-6 integer units BEFORE the sum (ln is libm and not
    ulp-portable across engine builds: a per-term e6 floor tolerates
    ~1e-8 of ln slack, and the integer sum is exact and order-free),
    then one exact /1e6 at the end.  Low entropy = repeated-character
    spam; high = random noise — a standard quality gate."""
    n = f"cast(size({s_col}) as double)"
    return (
        f"case when size({s_col}) > 0 then cast(aggregate("
        f"transform({ks_col}, k -> cast(floor((cast(k as double) / {n}) "
        f"* ln({n} / cast(k as double)) * 1e6 + 0.5d) as bigint)), "
        f"0L, (a, v) -> a + v) as double) / 1e6 else 0.0d end"
    )


def char_entropy_duck(ks_col: str, s_col: str) -> str:
    """DuckDB twin of :func:`char_entropy_sql` over the SAME
    pre-materialized (CTE) columns — inline recomputation of the
    sorted array per lambda element would be O(D·N·log N) per row.
    NOTE the Spark side's array_distinct preserves the sorted input
    order; the DuckDB materialization must use
    list_sort(list_distinct(...)) since list_distinct alone does not
    guarantee order."""
    n = f"CAST(len({s_col}) AS DOUBLE)"
    return (
        f"CASE WHEN len({s_col}) > 0 THEN CAST(list_sum("
        f"list_transform({ks_col}, "
        f"k -> CAST(FLOOR((CAST(k AS DOUBLE) / {n}) "
        f"* ln({n} / CAST(k AS DOUBLE)) * 1e6 + 5e-1) AS BIGINT))) "
        f"AS DOUBLE) / 1e6 ELSE 0.0 END"
    )


# ---------------------------------------------------------------------
# Hashed bag-of-words text embedding (feature hashing)
# ---------------------------------------------------------------------


def hash_embedding_cols(text_col: str, dim: int = 64):
    """Three Spark Columns ``(words, buckets, counts)`` to materialize
    (as ``__w``, ``__hb``, ``__cnt``) for :func:`hash_embedding_sql`:
    word tokens, their md5 hash buckets, and the per-bucket count
    vector (feature hashing, Weinberger et al. 2009). Materializing
    keeps the md5 per word evaluated once."""
    words = F.expr(_words_sql(text_col))
    buckets = F.expr(
        "transform(__w, w -> cast(conv(substring(md5(w), 1, 15), 16, 10) "
        f"as bigint) % {dim})"
    )
    counts = F.expr(
        f"transform(sequence(0, {dim - 1}), "
        "i -> size(filter(__hb, b -> b = i)))"
    )
    return words, buckets, counts


def hash_embedding_sql(cnt_col: str) -> str:
    """Spark SQL fragment: L2-normalized double vector from the count
    column — norm from an exact integer sum of squares, one double
    division per dimension (identical IEEE ops in the DuckDB twin);
    all-zero counts (empty docs) map to the zero vector."""
    n2 = f"aggregate({cnt_col}, 0L, (a, c) -> a + cast(c as bigint) * c)"
    return (
        f"case when {n2} = 0 then transform({cnt_col}, c -> 0.0d) "
        f"else transform({cnt_col}, c -> cast(c as double) / "
        f"sqrt(cast({n2} as double))) end"
    )


def hash_embedding_duck(text_col: str, dim: int = 64) -> str:
    """DuckDB twin of the full chain (CTE-free single fragment is too
    slow — callers should materialize in CTEs; this returns the three
    stage fragments)."""
    words = f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}')"
    buckets = (
        f"list_transform(__w, w -> ('0x' || substr(md5(w), 1, 15))::BIGINT "
        f"% {dim})"
    )
    counts = (
        f"list_transform(generate_series(0, {dim - 1}), "
        "i -> len(list_filter(__hb, b -> b = i)))"
    )
    n2 = "list_sum(list_transform(__cnt, c -> CAST(c AS BIGINT) * c))"
    vec = (
        f"CASE WHEN COALESCE({n2}, 0) = 0 "
        "THEN list_transform(__cnt, c -> CAST(0.0 AS DOUBLE)) "
        f"ELSE list_transform(__cnt, c -> CAST(c AS DOUBLE) / "
        f"sqrt(CAST({n2} AS DOUBLE))) END"
    )
    return words, buckets, counts, vec


def c4_line_filters(
    df,
    id_col: str,
    text_col: str,
    min_words: int = 5,
    min_lines: int = 3,
):
    """The C4 line/page cleaning rules (Raffel et al. 2020, "Exploring
    the Limits of Transfer Learning...", §2.2), as one row-local pass:

    - keep only lines that end in terminal punctuation (``. ! ? "``)
      and contain ≥ ``min_words`` whitespace-words;
    - drop lines containing "javascript";
    - drop the WHOLE page if it contains "lorem ipsum" or a curly
      brace, or fewer than ``min_lines`` lines survive the line pass.

    Everything is array/string built-ins over the line split — zero
    shuffle, codegen'd, a pure map over the corpus scan at any scale.
    Word counting and suffix checks use only engine-portable pieces
    (``[^ ]+`` extraction, ``right``/``contains`` string ops — no
    regex-dialect edges).

    Output: ``(id, kept boolean, n_lines int, n_lines_kept int,
    text_clean string)`` — ``text_clean`` is the surviving lines
    re-joined with newlines ('' when the page is dropped).
    """
    lines = f"split({text_col}, '\\n')"
    keep_line = (
        f"x -> size(regexp_extract_all(x, '[^ ]+', 0)) >= {min_words}"
        " AND right(rtrim(x), 1) IN ('.', '!', '?', '\"')"
        " AND NOT contains(lower(x), 'javascript')"
    )
    kept = f"filter({lines}, {keep_line})"
    page_ok = (
        f"NOT contains(lower({text_col}), 'lorem ipsum')"
        f" AND NOT contains({text_col}, '{{')"
        f" AND size({kept}) >= {min_lines}"
    )
    return df.select(
        F.col(id_col),
        F.expr(page_ok).alias("kept"),
        F.expr(f"size({lines})").cast("int").alias("n_lines"),
        F.expr(f"size({kept})").cast("int").alias("n_lines_kept"),
        F.expr(
            f"CASE WHEN {page_ok} THEN array_join({kept}, '\\n')"
            " ELSE '' END"
        ).alias("text_clean"),
    )


def c4_line_filters_duck(
    table_sql: str,
    id_col: str,
    text_col: str,
    min_words: int = 5,
    min_lines: int = 3,
) -> str:
    """DuckDB twin of :func:`c4_line_filters`."""
    lines = f"string_split({text_col}, chr(10))"
    keep = (
        f"list_filter({lines}, x ->"
        f" LEN(regexp_extract_all(x, '[^ ]+')) >= {min_words}"
        " AND right(rtrim(x), 1) IN ('.', '!', '?', '\"')"
        " AND NOT contains(lower(x), 'javascript'))"
    )
    page_ok = (
        f"NOT contains(lower({text_col}), 'lorem ipsum')"
        f" AND NOT contains({text_col}, '{{')"
        f" AND LEN({keep}) >= {min_lines}"
    )
    return f"""
    SELECT {id_col},
           {page_ok} AS kept,
           CAST(LEN({lines}) AS INT) AS n_lines,
           CAST(LEN({keep}) AS INT) AS n_lines_kept,
           CASE WHEN {page_ok}
                THEN COALESCE(array_to_string({keep}, chr(10)), '')
                ELSE '' END AS text_clean
    FROM {table_sql}
    """
