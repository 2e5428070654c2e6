"""Distributed lexical retrieval: inverted index, BM25, TF-IDF.

A training-data pipeline needs keyword retrieval for targeted corpus
audits ("show me the docs about X"), decontamination review, and
quality slicing — at 100 TB that means a *distributed inverted index*,
never a driver-side scan.

Everything here is built from groupBy/join shuffle shapes that survive
scale:

- ``tokenize`` is a zero-shuffle projection (split + explode).
- ``term_frequencies`` / ``doc_lengths`` are single hash aggregates
  (map-side partial combine).
- ``bm25_search`` filters the posting list to the query terms *before*
  any join (predicate pushes to the tf aggregate output), broadcasts
  the tiny per-term df table and the 1-row corpus stats, and only
  shuffles the candidate postings — the corpus itself is touched by
  exactly the two index-building aggregates. On a real deployment the
  (tf, dl, df) index tables would be written once and reused per
  query; the builder functions are factored so callers can persist
  them (same pattern as ``dedup.minhash_band_table``).

Determinism contract (DuckDB oracle hash-equality): token order never
matters (hash aggregates), per-term BM25 contributions are rounded to
8 decimals and summed as DECIMAL (order-free), ln/÷ are written
identically on both engines.

Reference parity note: the reference repo (smart-data-lake/
spark-extensions) has no retrieval surface; this extends the
LLM-pipeline layer mandated by the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_RE = "[^a-z0-9]+"

# BM25 constants (Robertson/Sparck Jones defaults).
K1 = 1.2
B = 0.75


def tokenize(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Lowercase word tokens, one row per (doc, token). Zero shuffle."""
    return (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), TOKEN_RE)).alias("term"),
        )
        .filter(F.col("term") != "")
    )


def term_frequencies(tokens: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc, term, tf) posting list — the inverted index fact table."""
    return tokens.groupBy(id_col, "term").agg(F.count("*").alias("tf"))


def doc_lengths(tokens: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc, dl) token counts."""
    return tokens.groupBy(id_col).agg(F.count("*").alias("dl"))


def bm25_search(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
) -> DataFrame:
    """Top-k docs by BM25 for a bag of query terms.

    Plan shape: 2 index aggregates over the corpus, then joins confined
    to the filtered posting list (broadcast df + stats, co-keyed dl
    join), window top-k. No driver-side state.
    """
    toks = tokenize(df, text_col, id_col)
    # Materialize the (doc, term, tf) index once (lazy localCheckpoint):
    # four downstream branches (postings, df, dl, stats) otherwise each
    # re-run the corpus scan + explode — the term-filter pushdown makes
    # their subplans non-identical, so ReuseExchange can't dedupe them.
    # On a persistent deployment you'd write tf out and reuse it across
    # queries (same pattern as dedup.minhash_band_table).
    tf = term_frequencies(toks, id_col).localCheckpoint(eager=False)
    # dl = sum(tf) per doc ≡ token count, derived from the index instead
    # of a second tokenize pass.
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    dfreq = (
        tf.filter(F.col("term").isin(query_terms))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    postings = (
        tf.filter(F.col("term").isin(query_terms))
        .join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
    )
    contrib = postings.select(
        F.col(id_col),
        # floor(x*1e8+0.5) integer units: round(ln-derived, 8) is
        # engine-nonportable (Spark rescales via BigDecimal, DuckDB in
        # double) — the NOTES round()-hazard class
        F.expr(
            f"cast(floor(("
            f"  ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)"
            f"  * (tf * ({K1} + 1.0))"
            f"  / (tf + {K1} * (1.0 - {B} + {B} * dl / avgdl))"
            f") * 100000000.0d + 0.5d) as bigint)"
        ).alias("c_e8"),
    )
    scored = contrib.groupBy(id_col).agg(
        # exact integer sum; /100 then floor(+0.5) keeps the historical
        # 6-decimal score scale, fully deterministic on both engines
        F.expr(
            "floor(cast(sum(c_e8) as double) / 100.0d + 0.5d)"
            " / 1000000.0d"
        ).alias("score")
    )
    # orderBy + limit compiles to TakeOrderedAndProject: per-partition
    # top-k then a k-row driver merge — no single-partition window.
    return (
        scored.orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
        .select(id_col, "score")
    )


def bm25_oracle_sql(query_terms: list[str], k: int = 20) -> str:
    """DuckDB twin of :func:`bm25_search` (textually identical math)."""
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
    WITH tok AS (
      SELECT doc_id, term FROM (
        SELECT doc_id,
               UNNEST(STRING_SPLIT_REGEX(LOWER(text), '{TOKEN_RE}')) AS term
        FROM documents
      ) WHERE term <> ''
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ),
    dfreq AS (
      SELECT term, COUNT(*) AS df FROM tf
      WHERE term IN ({terms}) GROUP BY term
    ),
    contrib AS (
      SELECT tf.doc_id,
             CAST(FLOOR((
               LN((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
               * (tf.tf * ({K1} + 1.0))
               / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl))
             ) * 1e8 + 0.5) AS BIGINT) AS c_e8
      FROM tf
      JOIN dfreq ON tf.term = dfreq.term
      JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN stats
    ),
    scored AS (
      SELECT doc_id,
             FLOOR(CAST(SUM(c_e8) AS DOUBLE) / 100.0 + 0.5)
               / 1e6 AS score
      FROM contrib GROUP BY doc_id
    )
    SELECT doc_id, score FROM (
      SELECT doc_id, score,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rn
      FROM scored
    ) WHERE rn <= {k}
    """


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_per_doc: int = 3,
    min_len: int = 3,
) -> DataFrame:
    """Top-n characteristic terms per doc by smoothed TF-IDF.

    tfidf = tf * (ln((1 + N) / (1 + df)) + 1), rounded to 6 decimals
    for cross-engine hash equality; ties broken lexicographically.
    Plan: two aggregates + one broadcast(df-per-term is corpus-sized,
    so it stays a shuffled join) + window per doc.
    """
    toks = tokenize(df, text_col, id_col).filter(F.length("term") >= min_len)
    tf = term_frequencies(toks, id_col)
    n_docs = df.agg(F.count("*").alias("n_docs"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            # fixed-point floor, not round(ln-derived, 6) — see NOTES
            F.expr(
                "floor(tf * (ln((1.0 + n_docs) / (1.0 + df)) + 1.0)"
                " * 1000000.0d + 0.5d) / 1000000.0d"
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_per_doc)
        .select(id_col, "term", "tfidf", F.col("rn").cast("int").alias("rn"))
    )


def tfidf_oracle_sql(top_per_doc: int = 3, min_len: int = 3) -> str:
    """DuckDB twin of :func:`tfidf_top_terms`."""
    return f"""
    WITH tok AS (
      SELECT doc_id, term FROM (
        SELECT doc_id,
               UNNEST(STRING_SPLIT_REGEX(LOWER(text), '{TOKEN_RE}')) AS term
        FROM documents
      ) WHERE term <> '' AND LENGTH(term) >= {min_len}
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id, tf.term,
             FLOOR(tf.tf * (LN((1.0 + nd.n_docs) / (1.0 + dfreq.df)) + 1.0)
                   * 1e6 + 0.5) / 1e6 AS tfidf
      FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN nd
    )
    SELECT doc_id, term, tfidf, CAST(rn AS INT) AS rn FROM (
      SELECT doc_id, term, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rn
      FROM scored
    ) WHERE rn <= {top_per_doc}
    """


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k0: int = 60,
    k: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked candidate lists.

    The standard hybrid-retrieval merge (Cormack/Clarke/Buettcher,
    SIGIR'09): ``score(d) = Σ 1 / (k0 + rank_i(d))`` over the lists the
    document appears in. Rank-based, so the lexical and dense scores
    need no calibration against each other.

    Inputs are ``(id, rank)`` lists (rank 1-based). Plan: one full-outer
    join on the doc id (both lists are top-N sized — tiny next to the
    corpus, and broadcastable), fixed two-term double sum (no FP
    order hazard, so the score needs no rounding to hash-match an
    oracle), TakeOrderedAndProject top-k.

    Output: ``(id, rrf_score, rank_a, rank_b)`` — ranks NULL where the
    doc missed that list.
    """
    a = ranked_a.select(F.col(id_col).alias("id"), F.col(rank_col).alias("rank_a"))
    b = ranked_b.select(F.col(id_col).alias("id"), F.col(rank_col).alias("rank_b"))
    fused = a.join(b, "id", "full_outer").select(
        "id",
        (
            F.coalesce(F.lit(1.0) / (F.lit(k0) + F.col("rank_a")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(k0) + F.col("rank_b")), F.lit(0.0))
        ).alias("rrf_score"),
        F.col("rank_a").cast("int").alias("rank_a"),
        F.col("rank_b").cast("int").alias("rank_b"),
    )
    return (
        fused.orderBy(F.desc("rrf_score"), F.col("id"))
        .limit(k)
        .select(F.col("id").alias(id_col), "rrf_score", "rank_a", "rank_b")
    )


def rrf_oracle_sql(
    lex_sql: str,
    dense_sql: str,
    k0: int = 60,
    k: int = 20,
) -> str:
    """DuckDB twin of :func:`rrf_fuse` over two ranked-list subqueries.

    Each input SQL must yield ``(doc_id, rank)``. The two reciprocal
    terms are written in the same fixed order as the Spark expression,
    in double — bit-identical, unrounded.
    """
    return f"""
    WITH lex AS ({lex_sql}),
         dense AS ({dense_sql}),
         fused AS (
           SELECT COALESCE(lex.doc_id, dense.doc_id) AS doc_id,
                  COALESCE(CAST(1 AS DOUBLE) / ({k0} + lex.rank), CAST(0 AS DOUBLE))
                  + COALESCE(CAST(1 AS DOUBLE) / ({k0} + dense.rank), CAST(0 AS DOUBLE))
                    AS rrf_score,
                  CAST(lex.rank AS INT) AS rank_a,
                  CAST(dense.rank AS INT) AS rank_b
           FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id
         )
    SELECT doc_id, rrf_score, rank_a, rank_b FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id) AS rn
      FROM fused
    ) WHERE rn <= {k}
    """


# ---------------------------------------------------------------------
# Collocation mining: lift-scored bigrams (log-free PMI analogue)
# ---------------------------------------------------------------------

# shared Spark/DuckDB fragment (both parse it): exact-int products in
# double, floor-quantized to 6dp — identical IEEE ops on both engines
# (round()'s rescale path is engine-specific; the NOTES hazard class)
# 1e6 (not the plain literal 1000000.0): Spark parses the plain form
# as DECIMAL, which flips the division to decimal arithmetic; 1e6 is
# DOUBLE in both dialects
_LIFT = (
    "FLOOR((CAST(c_xy AS DOUBLE) * CAST(nu AS DOUBLE) * CAST(nu AS DOUBLE))"
    " / (CAST(nb AS DOUBLE) * CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE))"
    " * 1e6 + 0.5) / 1e6"
)


def collocations(
    docs: DataFrame,
    text_col: str,
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Top-k lift-scored word bigrams over the corpus.

    lift = P(xy) / (P(x)·P(y)) — the monotone log-free PMI analogue
    (exp(PMI)); integer counts + one shared double expression keep the
    score engine-portable (NOTES.md: no libm). Plan: one scan feeds
    both the unigram and bigram counts, two hash aggregates, two
    broadcast-able joins of the bigram table against the unigram
    counts, deterministic tiebroken top-k.
    Output: (gram, c_xy, lift) ordered for display.
    """
    from spark_extensions_spark.operators.dedup import shingles_from_words

    words = docs.select(
        F.expr(
            f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"
        ).alias("__w")
    )
    uni = (
        words.select(F.explode("__w").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    big = (
        words.select(F.explode(shingles_from_words("__w", 2)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= min_count)
    )
    nu = uni.agg(F.sum("c").alias("nu"))
    nb_all = (
        words.select(
            (F.greatest(F.size("__w") - 1, F.lit(0))).alias("nb_doc")
        )
        .agg(F.sum("nb_doc").alias("nb"))
    )
    split = big.select(
        "gram",
        "c_xy",
        F.split(F.col("gram"), " ").getItem(0).alias("w1"),
        F.split(F.col("gram"), " ").getItem(1).alias("w2"),
    )
    joined = (
        split.join(uni.select(F.col("w").alias("w1"), F.col("c").alias("cx")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("cy")), "w2")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb_all))
    )
    scored = joined.select(
        "gram",
        F.col("c_xy").cast("bigint").alias("c_xy"),
        F.expr(_LIFT).alias("lift"),
    )
    return scored.orderBy(
        F.col("lift").desc(), F.col("gram")
    ).limit(k)


def collocations_oracle_sql(
    table: str, text_col: str, min_count: int = 5, k: int = 50
) -> str:
    return f"""
    WITH w AS (
      SELECT regexp_extract_all(lower({text_col}), '[a-z0-9]+') AS ws
      FROM {table}
    ),
    uni AS (
      SELECT unnest(ws) AS w FROM w
    ),
    unic AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY 1),
    big AS (
      SELECT unnest(CASE WHEN len(ws) < 2 THEN []
                         ELSE list_transform(generate_series(0, len(ws) - 2),
                                             i -> array_to_string(ws[i+1:i+2], ' '))
                    END) AS gram
      FROM w
    ),
    bigc AS (
      SELECT gram, COUNT(*) AS c_xy FROM big GROUP BY 1
      HAVING COUNT(*) >= {min_count}
    ),
    tot AS (
      SELECT (SELECT SUM(c) FROM unic) AS nu,
             (SELECT SUM(GREATEST(len(ws) - 1, 0)) FROM w) AS nb
    )
    SELECT gram, CAST(c_xy AS BIGINT) AS c_xy, lift FROM (
      SELECT b.gram, b.c_xy, {_LIFT} AS lift,
             ROW_NUMBER() OVER (ORDER BY {_LIFT} DESC, b.gram) AS rn
      FROM bigc b
      JOIN unic u1 ON u1.w = split_part(b.gram, ' ', 1)
      JOIN unic u2 ON u2.w = split_part(b.gram, ' ', 2)
      CROSS JOIN tot,
      LATERAL (SELECT u1.c AS cx, u2.c AS cy) s
    ) WHERE rn <= {k}
    """


# ---------------------------------------------------------------------
# Pseudo-relevance-feedback query expansion (Rocchio-style PRF)
# ---------------------------------------------------------------------


def prf_search(
    df: DataFrame,
    seed_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    n_fb: int = 10,
    n_expand: int = 5,
    max_df_ratio: float = 0.25,
    min_len: int = 4,
) -> DataFrame:
    """BM25 with pseudo-relevance-feedback expansion: search the seed
    terms, mine the top feedback docs for discriminative terms, search
    again with the expanded bag.

    Expansion terms = top ``n_expand`` by total tf across the ``n_fb``
    feedback docs, excluding seed terms, short tokens, and corpus-wide
    terms (df/n_docs > ``max_df_ratio``); (Σtf desc, term asc)
    tiebreak — fully deterministic.  The two tiny driver collects
    (feedback ids, expansion terms) are PLAN-TIME query construction —
    standard for expansion — never corpus data movement.
    """
    fb_ids = [
        r[id_col]
        for r in bm25_search(df, seed_terms, text_col, id_col, k=n_fb)
        .select(id_col)
        .collect()
    ]
    toks = tokenize(df, text_col, id_col)
    tf = term_frequencies(toks, id_col)
    n_docs = df.count()
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    cand = (
        tf.filter(F.col(id_col).isin(fb_ids))
        .filter(~F.col("term").isin(seed_terms))
        .filter(F.length("term") >= min_len)
        .groupBy("term")
        .agg(F.sum("tf").alias("fbtf"))
        .join(dfreq, "term")
        .filter(F.col("df") <= int(max_df_ratio * n_docs))
        .orderBy(F.col("fbtf").desc(), F.col("term"))
        .limit(n_expand)
    )
    expansion = [r["term"] for r in cand.collect()]
    return bm25_search(
        df, list(seed_terms) + expansion, text_col, id_col, k=k
    )


def prf_oracle_sql(
    seed_terms: list[str],
    k: int = 20,
    n_fb: int = 10,
    n_expand: int = 5,
    max_df_ratio: float = 0.25,
    min_len: int = 4,
) -> str:
    """DuckDB twin: the expansion-term mining and BOTH BM25 rounds in
    one SQL statement (same math, same tiebreaks)."""
    seeds = ", ".join(f"'{t}'" for t in seed_terms)
    score = (
        f"CAST(FLOOR(("
        f"  LN((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)"
        f"  * (tf.tf * ({K1} + 1.0))"
        f"  / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl))"
        f") * 1e8 + 0.5) AS BIGINT)"
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, term FROM (
        SELECT doc_id,
               UNNEST(STRING_SPLIT_REGEX(LOWER(text), '{TOKEN_RE}')) AS term
        FROM documents
      ) WHERE term <> ''
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    fb AS (
      SELECT doc_id FROM (
        SELECT tf.doc_id,
               FLOOR(CAST(SUM({score}) AS DOUBLE) / 100.0 + 0.5)
                 / 1e6 AS score
        FROM tf JOIN dfreq ON tf.term = dfreq.term
        JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats
        WHERE tf.term IN ({seeds})
        GROUP BY tf.doc_id
      ) q
      QUALIFY ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) <= {n_fb}
    ),
    expansion AS (
      SELECT term FROM (
        SELECT tf.term, SUM(tf.tf) AS fbtf, ANY_VALUE(dfreq.df) AS df
        FROM tf JOIN fb USING (doc_id) JOIN dfreq ON tf.term = dfreq.term
        WHERE tf.term NOT IN ({seeds}) AND LENGTH(tf.term) >= {min_len}
        GROUP BY tf.term
      ) c CROSS JOIN stats
      WHERE df <= CAST({max_df_ratio} * n_docs AS BIGINT)
      QUALIFY ROW_NUMBER() OVER (ORDER BY fbtf DESC, term) <= {n_expand}
    ),
    qterms AS (
      SELECT UNNEST([{seeds}]) AS term
      UNION SELECT term FROM expansion
    ),
    scored AS (
      SELECT tf.doc_id,
             FLOOR(CAST(SUM({score}) AS DOUBLE) / 100.0 + 0.5)
               / 1e6 AS score
      FROM tf JOIN qterms USING (term)
      JOIN dfreq ON tf.term = dfreq.term
      JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats
      GROUP BY tf.doc_id
    )
    SELECT doc_id, score FROM scored
    QUALIFY ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) <= {k}
    """
