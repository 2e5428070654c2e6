"""t2 query registry, batch 44: the round-7 composed release flagship.

Registered into the shared registry (imported from queries43 at module
end). Same determinism rules as the queries.py docstring.

- ``pipeline_release_v2``: the full 100 TB corpus-release dataflow in
  ONE query — Gopher quality gate -> Bloom-prefiltered incremental
  exact dedup against the prior release -> within-batch exact dedup ->
  winnowing near-dup removal -> benchmark decontamination -> Hamilton
  token-budget apportionment across languages -> greedy token-budget
  cap -> chunk + pack into training bins -> per-shard release
  manifest. Every stage is an operator that already passes alone
  (queries15/27/37/38/42/43); this proves they COMPOSE, with one
  chained WITH RECURSIVE oracle hash-checking the end state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_extensions_spark.operators.sampling import (
    hash_bucket,
    hash_bucket_duck,
    largest_remainder_alloc,
    largest_remainder_alloc_sql,
    token_budget_cap,
)
from spark_extensions_spark.operators.sketches import (
    bloom_prefilter_fresh,
    bloom_prefilter_oracle_sql,
)
from spark_extensions_spark.queries import _register, _t

# Stage parameters. The prior-release / benchmark cuts are hash
# buckets of the 10k-resolution house hash (independent salts), the
# token budget is in whitespace tokens (the same token the packer
# packs), pack shards bound the oracle's recursion depth exactly as
# pipeline_tokenize_pack's do.
_RG2_HIST_CUT = 3000    # 30% of gated docs simulate the prior release
_RG2_BENCH_CUT = 2000   # 20% of raw docs simulate the benchmark
_RG2_BUDGET = 9000      # whitespace tokens released per Hamilton run
_RG2_W, _RG2_S, _RG2_B = 64, 48, 256  # chunk window/stride, bin budget
_RG2_SHARDS = 4         # pack shards per language
_RG2_BF_D, _RG2_BF_M = 3, 4096  # bloom hash count / bit width
_RG2_CONTAM_MIN = 40    # shared distinct 3-grams that mark contamination


def _rg2_gopher_pass_duck() -> str:
    """DuckDB mirror of functions/text.py:gopher_rules' pass flag —
    the same fragments queries15._gopher_oracle verifies stand-alone,
    at thresholds calibrated to the synthetic corpus (min_words=30,
    min_stopword_hits=1; the fixture's generated English carries few
    real stopwords, so the Rae et al. default of 2 empties the gate —
    the RULES are what is under test, not the 2021 constants)."""
    ws = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    n = f"len({ws})"
    mean = (
        f"CASE WHEN {n} = 0 THEN 0.0 ELSE FLOOR("
        f"list_sum(list_transform({ws}, w -> length(w)))"
        f" / CAST({n} AS DOUBLE) * 1e6 + 0.5) / 1e6 END"
    )
    nsym = r"len(regexp_extract_all(text, '#|\.\.\.'))"
    sym = (
        f"CASE WHEN {n} = 0 THEN 0.0 "
        f"ELSE FLOOR({nsym} / CAST({n} AS DOUBLE) * 1e6 + 0.5) / 1e6 END"
    )
    nalpha = f"len(list_filter({ws}, w -> regexp_matches(w, '[a-z]')))"
    alpha = (
        f"CASE WHEN {n} = 0 THEN 0.0 "
        f"ELSE FLOOR({nalpha} / CAST({n} AS DOUBLE) * 1e6 + 0.5) / 1e6 END"
    )
    from spark_extensions_spark.functions.text import STOPWORDS

    stop = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    hits = f"len(list_intersect(list_distinct({ws}), [{stop}]))"
    return (
        f"{n} >= 30 AND {n} <= 100000 AND ({mean}) >= 3.0 "
        f"AND ({mean}) <= 10.0 AND ({sym}) <= 0.1 "
        f"AND ({alpha}) > 0.8 AND ({hits}) >= 1"
    )


def _rg2_shingles_duck(source: str) -> str:
    """Distinct 3-gram shingle hashes per doc (the queries4
    text_contamination hashing, md5 lower-15-hex -> BIGINT)."""
    return f"""
      SELECT doc_id, unnest(list_distinct(list_transform(
               CASE WHEN len(ws) < 3 THEN []
                    ELSE list_transform(generate_series(0, len(ws) - 3),
                                        i -> array_to_string(ws[i+1:i+3], ' '))
               END,
               s -> ('0x' || substr(md5(s), 1, 15))::BIGINT))) AS s
      FROM (SELECT doc_id,
                   regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
            FROM {source})
    """


def _release_v2_oracle() -> str:
    from spark_extensions_spark.operators.dedup import (
        winnow_fingerprints_oracle_sql,
    )

    w, s, b = _RG2_W, _RG2_S, _RG2_B
    bloom = bloom_prefilter_oracle_sql(
        "SELECT doc_id, text_key FROM rg2_batch",
        "SELECT text_key FROM rg2_hist",
        "doc_id",
        "text_key",
        d=_RG2_BF_D,
        m=_RG2_BF_M,
    )
    winnow = winnow_fingerprints_oracle_sql(
        "SELECT doc_id, text FROM rg2_dd", "doc_id", "text", k=5, w=4
    )
    hamilton = largest_remainder_alloc_sql(
        "SELECT lang, CAST(SUM(n_tok) AS BIGINT) AS mass"
        " FROM rg2_clean GROUP BY lang",
        "lang",
        "mass",
        _RG2_BUDGET,
    )
    return f"""
    WITH RECURSIVE rg2_gop AS (
      SELECT doc_id, lang, text, n_chars,
             LEN(string_split(text, ' ')) AS n_tok,
             ({_rg2_gopher_pass_duck()}) AS gp
      FROM documents
    ),
    rg2_gated AS (
      SELECT doc_id, lang, text, n_tok, md5(text) AS text_key
      FROM rg2_gop
      WHERE (lang = 'en' AND gp)
         OR (lang <> 'en' AND n_chars BETWEEN 100 AND 100000
             AND n_tok >= 20)
    ),
    rg2_hist AS (
      SELECT * FROM rg2_gated
      WHERE {hash_bucket_duck('doc_id', 'relv1')} < {_RG2_HIST_CUT}
    ),
    rg2_batch AS (
      SELECT * FROM rg2_gated
      WHERE NOT ({hash_bucket_duck('doc_id', 'relv1')} < {_RG2_HIST_CUT})
    ),
    rg2_bloom AS ({bloom}),
    rg2_fresh AS (
      SELECT b.* FROM rg2_batch b
      JOIN rg2_bloom f ON b.doc_id = f.id AND NOT f.confirmed_dup
    ),
    rg2_dd AS (
      SELECT doc_id, lang, text, n_tok FROM (
        SELECT f.*, ROW_NUMBER() OVER (
                 PARTITION BY text_key ORDER BY doc_id) AS rn
        FROM rg2_fresh f
      ) WHERE rn = 1
    ),
    rg2_fps AS ({winnow}),
    rg2_cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM rg2_fps a JOIN rg2_fps b
        ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    rg2_nd AS (
      SELECT * FROM rg2_dd
      WHERE doc_id NOT IN (SELECT id_b FROM rg2_cand)
    ),
    rg2_shc AS ({_rg2_shingles_duck('rg2_nd')}),
    rg2_shb AS (
      SELECT DISTINCT s FROM ({_rg2_shingles_duck(
          "(SELECT doc_id, text FROM documents WHERE "
          + hash_bucket_duck('doc_id', 'relbench')
          + f" < {_RG2_BENCH_CUT})")})
    ),
    rg2_contam AS (
      SELECT c.doc_id FROM rg2_shc c JOIN rg2_shb b ON c.s = b.s
      GROUP BY c.doc_id HAVING COUNT(*) >= {_RG2_CONTAM_MIN}
    ),
    rg2_clean AS (
      SELECT * FROM rg2_nd
      WHERE doc_id NOT IN (SELECT doc_id FROM rg2_contam)
    ),
    rg2_alloc AS ({hamilton}),
    rg2_cum AS (
      SELECT c.doc_id, c.lang, c.n_tok, a.alloc,
             CAST(SUM(c.n_tok) OVER (
               PARTITION BY c.lang
               ORDER BY {hash_bucket_duck('c.doc_id', 'relv2', 1 << 60)},
                        c.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_tok
      FROM rg2_clean c JOIN rg2_alloc a USING (lang)
    ),
    rg2_kept AS (SELECT * FROM rg2_cum WHERE cum_tok <= alloc),
    rg2_base AS (
      SELECT doc_id,
             lang || '|' || CAST(doc_id % {_RG2_SHARDS} AS VARCHAR)
               AS pack_key,
             n_tok AS n,
             CASE WHEN n_tok <= {w} THEN 1
                  ELSE CAST(FLOOR((n_tok - {w} + {s} - 1) / {s}) AS INT) + 1
             END AS n_chunks
      FROM rg2_kept
    ),
    rg2_chunks AS (
      SELECT doc_id, pack_key,
             UNNEST(generate_series(0, n_chunks - 1)) AS chunk_id, n
      FROM rg2_base
    ),
    rg2_sized AS (
      SELECT pack_key, doc_id, chunk_id,
             LEAST(n - chunk_id * {s}, {w}) AS n_tokens
      FROM rg2_chunks
    ),
    rg2_ordered AS (
      SELECT pack_key, doc_id, chunk_id, n_tokens,
             ROW_NUMBER() OVER (PARTITION BY pack_key
                                ORDER BY doc_id, chunk_id) AS rn
      FROM rg2_sized
    ),
    rg2_walk AS (
      SELECT pack_key, rn, n_tokens, 0 AS bin_id, n_tokens AS fill
      FROM rg2_ordered WHERE rn = 1
      UNION ALL
      SELECT o.pack_key, o.rn, o.n_tokens,
             CASE WHEN wk.fill + o.n_tokens > {b}
                  THEN wk.bin_id + 1 ELSE wk.bin_id END,
             CASE WHEN wk.fill + o.n_tokens > {b}
                  THEN o.n_tokens ELSE wk.fill + o.n_tokens END
      FROM rg2_walk wk
      JOIN rg2_ordered o
        ON o.pack_key = wk.pack_key AND o.rn = wk.rn + 1
    )
    SELECT pack_key,
           CAST(MAX(bin_id) + 1 AS BIGINT) AS n_bins,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM rg2_walk GROUP BY pack_key
    """


@_register(
    "pipeline_release_v2",
    _release_v2_oracle(),
    doc="The composed corpus-release flagship — eight production "
    "stages as ONE dataflow, hash-verified end-to-end by a single "
    "chained WITH RECURSIVE oracle: (1) Gopher quality gate (row-"
    "local; English rules for en, length band for the rest), "
    "(2) Bloom-prefiltered incremental exact dedup against the prior "
    "release (history folds to <=4096 broadcast bits; only the FPR-"
    "bounded maybe-set pays the exact join — operators/sketches.py:"
    "bloom_prefilter_dedup), (3) within-batch exact dedup keep-first "
    "(one md5 shuffle), (4) winnowing near-dup removal (Schleimer "
    "MOSS fingerprints, grouped pair expansion — operators/dedup.py:"
    "winnow_fingerprints), (5) benchmark decontamination (broadcast "
    "distinct-shingle set, >=40 shared distinct 3-grams = "
    "_RG2_CONTAM_MIN), (6) Hamilton largest-"
    "remainder apportionment of a 9k-token budget across languages "
    "(DECIMAL(38,0) quotas, Σ alloc == budget), (7) deterministic "
    "greedy token-budget cap per language (md5-ordered window "
    "cumsum), (8) chunk(64/48) + greedy pack(256) into training bins "
    "-> per-(lang, shard) release manifest. Scale shape: stages 1-5 "
    "are broadcast-or-bucket bounded (no all-pairs anywhere), stage 6 "
    "runs on the domain-sized language table, stages 7-8 shuffle once "
    "each on lang / pack_key. Every stage passes alone as its own "
    "registry query; this proves composition.",
)
def q_pipeline_release_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_extensions_spark.functions.text import (
        chunk_windows,
        gopher_rules,
        pack_chunks,
    )
    from spark_extensions_spark.operators.dedup import (
        ngram_contamination,
        winnow_candidates,
        winnow_fingerprints,
    )
    from spark_extensions_spark.session import ensure_parallelism

    # Both the release pipeline (via `gated`) AND the benchmark branch
    # (`bench`, below) consume the widened raw table; without a
    # checkpoint the unsplittable single-file scan + round-robin
    # exchange execute twice (profiled 2.2 s + 1.1 s of the cold run).
    # One lazy checkpoint of the raw rows runs that lineage once.
    docs = ensure_parallelism(
        _t(spark, sf_dir, "documents")["documents"]
    ).localCheckpoint(eager=False)
    g = docs.select(
        "doc_id",
        "lang",
        "text",
        "n_chars",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tok"),
        gopher_rules("text", min_words=30, min_stopword_hits=1)[5],
    )
    gated = (
        g.filter(
            ((F.col("lang") == "en") & F.col("gopher_pass"))
            | (
                (F.col("lang") != "en")
                & F.col("n_chars").between(100, 100000)
                & (F.col("n_tok") >= 20)
            )
        )
        .select(
            "doc_id",
            "lang",
            "text",
            "n_tok",
            F.md5(F.col("text").cast("binary")).alias("text_key"),
        )
        .localCheckpoint(eager=False)
    )
    prior = hash_bucket("doc_id", "relv1") < _RG2_HIST_CUT
    hist = gated.filter(prior)
    batch = gated.filter(~prior)
    # fused fresh-set form (one pass: mask probe + FPR-bounded anti
    # join) — the flag form + join-back this replaced shipped every
    # batch row's TEXT through a second doc_id join; row-identical
    fresh = bloom_prefilter_fresh(
        batch, hist, "text_key", d=_RG2_BF_D, m=_RG2_BF_M
    )
    wdup = Window.partitionBy("text_key").orderBy("doc_id")
    dd = (
        fresh.withColumn("rn", F.row_number().over(wdup))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "text", "n_tok")
        .localCheckpoint(eager=False)
    )
    fps = winnow_fingerprints(dd, "doc_id", "text", k=5, w=4)
    cand = winnow_candidates(fps, "doc_id", min_shared=2)
    nd = dd.join(
        cand.select(F.col("id_b").alias("doc_id")).distinct(),
        "doc_id",
        "left_anti",
    )
    bench = docs.filter(
        hash_bucket("doc_id", "relbench") < _RG2_BENCH_CUT
    ).select("doc_id", "text")
    contam = ngram_contamination(
        nd, bench, "doc_id", "text", "doc_id", "text", n=3,
        min_overlap=_RG2_CONTAM_MIN
    )
    clean = nd.join(
        contam.select("doc_id"), "doc_id", "left_anti"
    ).localCheckpoint(eager=False)
    counts = clean.groupBy("lang").agg(
        F.sum("n_tok").cast("bigint").alias("mass")
    )
    alloc = largest_remainder_alloc(counts, "lang", "mass", _RG2_BUDGET)
    # Budget-cap on NARROW rows, then re-attach text (guide §8: decide
    # with small rows, move the payload once): the per-lang cumsum
    # window previously sorted full text payloads into one task per
    # language (profiled ~1.0 s single-task). The capped id set is
    # budget-bounded by construction (≤ alloc tokens per language), so
    # the re-attach broadcast is principled at any corpus size.
    kept_ids = token_budget_cap(
        clean.select("doc_id", "lang", "n_tok").join(
            F.broadcast(alloc.select("lang", "alloc")), "lang"
        ),
        "lang",
        "doc_id",
        "n_tok",
        budget=F.col("alloc"),
        salt="relv2",
    )
    kept = clean.join(
        F.broadcast(kept_ids.select("doc_id")), "doc_id"
    )
    chunks = chunk_windows(
        kept.select("doc_id", "text"),
        "doc_id",
        "text",
        window_tokens=_RG2_W,
        stride=_RG2_S,
    )
    keyed = chunks.join(
        kept.select(
            "doc_id",
            F.concat_ws(
                "|",
                F.col("lang"),
                (F.col("doc_id") % _RG2_SHARDS).cast("string"),
            ).alias("pack_key"),
        ),
        "doc_id",
    )
    packed = pack_chunks(
        keyed.select("pack_key", "doc_id", "chunk_id", "n_tokens"),
        "pack_key",
        ["doc_id", "chunk_id"],
        "n_tokens",
        budget=_RG2_B,
    )
    return packed.groupBy("pack_key").agg(
        (F.max("bin_id") + 1).cast("bigint").alias("n_bins"),
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
    )


# batch 45 registers at import time, same chain as queries43 -> 44
from spark_extensions_spark import queries45  # noqa: E402,F401  (registration side effect)
