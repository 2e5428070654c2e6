"""Alignment-data operators (operators/alignment.py) and Cohen's kappa
(operators/stats.py): hand-computed twins, tie-breaks, guards, and the
two-stage top-k equivalence."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from spark_extensions_spark.operators.alignment import (
    hard_negatives,
    preference_pairs,
)
from spark_extensions_spark.operators.stats import cohen_kappa


# ---------------------------------------------------------------------
# preference_pairs
# ---------------------------------------------------------------------


@pytest.fixture(scope="module")
def candidates(spark):
    # prompt p1: clear spread; p2: all tied (no pair); p3: one row;
    # p4: tie at the top AND at the bottom (id tiebreaks observable)
    rows = [
        ("p1", 1, 10), ("p1", 2, 30), ("p1", 3, 20),
        ("p2", 4, 5), ("p2", 5, 5),
        ("p3", 6, 99),
        ("p4", 7, 50), ("p4", 8, 50), ("p4", 9, 10), ("p4", 10, 10),
    ]
    return spark.createDataFrame(rows, "prompt string, id bigint, score bigint")


def test_preference_pairs_basic(candidates):
    out = {
        r["prompt"]: r
        for r in preference_pairs(
            candidates, "prompt", "id", "score", min_margin=1
        ).collect()
    }
    assert set(out) == {"p1", "p4"}  # p2 margin 0, p3 single row
    p1 = out["p1"]
    assert (p1["chosen_id"], p1["rejected_id"]) == (2, 1)
    assert (p1["chosen_score"], p1["rejected_score"]) == (30, 10)
    assert p1["margin"] == 20 and p1["n_candidates"] == 3
    # ties break to the LOWEST id on both sides
    p4 = out["p4"]
    assert (p4["chosen_id"], p4["rejected_id"]) == (7, 9)


def test_preference_pairs_margin_filter(candidates):
    out = preference_pairs(
        candidates, "prompt", "id", "score", min_margin=30
    ).collect()
    assert [r["prompt"] for r in out] == ["p4"]  # p1 margin 20 < 30


def test_preference_pairs_no_python_stage(candidates):
    plan = preference_pairs(
        candidates, "prompt", "id", "score"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


# ---------------------------------------------------------------------
# hard_negatives
# ---------------------------------------------------------------------


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(11)
    rows = []
    for i in range(200):
        v = rng.normal(size=8).astype("float32")
        rows.append((i, [float(x) for x in v], int(i % 3)))
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).localCheckpoint(eager=True)


def test_hard_negatives_matches_numpy(vectors):
    out = hard_negatives(
        vectors, "vec_id", "embedding", "label", [0, 1], k=4, dim=8
    ).collect()
    pdf = vectors.toPandas()
    mat = np.array([np.array(v, dtype=np.float64) for v in pdf.embedding])
    norms = np.sqrt((mat * mat).sum(axis=1))
    for anchor in (0, 1):
        a = mat[pdf.vec_id == anchor][0]
        albl = int(pdf[pdf.vec_id == anchor].label.iloc[0])
        cos = (mat @ a) / (norms * np.sqrt(a @ a))
        mask = (pdf.label.values != albl) & (pdf.vec_id.values != anchor)
        order = sorted(
            zip(-cos[mask], pdf.vec_id.values[mask]),
        )[:4]
        expect = [int(i) for _, i in order]
        got = [
            r["neg_id"]
            for r in sorted(
                (r for r in out if r["anchor_id"] == anchor),
                key=lambda r: r["rank"],
            )
        ]
        assert got == expect
        # every mined negative has a different label
        for r in out:
            if r["anchor_id"] == anchor:
                nlbl = int(pdf[pdf.vec_id == r["neg_id"]].label.iloc[0])
                assert nlbl != albl


def test_hard_negatives_two_stage_equals_one_window(vectors):
    """The bucketed two-stage top-k must be bit-identical to the naive
    single-window form (which the oracle uses)."""
    from spark_extensions_spark.operators.similarity import (
        cosine_similarity_col,
    )

    got = hard_negatives(
        vectors, "vec_id", "embedding", "label", [0, 1, 2], k=6, dim=8,
        pre_buckets=4,
    )
    anchors = vectors.filter(F.col("vec_id").isin([0, 1, 2])).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("avec"),
        F.col("label").alias("albl"),
    )
    w = Window.partitionBy("anchor_id").orderBy(F.desc("cosine"), "neg_id")
    naive = (
        vectors.crossJoin(F.broadcast(anchors))
        .filter(
            (F.col("label") != F.col("albl"))
            & (F.col("vec_id") != F.col("anchor_id"))
        )
        .select(
            "anchor_id",
            F.col("vec_id").alias("neg_id"),
            cosine_similarity_col("embedding", "avec", 8).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 6)
        .select("anchor_id", "neg_id", "rank", "cosine")
    )
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, naive.collect()))
    assert a == b


def test_hard_negatives_anchor_guard(vectors):
    with pytest.raises(ValueError, match="IVF"):
        hard_negatives(
            vectors, "vec_id", "embedding", "label",
            list(range(10_001)), k=2, dim=8,
        )


# ---------------------------------------------------------------------
# cohen_kappa
# ---------------------------------------------------------------------


def test_cohen_kappa_hand_computed(spark):
    # classic 2x2 example: n00=20, n01=5, n10=10, n11=15, N=50
    rows = (
        [("n", "n")] * 20 + [("n", "y")] * 5
        + [("y", "n")] * 10 + [("y", "y")] * 15
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohen_kappa(df, "a", "b").first()
    assert r["n_items"] == 50 and r["n_agree"] == 35
    # marginals: a: n=25,y=25; b: n=30,y=20 -> pe_num=25*30+25*20=1250
    assert r["pe_num"] == 1250
    assert r["kappa_num"] == 50 * 35 - 1250 == 500
    assert r["kappa_den"] == 2500 - 1250 == 1250
    assert r["kappa"] == 500.0 / 1250.0


def test_cohen_kappa_perfect_and_chance(spark):
    perfect = spark.createDataFrame(
        [("x", "x")] * 10 + [("y", "y")] * 10, "a string, b string"
    )
    assert cohen_kappa(perfect, "a", "b").first()["kappa"] == 1.0
    # rater b constant: pe == po -> kappa 0
    chance = spark.createDataFrame(
        [("x", "x")] * 10 + [("y", "x")] * 10, "a string, b string"
    )
    assert cohen_kappa(chance, "a", "b").first()["kappa"] == 0.0


def test_cohen_kappa_multiclass(spark):
    rng = np.random.RandomState(3)
    labs = ["a", "b", "c"]
    rows = [
        (labs[rng.randint(3)], labs[rng.randint(3)]) for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "ra string, rb string")
    r = cohen_kappa(df, "ra", "rb").first()
    # sklearn-free twin: compute from the same confusion matrix
    import collections

    cm = collections.Counter(rows)
    n = len(rows)
    agree = sum(v for (a, b), v in cm.items() if a == b)
    ra = collections.Counter(a for a, _ in rows)
    rb = collections.Counter(b for _, b in rows)
    pe_num = sum(ra[k] * rb[k] for k in labs)
    assert r["n_items"] == n and r["n_agree"] == agree
    assert r["pe_num"] == pe_num
    assert r["kappa"] == (n * agree - pe_num) / (n * n - pe_num)


def test_preference_pairs_null_scores_ignored(spark):
    rows = [("p", 1, None), ("p", 2, 10), ("p", 3, 4), ("q", 4, None)]
    df = spark.createDataFrame(rows, "prompt string, id bigint, score bigint")
    out = preference_pairs(df, "prompt", "id", "score").collect()
    assert len(out) == 1
    r = out[0]
    # the null-scored candidate neither wins nor loses, and the
    # all-null group emits nothing
    assert (r["prompt"], r["chosen_id"], r["rejected_id"]) == ("p", 2, 3)
    assert r["n_candidates"] == 2


def test_preference_pairs_string_ids(spark):
    """ids may be any orderable type — the tiebreak must not depend on
    numeric negation of the id column."""
    rows = [("p", "d2", 30), ("p", "d10", 30), ("p", "d1", 5)]
    df = spark.createDataFrame(rows, "prompt string, id string, score bigint")
    r = preference_pairs(df, "prompt", "id", "score").first()
    # tie at 30 breaks to the LEXICOGRAPHICALLY lowest id ('d10' < 'd2')
    assert (r["chosen_id"], r["rejected_id"]) == ("d10", "d1")
    assert (r["chosen_score"], r["rejected_score"]) == (30, 5)


def test_hard_negatives_empty_anchors(vectors):
    from spark_extensions_spark.operators.alignment import (
        hard_negatives_oracle_sql,
    )

    with pytest.raises(ValueError, match="empty"):
        hard_negatives(vectors, "vec_id", "embedding", "label", [], 2, 8)
    with pytest.raises(ValueError, match="empty"):
        hard_negatives_oracle_sql("cos", [], 2)


def test_cohen_kappa_degenerate_null(spark):
    # both raters constant and identical: denominator 0, kappa NULL
    df = spark.createDataFrame([("x", "x")] * 5, "a string, b string")
    r = cohen_kappa(df, "a", "b").first()
    assert r["kappa_den"] == 0 and r["kappa"] is None


def test_grouped_topk_equals_single_window(spark):
    """Property: the shared two-stage top-k is bit-identical to the
    one-window form on skewed group sizes, any k/pre_buckets."""
    import numpy as np

    from spark_extensions_spark.operators.sampling import grouped_topk

    rng = np.random.RandomState(5)
    rows = []
    rid = 0
    for g, size in [("mega", 500), ("mid", 37), ("tiny", 3), ("one", 1)]:
        for _ in range(size):
            rows.append((g, rid, int(rng.randint(0, 50))))
            rid += 1
    df = spark.createDataFrame(rows, "g string, id bigint, v bigint")
    for k, pb in [(1, 2), (7, 4), (40, 16)]:
        got = grouped_topk(
            df,
            ["g"],
            [F.desc("v"), F.col("id")],
            k,
            F.pmod(F.xxhash64("id"), F.lit(pb)),
            rank_col="rank",
        )
        w = Window.partitionBy("g").orderBy(F.desc("v"), F.col("id"))
        naive = (
            df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
        assert sorted(map(tuple, got.select("g", "id", "v", "rank").collect())) == sorted(
            map(tuple, naive.select("g", "id", "v", "rank").collect())
        ), (k, pb)


def test_hard_negatives_ivf_full_probe_equals_exact(vectors):
    """Probing every cell makes the IVF candidate set the whole
    wrong-label corpus, so the result must equal the exact miner."""
    from spark_extensions_spark.operators.alignment import (
        hard_negatives_ivf,
    )

    anchors = vectors.filter(F.col("vec_id") < 3)
    approx = hard_negatives_ivf(
        vectors, anchors, "vec_id", "embedding", "label",
        k=5, dim=8, n_lists=4, n_probe=4,
    )
    exact = hard_negatives(
        vectors, "vec_id", "embedding", "label", [0, 1, 2], k=5, dim=8
    )
    assert sorted(map(tuple, approx.collect())) == sorted(
        map(tuple, exact.collect())
    )


def test_hard_negatives_ivf_recall(vectors):
    """At n_probe < n_lists the miner is approximate but deterministic;
    recall vs exact should be reasonable and repeatable."""
    from spark_extensions_spark.operators.alignment import (
        hard_negatives_ivf,
    )

    anchors = vectors.filter(F.col("vec_id") < 5)
    runs = []
    for _ in range(2):
        got = hard_negatives_ivf(
            vectors, anchors, "vec_id", "embedding", "label",
            k=5, dim=8, n_lists=8, n_probe=3,
        )
        runs.append(sorted(map(tuple, got.collect())))
    assert runs[0] == runs[1]  # deterministic
    exact = {
        (r["anchor_id"], r["neg_id"])
        for r in hard_negatives(
            vectors, "vec_id", "embedding", "label", [0, 1, 2, 3, 4],
            k=5, dim=8,
        ).collect()
    }
    approx = {(a, n) for (a, n, _, _) in runs[0]}
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.4, recall


# ---------------------------------------------------------------------
# best_of_n (rejection sampling)
# ---------------------------------------------------------------------


def test_best_of_n_top1_threshold_and_ties(spark):
    """keep=1: highest reward wins with lowest-id ties; candidates
    below min_reward are rejected but still counted; prompts with no
    accepted candidate emit nothing; NULL rewards are excluded from
    both counts."""
    from spark_extensions_spark.operators.alignment import best_of_n

    rows = [
        # p1: 3 candidates, one rejected, tie at the top (ids 2 vs 4)
        ("p1", 1, 5), ("p1", 2, 30), ("p1", 4, 30),
        # p2: every candidate below threshold -> no output row
        ("p2", 5, 1), ("p2", 6, 2),
        # p3: single accepted candidate + a NULL reward (excluded)
        ("p3", 7, 12), ("p3", 8, None),
    ]
    df = spark.createDataFrame(rows, "prompt string, id int, reward int")
    got = {
        r["prompt"]: r
        for r in best_of_n(
            df, "prompt", "id", "reward", min_reward=10
        ).collect()
    }
    assert set(got) == {"p1", "p3"}
    assert (got["p1"]["best_id"], got["p1"]["best_reward"]) == (2, 30)
    assert (got["p1"]["n_candidates"], got["p1"]["n_accepted"]) == (3, 2)
    assert (got["p3"]["best_id"], got["p3"]["n_candidates"],
            got["p3"]["n_accepted"]) == (7, 1, 1)


def test_best_of_n_keepn_matches_one_window(spark):
    """keep>1 (grouped_topk composition) is bit-identical to the
    one-window rank form."""
    from spark_extensions_spark.operators.alignment import best_of_n

    rows = [
        ("p", i, (i * 37) % 11) for i in range(40)
    ] + [("q", i, (i * 13) % 7) for i in range(25)]
    df = spark.createDataFrame(rows, "prompt string, id int, reward int")
    got = sorted(
        map(
            tuple,
            best_of_n(df, "prompt", "id", "reward", keep=3).collect(),
        )
    )
    w = Window.partitionBy("prompt").orderBy(F.desc("reward"), F.col("id"))
    want = sorted(
        map(
            tuple,
            df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 3)
            .select("prompt", "id", "reward", "rank")
            .collect(),
        )
    )
    assert got == want


# ---------------------------------------------------------------------
# BPE -> chunk -> pack: the real-tokenizer chain behind
# pipeline_tokenize_pack (whose graded twin uses whitespace tokens)
# ---------------------------------------------------------------------


def test_bpe_chunk_pack_chain_invariants(spark):
    """Chain bpe_train_on_corpus -> bpe_encode -> chunk_windows (over
    the BPE token text) -> pack_chunks, and check the packing
    invariants: every bin respects the budget (unless a single
    oversized chunk owns it), fill order is preserved, and no token is
    lost between chunking (stride == window -> disjoint) and packing."""
    from spark_extensions_spark.functions.text import (
        chunk_windows,
        pack_chunks,
    )
    from spark_extensions_spark.functions.tokenizer import (
        bpe_encode,
        bpe_train_on_corpus,
    )

    docs = spark.createDataFrame(
        [
            (i, ("the quick brown fox jumps over the lazy dog " * (i + 1)).strip())
            for i in range(8)
        ],
        "doc_id int, text string",
    )
    merges = bpe_train_on_corpus(docs, "text", num_merges=20, min_count=1)
    assert merges  # learned something
    enc = bpe_encode(docs, "text", merges).select(
        "doc_id",
        F.array_join("tokens", " ").alias("tok_text"),
        "n_tokens",
    )
    total_tokens = enc.agg(F.sum("n_tokens")).collect()[0][0]

    W = 16
    chunks = chunk_windows(enc, "doc_id", "tok_text", W, stride=W)
    # disjoint windows conserve the token stream exactly
    assert chunks.agg(F.sum("n_tokens")).collect()[0][0] == total_tokens

    packed = pack_chunks(
        chunks.withColumn("g", F.lit(1)),
        "g",
        ["doc_id", "chunk_id"],
        "n_tokens",
        budget=48,
    )
    rows = sorted(
        map(tuple, packed.select("doc_id", "chunk_id", "n_tokens", "bin_id").collect())
    )
    # bins are contiguous in fill order and respect the budget
    fill: dict = {}
    last_bin = 0
    for _, _, t, b in rows:
        assert b >= last_bin
        last_bin = max(last_bin, b)
        fill[b] = fill.get(b, 0) + t
    assert all(v <= 48 for v in fill.values())
    assert sum(fill.values()) == total_tokens


def test_chunk_windows_matches_oracle_formula_on_edges(spark):
    """The pipeline_tokenize_pack oracle re-derives chunk counts and
    sizes from LEN(string_split(text,' ')) — pin the Spark/DuckDB seam
    on the edge shapes: empty string (one ['']-token chunk), single
    token, exactly window-sized, window+1, consecutive/trailing
    spaces."""
    import duckdb

    W, S = 4, 3
    texts = [
        (0, ""), (1, "a"), (2, "a b c d"), (3, "a b c d e"),
        (4, "a  b"), (5, "a b "), (6, "a b c d e f g h i j"),
    ]
    df = spark.createDataFrame(texts, "doc_id int, text string")
    from spark_extensions_spark.functions.text import chunk_windows

    got = sorted(
        map(
            tuple,
            chunk_windows(df, "doc_id", "text", W, stride=S)
            .select("doc_id", "chunk_id", "n_tokens")
            .collect(),
        )
    )
    con = duckdb.connect()
    con.register("docs", __import__("pandas").DataFrame(
        texts, columns=["doc_id", "text"]
    ))
    want = sorted(
        map(
            tuple,
            con.sql(f"""
        WITH toks AS (
          SELECT doc_id, LEN(string_split(text, ' ')) AS n FROM docs
        ), base AS (
          SELECT doc_id, n,
                 CASE WHEN n <= {W} THEN 1
                      ELSE CAST(FLOOR((n - {W} + {S} - 1) / {S}) AS INT) + 1
                 END AS n_chunks
          FROM toks
        )
        SELECT doc_id,
               CAST(UNNEST(generate_series(0, n_chunks - 1)) AS INT)
                 AS chunk_id,
               CAST(LEAST(n - UNNEST(generate_series(0, n_chunks - 1))
                          * {S}, {W}) AS INT) AS n_tokens
        FROM base
        """).fetchall(),
        )
    )
    assert got == want


def test_largest_remainder_alloc_invariants(spark):
    """Σ alloc == budget exactly for any mass vector; every alloc within
    1 of the real-valued quota (the Hamilton apportionment guarantee);
    deterministic under reordering."""
    from spark_extensions_spark.operators.sampling import (
        largest_remainder_alloc,
    )

    cases = [
        [("a", 1)],
        [("a", 1), ("b", 1), ("c", 1)],
        [("a", 7), ("b", 11), ("c", 13), ("d", 1)],
        [(f"d{i}", (i * 97) % 13 + 1) for i in range(17)],
    ]
    # zero total mass degrades to UNIFORM apportionment — the budget
    # conservation contract must survive (pre-fix: divide-by-zero)
    zdf = spark.createDataFrame(
        [("a", 0), ("b", 0), ("c", 0)], "k string, mass long"
    )
    from spark_extensions_spark.operators.sampling import (
        largest_remainder_alloc as _lra,
    )

    zgot = {r["k"]: r["alloc"] for r in _lra(zdf, "k", "mass", 10).collect()}
    assert sum(zgot.values()) == 10
    assert max(zgot.values()) - min(zgot.values()) <= 1  # uniform ±1
    for budget in (1, 10, 997):
        for rows in cases:
            df = spark.createDataFrame(rows, "k string, mass long")
            got = {
                r["k"]: r["alloc"]
                for r in largest_remainder_alloc(
                    df, "k", "mass", budget
                ).collect()
            }
            total = sum(m for _, m in rows)
            assert sum(got.values()) == budget, (budget, rows, got)
            for k, m in rows:
                quota = budget * m / total
                assert quota - 1 < got[k] < quota + 1, (k, quota, got[k])
            # order-independence
            got2 = {
                r["k"]: r["alloc"]
                for r in largest_remainder_alloc(
                    df.orderBy(F.desc("mass")), "k", "mass", budget
                ).collect()
            }
            assert got2 == got


def test_largest_remainder_alloc_corpus_scale_masses(spark):
    """budget·mass beyond int64 (Σ n_chars ~1e14 masses × 1e5 budget)
    must stay exact — the product runs through DECIMAL(38,0) on Spark
    and HUGEINT in the DuckDB twin instead of wrapping/erroring."""
    import duckdb

    from spark_extensions_spark.operators.sampling import (
        largest_remainder_alloc,
        largest_remainder_alloc_sql,
    )

    rows = [
        ("en", 61_234_567_890_123),
        ("de", 31_987_654_321_001),
        ("fr", 11_222_333_444_555),
        ("ja", 4_999_888_777_666),
    ]
    budget = 100_000
    df = spark.createDataFrame(rows, "lang string, mass long")
    got = {
        r["lang"]: r["alloc"]
        for r in largest_remainder_alloc(
            df, "lang", "mass", budget
        ).collect()
    }
    assert sum(got.values()) == budget
    total = sum(m for _, m in rows)
    for lang, m in rows:
        quota = budget * m / total
        assert quota - 1 < got[lang] < quota + 1, (lang, quota, got[lang])
    # exact-integer reference (Python bigints never overflow)
    fa = {k: budget * m // total for k, m in rows}
    rem = sorted(
        ((budget * m) % total, k) for k, m in rows
    )
    leftover = budget - sum(fa.values())
    for _, k in sorted(rem, key=lambda t: (-t[0], t[1]))[:leftover]:
        fa[k] += 1
    assert got == fa
    # DuckDB twin agrees at the same masses
    con = duckdb.connect()
    counts_sql = " UNION ALL ".join(
        f"SELECT '{k}' AS lang, CAST({m} AS BIGINT) AS mass"
        for k, m in rows
    )
    dgot = {
        k: a
        for k, _, a in con.sql(
            largest_remainder_alloc_sql(counts_sql, "lang", "mass", budget)
        ).fetchall()
    }
    assert dgot == got


def test_best_of_n_nan_rewards_excluded(spark):
    """NaN rewards must never be selected, and keep=1, keep>1, and the
    SQL oracle must agree (pre-fix: min(struct(-reward,id)) never picks
    NaN while ORDER BY reward DESC ranks NaN first)."""
    import math

    import duckdb

    from spark_extensions_spark.operators.alignment import (
        best_of_n,
        best_of_n_oracle_sql,
    )

    rows = [
        ("p1", 1, 0.5),
        ("p1", 2, float("nan")),
        ("p1", 3, 0.9),
        ("p2", 4, float("nan")),
        ("p2", 5, float("-inf")),
        ("p3", 6, float("nan")),
    ]
    df = spark.createDataFrame(
        rows, "prompt string, cand_id int, reward double"
    )
    one = {
        r["prompt"]: (r["best_id"], r["best_reward"], r["n_candidates"])
        for r in best_of_n(df, "prompt", "cand_id", "reward").collect()
    }
    # p3 has only a NaN candidate -> no row; -inf stays eligible
    assert set(one) == {"p1", "p2"}
    assert one["p1"][0] == 3 and one["p1"][1] == 0.9
    assert one["p2"][0] == 5 and one["p2"][1] == float("-inf")
    multi = sorted(
        (r["prompt"], r["cand_id"], r["rank"])
        for r in best_of_n(
            df, "prompt", "cand_id", "reward", keep=2
        ).collect()
    )
    assert multi == [("p1", 1, 2), ("p1", 3, 1), ("p2", 5, 1)]
    con = duckdb.connect()
    scored = " UNION ALL ".join(
        "SELECT '{}' AS prompt, {} AS cand_id, CAST({} AS DOUBLE) AS reward".format(
            p, i, "'nan'" if math.isnan(v) else ("'-inf'" if v == float("-inf") else v)
        )
        for p, i, v in rows
    )
    dbest = {
        p: (b, r)
        for p, b, r, _, _ in con.sql(
            best_of_n_oracle_sql(scored, "prompt", "cand_id", "reward")
        ).fetchall()
    }
    assert set(dbest) == {"p1", "p2"}
    assert dbest["p1"] == (3, 0.9)
    assert dbest["p2"][0] == 5


def test_grouped_running_sum_matches_single_window(spark):
    """The two-phase grouped running sum is bit-identical to the
    per-group window cumsum, including on skewed groups, and
    token_budget_cap(two_phase=True) keeps exactly the same rows."""
    from spark_extensions_spark.operators.sampling import (
        grouped_running_sum,
        token_budget_cap,
    )

    rows = [("big", i, (i * 7) % 23 + 1) for i in range(500)] + [
        ("small", i, i % 5 + 1) for i in range(7)
    ]
    df = spark.createDataFrame(rows, "g string, k int, v int")
    got = sorted(
        map(
            tuple,
            grouped_running_sum(
                df, "g", ["k"], "v", "cum", num_partitions=8
            ).select("g", "k", "cum").collect(),
        )
    )
    w = (
        Window.partitionBy("g")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = sorted(
        map(
            tuple,
            df.select(
                "g", "k", F.sum(F.col("v").cast("bigint")).over(w).alias("cum")
            ).collect(),
        )
    )
    assert got == want

    one = sorted(
        map(
            tuple,
            token_budget_cap(df, "g", "k", "v", budget=100)
            .select("g", "k", "cum_tokens")
            .collect(),
        )
    )
    two = sorted(
        map(
            tuple,
            token_budget_cap(df, "g", "k", "v", budget=100, two_phase=True)
            .select("g", "k", "cum_tokens")
            .collect(),
        )
    )
    assert one == two and one


def test_rouge_n_clipped_counts_hand_computed(spark):
    """ROUGE with CLIPPED counts: repeated hypothesis n-grams only
    count up to their reference multiplicity; empty sides give 0
    metrics, not NULL."""
    from spark_extensions_spark.operators.evals import rouge_n

    pairs = spark.createDataFrame(
        [
            # ref bigrams: {ab, bc, ca, ab} ; hyp bigrams: {ab, ab, ab}
            # clipped overlap for 'a b' = min(2, 3) = 2
            (1, "a b c a b", "a b a b a b"),
            # disjoint
            (2, "x y", "p q"),
            # empty hypothesis
            (3, "a b c", ""),
        ],
        "id int, ref string, hyp string",
    )
    got = {
        r["id"]: r
        for r in rouge_n(pairs, "id", "ref", "hyp", n=2).collect()
    }
    r1 = got[1]
    assert (r1["overlap"], r1["ref_total"], r1["hyp_total"]) == (2, 4, 5)
    # p = 2/5, r = 2/4 in e6 integer division; f1 from the e6 ints
    assert r1["rouge_p_e6"] == 400000 and r1["rouge_r_e6"] == 500000
    assert r1["rouge_f_e6"] == (2 * 400000 * 500000) // 900000
    assert (got[2]["overlap"], got[2]["rouge_f_e6"]) == (0, 0)
    assert (got[3]["hyp_total"], got[3]["rouge_f_e6"]) == (0, 0)
