"""Unit invariants for operators/retrieval.py (BM25 + TF-IDF).

The DuckDB oracle (test_t2_oracle) proves value equality; these tests
pin the *retrieval semantics* — ranking monotonicity, idf direction,
plan shape — on a hand-built corpus where the right answer is obvious.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_extensions_spark.operators import retrieval


def _corpus(spark):
    rows = [
        (0, "spark engine spark engine spark"),      # many 'spark'
        (1, "spark engine"),                          # one 'spark'
        (2, "pandas dataframe pandas dataframe"),     # no 'spark'
        (3, "spark " * 50),                           # long doc, diluted
        (4, "rare unique token appears here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_ranks_term_matches_first(spark):
    df = _corpus(spark)
    got = retrieval.bm25_search(df, ["spark"], k=10).collect()
    ids = [r.doc_id for r in got]
    assert set(ids) == {0, 1, 3}  # only docs containing the term
    scores = {r.doc_id: r.score for r in got}
    assert scores[0] > scores[1]  # more occurrences beats fewer
    # length normalization: doc 3 has 16.7x doc 0's tf but scores
    # <1.2x (saturation + dl penalty), not 16x.
    assert scores[3] < 1.2 * scores[0]


def test_bm25_multi_term_sums_contributions(spark):
    df = _corpus(spark)
    got = {r.doc_id: r.score for r in
           retrieval.bm25_search(df, ["pandas", "dataframe"], k=10).collect()}
    assert set(got) == {2}
    single = {r.doc_id: r.score for r in
              retrieval.bm25_search(df, ["pandas"], k=10).collect()}
    assert got[2] > single[2]  # two matching terms outscore one


def test_bm25_rare_term_idf_exceeds_common(spark):
    # 'unique' appears in 1/5 docs, 'spark' in 3/5 → higher idf weight.
    df = _corpus(spark)
    rare = retrieval.bm25_search(df, ["unique"], k=10).collect()
    common = retrieval.bm25_search(df, ["engine"], k=10).collect()
    assert rare[0].score > common[0].score


def test_bm25_plan_has_no_global_window(spark):
    df = _corpus(spark)
    plan = retrieval.bm25_search(df, ["spark"], k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_tfidf_top_terms_shape_and_direction(spark):
    df = _corpus(spark)
    got = retrieval.tfidf_top_terms(df, top_per_doc=2, min_len=3)
    rows = got.collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rs in per_doc.items():
        assert len(rs) <= 2
        assert sorted(r.rn for r in rs) == list(range(1, len(rs) + 1))
    # doc 4's characteristic terms are its corpus-unique words, which
    # outscore any term that also appears elsewhere.
    d4 = sorted(per_doc[4], key=lambda r: r.rn)
    assert d4[0].term in {"appears", "here", "rare", "token", "unique"}


def test_tokenize_splits_and_lowercases(spark):
    df = spark.createDataFrame(
        [(1, "Hello, WORLD!  42-fold")], "doc_id long, text string"
    )
    toks = [r.term for r in retrieval.tokenize(df).collect()]
    assert toks == ["hello", "world", "42", "fold"]
