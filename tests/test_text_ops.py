

def test_url_blocklist_filter_boundaries(spark):
    """Suffix matching honors dot boundaries: example.com blocks its
    subdomains but not badexample.com; deeper-than-max domains raise."""
    import pytest

    from spark_extensions_spark.functions.url import url_blocklist_filter

    rows = [
        (1, "https://example.com/x"),
        (2, "https://cdn.example.com/x"),
        (3, "https://a.b.example.com/x"),
        (4, "https://badexample.com/x"),
        (5, "https://EXAMPLE.com/y"),
        (6, "https://safe.org/x"),
        (7, "https://deep.bad.example.org/x"),
        (8, "https://bad.example.org/x"),
        (9, "https://example.org/x"),
    ]
    df = spark.createDataFrame(rows, "id int, url string")
    block = spark.createDataFrame(
        [("example.com",), ("Bad.Example.org",)], "domain string"
    )
    kept = {r["id"] for r in url_blocklist_filter(df, "url", block).collect()}
    assert kept == {4, 6, 9}

    too_deep = spark.createDataFrame(
        [("a.b.c.d.e.com",)], "domain string"
    )
    with pytest.raises(ValueError, match="max_labels"):
        url_blocklist_filter(df, "url", too_deep)


def test_dup_ngram_chars_hand_cases(spark):
    """Duplicate-n-gram fraction on hand-built docs: clean text scores
    0, a repeated phrase counts every occurrence's characters."""
    from pyspark.sql import functions as F

    from spark_extensions_spark.functions.text import (
        dup_chars_from_sorted_sql,
        word_ngrams_sql,
    )

    rows = [
        (1, "all words here are unique tokens"),
        (2, "spam ham spam ham spam ham"),
        (3, "one"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    g = df.withColumn("s2", F.sort_array(F.expr(word_ngrams_sql("text", 2))))
    got = {
        r["id"]: r["f"]
        for r in g.select(
            "id",
            F.expr(dup_chars_from_sorted_sql("s2", "text")).alias("f"),
        ).collect()
    }
    assert got[1] == 0.0
    # doc 2: 2-grams = [spam ham, ham spam, spam ham, ham spam, spam ham]
    # all 5 duplicated, chars = 5 * 8 = 40, text length 26
    assert got[2] == 40 / 26
    assert got[3] == 0.0 and got[4] == 0.0


def test_nfc_normalize_collapses_decomposed(spark):
    """NFC key: composed and decomposed spellings collapse."""
    from pyspark.sql import functions as F

    from spark_extensions_spark.functions.text import nfc_normalize_col

    rows = [(1, "café"), (2, "café"), (3, None)]
    df = spark.createDataFrame(rows, "id int, t string")
    got = {
        r["id"]: r["k"]
        for r in df.select(
            "id", nfc_normalize_col(F.col("t")).alias("k")
        ).collect()
    }
    assert got[1] == got[2] == "café"
    assert got[3] is None


def test_char_entropy_hand_cases(spark):
    """Character entropy: uniform 2-char doc = ln(2); single-char doc =
    0; empty = 0."""
    import math

    from pyspark.sql import functions as F

    from spark_extensions_spark.functions.text import (
        char_entropy_cols,
        char_entropy_sql,
    )

    rows = [(1, "abab"), (2, "aaaa"), (3, "")]
    df = spark.createDataFrame(rows, "id int, text string")
    s_col, st_col, ks_col = char_entropy_cols("text")
    g = (
        df.withColumn("__s", s_col)
        .withColumn("__st", st_col)
        .withColumn("__ks", ks_col)
    )
    got = {
        r["id"]: r["e"]
        for r in g.select(
            "id", F.expr(char_entropy_sql("__ks", "__s")).alias("e")
        ).collect()
    }
    assert abs(got[1] - round(math.log(2), 6)) < 2e-6
    assert got[2] == 0.0
    assert got[3] == 0.0


def test_c4_line_filters_rules(spark):
    from pyspark.sql import Row

    from spark_extensions_spark.functions.text import c4_line_filters

    good = "\n".join(
        [
            "This is a perfectly fine sentence with many words.",
            "Another quite acceptable line that also ends properly!",
            'A third line with enough words, quoted ending here."',
            "short line.",  # <5 words -> dropped
            "This line mentions javascript so it must be dropped.",
            "no terminal punctuation on this line at all",
        ]
    )
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=good),
            Row(doc_id=2, text="Contains lorem ipsum filler. " + good),
            Row(doc_id=3, text=good.replace("fine", "fine {brace}")),
            Row(doc_id=4, text="One good sentence only survives here."),
        ]
    )
    out = {r["doc_id"]: r for r in c4_line_filters(df, "doc_id", "text").collect()}
    assert out[1]["kept"] and out[1]["n_lines_kept"] == 3
    assert "javascript" not in out[1]["text_clean"]
    assert "short line." not in out[1]["text_clean"]
    assert not out[2]["kept"] and out[2]["text_clean"] == ""  # lorem ipsum
    assert not out[3]["kept"]  # curly brace
    assert not out[4]["kept"]  # <3 surviving lines
