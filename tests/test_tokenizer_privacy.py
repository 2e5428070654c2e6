"""BPE tokenizer, k-anonymity audit, and HTML extraction tests.

The BPE twin below is an INDEPENDENT textbook implementation (naive
full-rescan pair counting, no inverted index, no incremental updates)
— structurally different from the production trainer, so agreement is
evidence of correctness, not shared bugs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_extensions_spark.functions.tokenizer import (
    END_OF_WORD,
    bpe_encode,
    bpe_train,
    bpe_train_on_corpus,
    encode_word,
    word_frequencies,
)
from spark_extensions_spark.operators.privacy import (
    k_anonymity_classes,
    k_anonymity_summary,
)


# --------------------------- BPE: reference twin ---------------------


def _naive_bpe_train(word_freqs, num_merges):
    """Textbook BPE (Sennrich et al. 2016 pseudocode): full pair-count
    rescan per merge. O(merges x vocab) — fine for tests."""
    vocab = {}
    for w, f in word_freqs:
        if w:
            vocab[tuple(list(w) + [END_OF_WORD])] = (
                vocab.get(tuple(list(w) + [END_OF_WORD]), 0) + f
            )
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for seq, f in vocab.items():
            for p in zip(seq, seq[1:]):
                pairs[p] = pairs.get(p, 0) + f
        best = None
        for p, n in pairs.items():
            if n >= 2 and (
                best is None
                or n > pairs[best]
                or (n == pairs[best] and p < best)
            ):
                best = p
        if best is None:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab = {}
        for seq, f in vocab.items():
            out, j = [], 0
            while j < len(seq):
                if (
                    j + 1 < len(seq)
                    and seq[j] == best[0]
                    and seq[j + 1] == best[1]
                ):
                    out.append(merged)
                    j += 2
                else:
                    out.append(seq[j])
                    j += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


SENNRICH_FREQS = [
    ("low", 5),
    ("lower", 2),
    ("newest", 6),
    ("widest", 3),
]


def test_bpe_train_matches_naive_reference():
    for n in (1, 5, 10, 50):
        assert bpe_train(SENNRICH_FREQS, n) == _naive_bpe_train(
            SENNRICH_FREQS, n
        )


def test_bpe_train_matches_naive_on_generated_corpus():
    words = [
        (f"{a}{b}{c}", (i * 7) % 13 + 1)
        for i, (a, b, c) in enumerate(
            (x, y, z)
            for x in ("ab", "cd", "ef")
            for y in ("gh", "ij")
            for z in ("k", "lm", "nop")
        )
    ]
    assert bpe_train(words, 30) == _naive_bpe_train(words, 30)


def test_bpe_first_merge_is_most_frequent_pair():
    # 'es' occurs in newest(6) + widest(3) = 9 — the classic example
    merges = bpe_train(SENNRICH_FREQS, 3)
    assert merges[0] == ("e", "s")


def test_bpe_encode_applies_ranks_in_order():
    merges = bpe_train(SENNRICH_FREQS, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    toks = encode_word("newest", ranks)
    assert "".join(toks) == "newest" + END_OF_WORD
    # a fully-learned word collapses to few tokens
    assert len(toks) < len("newest") + 1
    # unseen characters stay as singletons
    assert encode_word("xyz", ranks) == ["x", "y", "z", END_OF_WORD]


def test_bpe_deterministic():
    assert bpe_train(SENNRICH_FREQS, 8) == bpe_train(SENNRICH_FREQS, 8)
    assert bpe_train(list(reversed(SENNRICH_FREQS)), 8) == bpe_train(
        SENNRICH_FREQS, 8
    )


def test_bpe_spark_pipeline_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "low low low low low lower lower"),
         (2, "newest newest newest newest newest newest"),
         (3, "widest widest widest")],
        ["doc_id", "text"],
    )
    wf = {
        r["word"]: r["freq"] for r in word_frequencies(df, "text").collect()
    }
    assert wf == {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_train_on_corpus(df, "text", 10)
    assert merges == bpe_train(SENNRICH_FREQS, 10)
    # vocabulary bounding before the driver collect: a hapax is cut by
    # min_count (default 2), and max_vocab keeps the top-N by (freq
    # desc, word) — identical merges here since the head is untouched
    hap = df.union(
        df.sparkSession.createDataFrame(
            [(4, "zzqhapax")], ["doc_id", "text"]
        )
    )
    assert bpe_train_on_corpus(hap, "text", 10) == merges
    top3 = bpe_train_on_corpus(
        hap, "text", 10, min_count=1, max_vocab=3
    )
    assert top3 == bpe_train(
        [("newest", 6), ("low", 5), ("widest", 3)], 10
    )
    enc = {
        r["doc_id"]: (r["tokens"], r["n_tokens"])
        for r in bpe_encode(df, "text", merges).collect()
    }
    ranks = {p: i for i, p in enumerate(merges)}
    exp1 = encode_word("low", ranks) * 5 + encode_word("lower", ranks) * 2
    assert enc[1][0] == exp1
    assert enc[1][1] == len(exp1)
    # concatenating tokens reconstructs the normalized text
    joined = "".join(enc[2][0]).replace(END_OF_WORD, " ").strip()
    assert joined == "newest newest newest newest newest newest"


def test_bpe_encode_handles_punct_case_null(spark):
    df = spark.createDataFrame(
        [(1, "Low, LOW! low?"), (2, ""), (3, None)], ["doc_id", "text"]
    )
    merges = bpe_train([("low", 3)], 5)
    rows = {
        r["doc_id"]: r["tokens"]
        for r in bpe_encode(df, "text", merges).collect()
    }
    assert rows[1] == ["low" + END_OF_WORD] * 3
    assert rows[2] == []
    assert rows[3] == []


# --------------------------- k-anonymity -----------------------------


@pytest.fixture(scope="module")
def _people(spark):
    rows = [
        # (zip, age_band, disease)
        ("02139", "20-30", "flu"),
        ("02139", "20-30", "flu"),
        ("02139", "20-30", "cold"),
        ("02139", "20-30", "flu"),
        ("02139", "20-30", "cold"),
        ("02139", "30-40", "flu"),  # class of 1 → k violation
        ("94110", "20-30", "flu"),
        ("94110", "20-30", "flu"),  # l violation: 5 rows, 1 value
        ("94110", "20-30", "flu"),
        ("94110", "20-30", "flu"),
        ("94110", "20-30", "flu"),
    ]
    return spark.createDataFrame(rows, ["zip", "age_band", "disease"])


def test_k_anonymity_classes(_people):
    out = {
        (r["zip"], r["age_band"]): r
        for r in k_anonymity_classes(
            _people, ["zip", "age_band"], "disease", k=5, l=2
        ).collect()
    }
    a = out[("02139", "20-30")]
    assert (a["class_size"], a["n_sensitive"], a["k_ok"], a["l_ok"]) == (
        5, 2, True, True,
    )
    b = out[("02139", "30-40")]
    assert (b["class_size"], b["k_ok"]) == (1, False)
    c = out[("94110", "20-30")]
    assert (c["class_size"], c["n_sensitive"], c["k_ok"], c["l_ok"]) == (
        5, 1, True, False,
    )


def test_k_anonymity_summary(_people):
    s = k_anonymity_summary(
        _people, ["zip", "age_band"], "disease", k=5, l=2
    ).collect()[0]
    assert s["n_rows"] == 11
    assert s["n_classes"] == 3
    assert s["min_class_size"] == 1
    assert s["n_rows_at_risk"] == 1
    assert s["min_l"] == 1
    assert not s["k_anonymous"]
    assert not s["l_diverse"]


def test_k_anonymity_passes_on_clean_table(spark):
    rows = [("a", f"s{i % 2}") for i in range(10)]
    df = spark.createDataFrame(rows, ["quasi", "sens"])
    s = k_anonymity_summary(df, ["quasi"], "sens", k=5, l=2).collect()[0]
    assert s["k_anonymous"] and s["l_diverse"]


# --------------------------- HTML extraction -------------------------


def test_html_extract_text(spark):
    from spark_extensions_spark.functions.text import html_extract_text

    cases = [
        (1, "<p>hello <b>world</b></p>", "hello world"),
        (2, "<script>var x = 1 < 2;</script>after", "after"),
        (3, "<style>p {color: red}</style>body", "body"),
        (4, "a<!-- hidden\nmultiline -->b", "a b"),
        (5, "x &amp; y &lt;tag&gt; &quot;q&quot; &#39;a&#39;", "x & y <tag> \"q\" 'a'"),
        (6, "a&nbsp;b", "a b"),
        (7, "<SCRIPT TYPE='t'>junk()</SCRIPT>kept", "kept"),
        (8, "spaced   \n\t out", "spaced out"),
        (9, '<a href="u?a=1&amp;b=2">link</a>', "link"),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, h, _ in cases], ["id", "html"]
    )
    got = {
        r["id"]: r["txt"]
        for r in df.select(
            "id", html_extract_text("html").alias("txt")
        ).collect()
    }
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)


def test_html_extract_matches_duck_twin(spark):
    import duckdb

    from spark_extensions_spark.functions.text import (
        html_extract_duck,
        html_extract_text,
    )

    htmls = [
        "<div class='a'><p>one</p><script>s<2</script></div>",
        "plain text only",
        "<style a=b>x{}</style>&amp;&amp;amp;<i>done</i>",
        "<h1>T</h1>\n\n  <p>a&nbsp;&lt;b&gt;</p>",
    ]
    df = spark.createDataFrame([(h,) for h in htmls], ["html"])
    spark_out = [
        r["txt"]
        for r in df.select(html_extract_text("html").alias("txt")).collect()
    ]
    con = duckdb.connect()
    duck_out = [
        con.sql(
            f"SELECT {html_extract_duck('?')} ", params=[h]
        ).fetchone()[0]
        for h in htmls
    ]
    assert spark_out == duck_out


def test_pii_scan_counts_agree_with_redaction_patterns(spark):
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from spark_extensions_spark.functions.text import pii_redact
    from spark_extensions_spark.operators.privacy import pii_scan

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="mail a.b+c@ex-ample.org and d@e.io today"),
            Row(doc_id=2, text="call 555-123-4567 or visit 10.0.0.1"),
            Row(doc_id=3, text="ssn 123-45-6789 card 4111 1111 1111 1111"),
            Row(doc_id=4, text="nothing sensitive here"),
        ]
    )
    s = {r["doc_id"]: r for r in pii_scan(df, "doc_id", "text").collect()}
    assert s[1]["n_email"] == 2 and s[1]["n_pii_total"] == 2
    assert s[2]["n_phone"] == 1 and s[2]["n_ipv4"] == 1
    assert s[3]["n_ssn"] == 1 and s[3]["n_cc"] == 1
    assert s[4]["n_pii_total"] == 0
    # shared patterns: everything the scan counts (except IPv4, which
    # is audit-only) disappears under the scrub pass
    red = df.select(
        "doc_id", pii_redact(F.col("text")).alias("t")
    )
    s2 = {
        r["doc_id"]: r
        for r in pii_scan(red, "doc_id", "t").collect()
    }
    for d in (1, 2, 3, 4):
        assert s2[d]["n_pii_total"] == s2[d]["n_ipv4"]
