"""Distributed BPE tokenizer: train on corpus word frequencies, apply
with broadcast merge ranks.

The scale decomposition mirrors every public BPE trainer (Sennrich et
al. 2016, "Neural Machine Translation of Rare Words with Subword
Units"; the HuggingFace tokenizers / SentencePiece training loop): the
*corpus* is huge but the *word-frequency table* is tiny (vocabulary-
sized), so

1. ``word_frequencies`` — ONE distributed scan + hash aggregate
   (split → posexplode → groupBy) produces the (word, freq) table;
2. ``bpe_train`` — the merge-learning loop runs driver-side over that
   compact table (greedy: repeatedly merge the most frequent adjacent
   symbol pair). This is not a shortcut but the correct architecture:
   each merge step needs the GLOBAL argmax over pair counts, and the
   state (vocab-size word list) fits in driver memory at any corpus
   scale — 100 TB of text still yields only millions of distinct words;
3. ``bpe_encode`` — application is embarrassingly parallel: the learned
   merge ranks broadcast to executors (closure capture, ~KBs) and an
   Arrow-batched pandas UDF encodes each document independently. A
   per-executor LRU word→tokens cache exploits the Zipfian word
   distribution (the top ~50k words cover ~95% of tokens).

Everything is deterministic: ties in pair frequency break
lexicographically, so the merge list — and therefore every encoding —
is a pure function of the corpus.

Reference scope note: the reference library has no tokenizer surface;
this belongs to the LLM-data-pipeline extension layer (SURVEY.md §7
M5). BPE application is inherently iterative per word, hence
rows-only verification (no SQL oracle) + a pytest twin against an
independent textbook implementation.
"""

from __future__ import annotations

import functools

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

END_OF_WORD = "</w>"
_WORD_SPLIT = r"[^a-z0-9']+"


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus word-frequency table: one scan, one hash aggregate.

    Lowercases and splits on non-alphanumeric runs (the classic
    pre-tokenization); empty tokens dropped. Output (word, freq),
    freq bigint. At 100 TB this is the only pass that touches the
    corpus; partial aggregation (map-side combine) collapses each
    partition to near-vocabulary size before the shuffle.
    """
    return (
        df.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), _WORD_SPLIT)
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )


def bpe_train(
    word_freqs: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a (word, freq) table."""
    return _bpe_train_full(word_freqs, num_merges)[0]


def bpe_train_stats(
    word_freqs: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str, int]]:
    """Like :func:`bpe_train` but returns ``(left, right, count)`` per
    merge — the pair count at the moment the merge was selected. This
    is the hash-checkable MERGE TABLE the tokenizer_bpe_merges oracle
    recomputes round-by-round in SQL."""
    return _bpe_train_full(word_freqs, num_merges)[1]


def _bpe_train_full(
    word_freqs: list[tuple[str, int]], num_merges: int
) -> tuple[list[tuple[str, str]], list[tuple[str, str, int]]]:
    """Greedy BPE merge learning; returns (merges, merge stats).

    Greedy textbook loop: represent each word as a symbol sequence
    (chars + trailing END_OF_WORD), repeatedly merge the globally most
    frequent adjacent pair. Ties break on the lexicographically
    smallest pair, making training deterministic. Stops early when no
    pair occurs twice. Returns the ordered merge list — the entire
    tokenizer model.

    Incremental pair-count maintenance: each merge only touches words
    containing the merged pair (tracked via an inverted pair→word
    index), so training is O(total symbol updates), not
    O(num_merges × vocab).
    """
    words: list[list[str]] = []
    freqs: list[int] = []
    for w, f in word_freqs:
        if not w:
            continue
        words.append(list(w) + [END_OF_WORD])
        freqs.append(int(f))

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}

    def _add_word_pairs(i: int, sign: int) -> None:
        seq, f = words[i], freqs[i]
        for a, b in zip(seq, seq[1:]):
            p = (a, b)
            pair_counts[p] = pair_counts.get(p, 0) + sign * f
            if sign > 0:
                pair_words.setdefault(p, set()).add(i)

    for i in range(len(words)):
        _add_word_pairs(i, +1)

    merges: list[tuple[str, str]] = []
    stats: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        best: tuple[str, str] | None = None
        best_n = 1
        for p, n in pair_counts.items():
            if n > best_n or (n == best_n and best is not None and p < best):
                best, best_n = p, n
        if best is None:
            break
        merges.append(best)
        stats.append((best[0], best[1], best_n))
        merged = best[0] + best[1]
        for i in list(pair_words.get(best, ())):
            seq = words[i]
            if best[0] not in seq:
                continue
            _add_word_pairs(i, -1)
            out: list[str] = []
            j = 0
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
            words[i] = out
            _add_word_pairs(i, +1)
        pair_counts = {p: n for p, n in pair_counts.items() if n > 0}
    return merges, stats


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one pre-tokenized word with learned merge ranks.

    Applies merges in rank order (lowest rank first) until no adjacent
    pair is mergeable — the standard BPE inference loop.
    """
    seq = list(word) + [END_OF_WORD]
    while len(seq) > 1:
        best_rank = None
        best_j = -1
        for j, p in enumerate(zip(seq, seq[1:])):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_rank is None:
            break
        seq[best_j : best_j + 2] = [seq[best_j] + seq[best_j + 1]]
    return seq


def bpe_encode(
    df: DataFrame, text_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """Append ``tokens array<string>`` and ``n_tokens`` columns.

    The merge list ships to executors by closure capture (broadcast-
    sized: KBs); encoding runs in an Arrow-batched pandas UDF with a
    per-process word-level LRU cache — the Zipf head dominates, so
    most words hit the cache and never re-run the merge loop.
    """
    ranks = {p: i for i, p in enumerate(merges)}

    @pandas_udf("array<string>")
    def _encode(texts: pd.Series) -> pd.Series:
        import re

        split = re.compile(_WORD_SPLIT)

        @functools.lru_cache(maxsize=1 << 16)
        def enc(word: str) -> tuple[str, ...]:
            return tuple(encode_word(word, ranks))

        out = []
        for t in texts:
            toks: list[str] = []
            if isinstance(t, str):  # arrives None/NaN for SQL NULL
                for w in split.split(t.lower()):
                    if w:
                        toks.extend(enc(w))
            out.append(toks)
        return pd.Series(out)

    return df.withColumn("tokens", _encode(F.col(text_col))).withColumn(
        "n_tokens", F.size("tokens").cast("bigint")
    )


def bpe_train_on_corpus(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    min_count: int = 2,
    max_vocab: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Distributed word count → driver-side merge learning.

    The collect is of the *word-frequency table*, not the corpus — the
    same driver/executor split every public BPE trainer uses — but on a
    100 TB crawl the raw ``[a-z0-9]+`` vocabulary (typos, hashes, URL
    fragments) is hundreds of millions of rows, so the table is BOUNDED
    before the collect: drop words with ``freq < min_count`` (hapaxes
    carry ~0 merge-statistic mass; every public trainer has this
    cutoff) and keep at most ``max_vocab`` rows by (freq desc, word) —
    a TakeOrderedAndProject, not a global sort.  The truncation only
    perturbs pair counts in the extreme tail; merge ranks are dominated
    by the Zipf head.

    Determinism: the cutoff order (freq desc, word asc) is total, so
    the learned merge list is partitioning-invariant.
    """
    wf = word_frequencies(df, text_col)
    if min_count > 1:
        wf = wf.filter(F.col("freq") >= min_count)
    rows = (
        wf.orderBy(F.desc("freq"), F.asc("word")).limit(max_vocab).collect()
    )
    return bpe_train([(r["word"], r["freq"]) for r in rows], num_merges)
