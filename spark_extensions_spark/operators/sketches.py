"""Probabilistic sketches over DataFrames (approximate, bounded-memory).

The 100 TB companions to exact aggregation: each sketch builds in a
single distributed pass with fixed memory per partition — one partial
sketch per partition (mapInPandas), merged on the driver (sketches are
linearly mergeable, exactly like Spark's partial aggregates). The JVM
``countMinSketch``/``bloomFilter`` stat helpers were never exposed to
PySpark, so these are Python-native.

- :func:`count_min_sketch` → :class:`CountMinSketch`: approximate item
  frequencies, overestimate-only, error ≤ eps·N with prob ≥ confidence.
- :func:`bloom_filter` → :class:`BloomFilter`: approximate membership,
  no false negatives, ≤ fpp false positives.
- :func:`bloom_semi_join`: pre-filter a fact table by a Bloom filter of
  the dim keys before the join shuffle (explicit runtime filter — the
  same idea as AQE's injected bloom filters).
- :func:`freq_items` / :func:`approx_quantiles`: Spark built-ins
  (heavy hitters, Greenwald-Khanna quantiles), re-exported for a
  complete sketch surface.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


def _hash_lanes(value: str) -> tuple[int, int]:
    """(h1, h2) 64-bit lanes from one md5 — Kirsch-Mitzenmacher double
    hashing derives all k positions as h1 + i*h2."""
    d = hashlib.md5(value.encode("utf-8")).digest()
    return int.from_bytes(d[:8], "big"), int.from_bytes(d[8:], "big") | 1


class BloomFilter:
    """Fixed-size bit-array membership sketch (mergeable via OR)."""

    def __init__(self, m_bits: int, k: int, bits: np.ndarray):
        self.m = m_bits
        self.k = k
        self.bits = bits

    def might_contain(self, value) -> bool:
        if value is None:
            return False
        h1, h2 = _hash_lanes(str(value))
        for i in range(self.k):
            pos = (h1 + i * h2) % self.m
            if not (self.bits[pos >> 6] >> np.uint64(pos & 63)) & np.uint64(1):
                return False
        return True

    @staticmethod
    def params(expected_items: int, fpp: float) -> tuple[int, int]:
        m = int(-expected_items * math.log(fpp) / (math.log(2) ** 2))
        m = 1 << max(10, (m - 1).bit_length())  # power of two
        k = max(1, round(m / expected_items * math.log(2)))
        return m, k


def bloom_filter(
    df: DataFrame, col: str, expected_items: int | None = None, fpp: float = 0.01
) -> BloomFilter:
    """Build a BloomFilter of ``col`` in one distributed pass."""
    if expected_items is None:
        expected_items = max(1024, df.count())
    m, k = BloomFilter.params(expected_items, fpp)

    def build(batches):
        bits = np.zeros(m // 64, dtype=np.uint64)
        one = np.uint64(1)
        for pdf in batches:
            for v in pdf.iloc[:, 0]:
                if v is None:
                    continue
                h1, h2 = _hash_lanes(str(v))
                for i in range(k):
                    pos = (h1 + i * h2) % m
                    bits[pos >> 6] |= one << np.uint64(pos & 63)
        yield pd.DataFrame({"bits": [bits.tobytes()]})

    combined = np.zeros(m // 64, dtype=np.uint64)
    for row in df.select(col).mapInPandas(build, "bits binary").collect():
        combined |= np.frombuffer(row["bits"], dtype=np.uint64)
    return BloomFilter(m, k, combined)


class CountMinSketch:
    """depth×width counter table; estimates are min-over-rows (never
    underestimates; overestimate ≤ eps·N with prob ≥ confidence)."""

    def __init__(self, depth: int, width: int, table: np.ndarray, total: int):
        self.depth = depth
        self.width = width
        self.table = table
        self.total = total

    def estimate_count(self, value) -> int:
        h1, h2 = _hash_lanes(str(value))
        return int(
            min(
                self.table[i][(h1 + i * h2) % self.width]
                for i in range(self.depth)
            )
        )

    @staticmethod
    def params(eps: float, confidence: float) -> tuple[int, int]:
        depth = max(1, math.ceil(math.log(1.0 / (1.0 - confidence))))
        width = max(2, math.ceil(math.e / eps))
        return depth, width


def count_min_sketch(
    df: DataFrame, col: str, eps: float = 0.001, confidence: float = 0.99
) -> CountMinSketch:
    """Build a CountMinSketch of ``col`` in one distributed pass."""
    depth, width = CountMinSketch.params(eps, confidence)

    def build(batches):
        table = np.zeros((depth, width), dtype=np.int64)
        n = 0
        for pdf in batches:
            for v in pdf.iloc[:, 0]:
                if v is None:
                    continue
                n += 1
                h1, h2 = _hash_lanes(str(v))
                for i in range(depth):
                    table[i][(h1 + i * h2) % width] += 1
        yield pd.DataFrame({"table": [table.tobytes()], "n": [n]})

    combined = np.zeros((depth, width), dtype=np.int64)
    total = 0
    for row in (
        df.select(col).mapInPandas(build, "table binary, n long").collect()
    ):
        combined += np.frombuffer(row["table"], dtype=np.int64).reshape(
            depth, width
        )
        total += row["n"]
    return CountMinSketch(depth, width, combined, total)


def freq_items(df: DataFrame, cols: list[str], support: float = 0.01):
    """Heavy hitters: values appearing in more than ``support`` fraction
    of rows (may include false positives, never misses a true one)."""
    return df.stat.freqItems(cols, support=support)


def approx_quantiles(
    df: DataFrame, col: str, probabilities: list[float], relative_error: float = 0.01
) -> list[float]:
    """Greenwald-Khanna approximate quantiles in one pass."""
    return df.approxQuantile(col, probabilities, relative_error)


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    expected_items: int | None = None,
    fpp: float = 0.01,
) -> DataFrame:
    """Filter ``fact`` down to rows whose key *might* exist in ``dim``.

    Builds the Bloom filter distributed over the dim side, broadcasts
    the fixed-size bit array, and applies an Arrow-batched membership
    test on the fact side. False positives pass through (callers follow
    with the real join); false negatives cannot occur — non-matching
    fact rows never enter the join shuffle.
    """
    bf = bloom_filter(dim, dim_key, expected_items, fpp)
    bc = fact.sparkSession.sparkContext.broadcast(
        (bf.m, bf.k, bf.bits.tobytes())
    )

    def test(batches):
        m, k, raw = bc.value
        local = BloomFilter(m, k, np.frombuffer(raw, dtype=np.uint64))
        for pdf in batches:
            mask = [local.might_contain(v) for v in pdf[fact_key]]
            yield pdf[pd.Series(mask, index=pdf.index)]

    return fact.mapInPandas(test, fact.schema)
