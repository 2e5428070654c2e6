"""WARC/WET source (sources/warc.py): writer determinism, fast≡strict
reader equality, and Content-Length-honoring parsing of adversarial
payloads."""

from __future__ import annotations

import glob
import gzip
import os

import pytest

from pyspark.sql import functions as F

from spark_extensions_spark.sources.warc import (
    read_wet,
    read_wet_strict,
    write_wet,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "http://a.com/1", "plain one-liner"),
        (2, "http://a.com/2", "two\nlines here"),
        (3, "http://b.org/x", "unicode: héllo wörld ✓"),
        (4, "http://b.org/y", ""),  # empty payload
    ]
    return spark.createDataFrame(rows, "doc_id bigint, url string, text string")


def _roundtrip(spark, corpus, tmpdir, reader):
    p = os.path.join(tmpdir, "wet")
    write_wet(corpus, p, "url", "text")
    got = {
        r["target_uri"]: (r["payload"], r["content_length"])
        for r in reader(spark, p).collect()
    }
    for r in corpus.collect():
        payload, clen = got[r["url"]]
        assert payload == r["text"]
        assert clen == len(r["text"].encode("utf-8"))
    assert len(got) == corpus.count()


def test_fast_reader_roundtrip(spark, corpus, tmp_path):
    _roundtrip(spark, corpus, str(tmp_path), read_wet)


def test_strict_reader_roundtrip(spark, corpus, tmp_path):
    _roundtrip(spark, corpus, str(tmp_path), read_wet_strict)


def test_fast_equals_strict(spark, corpus, tmp_path):
    p = str(tmp_path / "wet")
    write_wet(corpus, p, "url", "text")
    cols = ["record_type", "target_uri", "record_id", "content_length",
            "payload"]
    fast = sorted(map(tuple, read_wet(spark, p).select(*cols).collect()))
    strict = sorted(
        map(tuple, read_wet_strict(spark, p).select(*cols).collect())
    )
    assert fast == strict


def test_writer_bytes_deterministic(spark, corpus, tmp_path):
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    one_part = corpus.coalesce(1)
    write_wet(one_part, pa, "url", "text")
    write_wet(one_part, pb, "url", "text")

    def blob(d):
        files = sorted(glob.glob(os.path.join(d, "part-*")))
        return b"".join(open(f, "rb").read() for f in files)

    assert blob(pa) == blob(pb)


def test_strict_parses_embedded_sentinel(spark, tmp_path):
    """A hand-built archive whose payload CONTAINS 'WARC/1.0' lines:
    the strict reader must honor Content-Length and keep the payload
    whole (real WET archives can do this; the fast path is documented
    as requiring sanitized payloads)."""
    payload = "evil\nWARC/1.0\nWARC-Type: fake\n\nstill the same record"
    body = payload.encode("utf-8")
    rec = (
        b"WARC/1.0\n"
        b"WARC-Type: conversion\n"
        b"WARC-Target-URI: http://evil.example/\n"
        b"WARC-Record-ID: <urn:md5:00>\n"
        b"Content-Length: " + str(len(body)).encode() + b"\n\n"
        + body + b"\n"
        b"WARC/1.0\n"
        b"WARC-Type: conversion\n"
        b"WARC-Target-URI: http://second.example/\n"
        b"WARC-Record-ID: <urn:md5:01>\n"
        b"Content-Length: 2\n\nok\n"
    )
    d = tmp_path / "adv"
    d.mkdir()
    (d / "seg.wet").write_bytes(rec)
    got = {
        r["target_uri"]: r["payload"]
        for r in read_wet_strict(spark, str(d)).collect()
    }
    assert got["http://evil.example/"] == payload
    assert got["http://second.example/"] == "ok"


def test_strict_reads_gzip(spark, tmp_path):
    rec = (
        b"WARC/1.0\n"
        b"WARC-Type: conversion\n"
        b"WARC-Target-URI: http://gz.example/\n"
        b"WARC-Record-ID: <urn:md5:02>\n"
        b"Content-Length: 5\n\nhello\n"
    )
    d = tmp_path / "gz"
    d.mkdir()
    (d / "seg.wet.gz").write_bytes(gzip.compress(rec))
    rows = read_wet_strict(spark, str(d)).collect()
    assert len(rows) == 1 and rows[0]["payload"] == "hello"


def test_fast_path_sanitization_preserves_strict_parse(spark, tmp_path):
    """The writer's sentinel sanitization must keep fast and strict in
    agreement even for payloads that try to embed a record header."""
    df = spark.createDataFrame(
        [(1, "http://t/1", "a\nWARC/1.0\nb")], "i bigint, url string, text string"
    )
    p = str(tmp_path / "wet")
    write_wet(df, p, "url", "text")
    fast = read_wet(spark, p).first()
    strict = read_wet_strict(spark, p).first()
    assert fast["payload"] == strict["payload"] == "a\n WARC/1.0\nb"


def test_trailing_newline_payloads_fast_equals_strict(spark, tmp_path):
    """Payloads ending in newlines must survive both readers byte-exact
    (Java's '$' regex matches before a final newline — the naive strip
    ate a payload byte)."""
    docs = spark.createDataFrame(
        [
            (1, "u1", "ends with newline\n"),
            (2, "u2", "no trailing"),
            (3, "u3", "double\n\n"),
        ],
        "i bigint, url string, text string",
    )
    p = str(tmp_path / "wet")
    write_wet(docs.coalesce(1), p, "url", "text")
    fast = {
        r["target_uri"]: r["payload"] for r in read_wet(spark, p).collect()
    }
    strict = {
        r["target_uri"]: r["payload"]
        for r in read_wet_strict(spark, p).collect()
    }
    want = {"u1": "ends with newline\n", "u2": "no trailing", "u3": "double\n\n"}
    assert fast == want and strict == want


def test_strict_parses_crlf_archive(spark, tmp_path):
    """Real Common Crawl WET segments use CRLF header terminators (the
    WARC spec); the strict reader must parse them."""
    body = "real crawl text".encode()
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        b"WARC-Target-URI: http://cc.example/\r\n"
        b"WARC-Record-ID: <urn:uuid:abc>\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
        + body + b"\r\n\r\n"
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        b"WARC-Target-URI: http://cc2.example/\r\n"
        b"WARC-Record-ID: <urn:uuid:def>\r\n"
        b"Content-Length: 2\r\n\r\nok\r\n\r\n"
    )
    d = tmp_path / "crlf"
    d.mkdir()
    (d / "seg.warc.wet").write_bytes(rec)
    rows = {
        r["target_uri"]: r
        for r in read_wet_strict(spark, str(d)).collect()
    }
    assert rows["http://cc.example/"]["payload"] == "real crawl text"
    assert rows["http://cc.example/"]["record_id"] == "<urn:uuid:abc>"
    assert rows["http://cc2.example/"]["payload"] == "ok"


def test_strict_one_task_per_file(spark, tmp_path):
    """The path list is repartitioned to file count, so a many-small-
    files layout parses with full parallelism."""
    import glob as _glob

    d = tmp_path / "many"
    d.mkdir()
    for i in range(6):
        (d / f"seg{i}.wet").write_bytes(
            b"WARC/1.0\nWARC-Type: conversion\n"
            b"WARC-Target-URI: http://f%d/\n" % i
            + b"WARC-Record-ID: <urn:md5:%d>\n" % i
            + b"Content-Length: 2\n\nok\n"
        )
    df = read_wet_strict(spark, str(d))
    assert df.rdd.getNumPartitions() == 6
    assert df.count() == 6
