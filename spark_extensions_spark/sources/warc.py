"""WARC / WET (Common Crawl) source and fixture sink.

Every web-corpus pipeline starts at Common Crawl, and Common Crawl
ships WARC — for text pipelines specifically the WET conversion
records (``WARC-Type: conversion``: headers, a blank line, the
extracted plain-text payload, record separator ``\\n\\n``).  Spark has
no WARC codec; this implements the Spark-first shapes:

Read, two paths:

- :func:`read_wet` — FAST: ``spark.read.text`` with ``lineSep`` set to
  the record header sentinel splits records JVM-side (whole-stage
  codegen, parallel byte-range splits within each file); header fields
  and the payload are carved out with built-in string expressions.
  Correct whenever no PAYLOAD contains the sentinel at a line start —
  true for well-formed conversions of normal text, and for anything
  this module's writer produced (it sanitizes payloads).
- :func:`read_wet_strict` — CORRECT BY CONSTRUCTION: ``binaryFile``
  lists the files (one task per file — WET members are not
  range-splittable without honoring lengths), and an Arrow-batched
  ``mapInPandas`` walks each file honoring ``Content-Length``, exactly
  like real WARC readers.  Use this for third-party archives; use gzip
  -free fixtures here (the container has stdlib gzip — ``.gz`` inputs
  are decompressed per file).

Write — :func:`write_wet` renders documents as deterministic WET
records (fixed header order, md5-derived record ids, no timestamps)
and writes one text file per partition: a reproducible fixture/export
sink, same bytes for the same input.

Scale notes: the fast path is a plain distributed text scan — 100 TB
of WET splits by byte range like any text source.  The strict path is
one task per archive file, which matches how Common Crawl is shipped
(tens of thousands of ~1 GB segment files → natural parallelism).

Reference scope: extends SURVEY §2.C (sources/sinks) with the
web-crawl interchange format; no reference counterpart.
"""

from __future__ import annotations

import gzip
import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SENTINEL = "WARC/1.0\n"

_WET_SCHEMA = (
    "src_file string, record_type string, target_uri string, "
    "record_id string, content_length bigint, payload string"
)


def write_wet(
    df: DataFrame,
    path: str,
    uri_col: str,
    text_col: str,
) -> None:
    """Render ``(uri, text)`` rows as WET conversion records and write
    one UTF-8 text file per partition.

    Deterministic bytes: fixed header order, record ids derived from
    ``md5(uri)``, no timestamps.  Payload lines that would collide with
    the record sentinel are prefixed with a space (documented fast-path
    sanitization — third-party archives go through
    :func:`read_wet_strict` instead).  ``Content-Length`` counts the
    UTF-8 payload bytes, so strict readers reproduce the payload
    exactly.
    """
    uri, text = F.col(uri_col).cast("string"), F.col(text_col).cast("string")
    # sanitize: a payload line equal to the sentinel would break the
    # lineSep fast path; real conversions never contain it at line start
    safe = F.regexp_replace(text, r"(?m)^WARC/1\.0$", " WARC/1.0")
    rec = F.concat(
        F.lit("WARC/1.0\n"),
        F.lit("WARC-Type: conversion\n"),
        F.lit("WARC-Target-URI: "), uri, F.lit("\n"),
        F.lit("WARC-Record-ID: <urn:md5:"), F.md5(uri), F.lit(">\n"),
        F.lit("Content-Length: "),
        F.length(safe.cast("binary")).cast("string"),
        F.lit("\n\n"),
        safe,
        F.lit("\n"),
    )
    df.select(rec.alias("value")).write.mode("overwrite").text(path)


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Fast WET reader: JVM-side record splitting via ``lineSep``.

    Output: ``(src_file, record_type, target_uri, record_id,
    content_length, payload)`` — one row per record.  Payload runs
    from the first blank line to the end of the record minus the
    framing newlines (disambiguated by ``Content-Length``).  LF
    archives only (this module's writer); real CRLF Common Crawl
    segments and payloads that embed the record sentinel go through
    :func:`read_wet_strict`.
    """
    raw = (
        spark.read.option("lineSep", "\n" + _SENTINEL)
        .text(path)
        .select(
            F.col("value").alias("rec"),
            F.element_at(F.split(F.input_file_name(), "/"), -1).alias(
                "src_file"
            ),
        )
    )
    # the first record of each file still carries its leading sentinel
    rec = F.regexp_replace(F.col("rec"), r"^WARC/1\.0\n", "")
    body = F.expr("substring(rec2, instr(rec2, '\n\n') + 2)")
    hdrs = F.expr("substring(rec2, 1, instr(rec2, '\n\n') - 1)")
    clen = F.regexp_extract(hdrs, r"(?m)^Content-Length: (\d+)$", 1).cast(
        "bigint"
    )
    out = raw.select(
        "src_file", rec.alias("rec2")
    ).filter(F.length("rec2") > 0).select(
        "src_file",
        F.regexp_extract(hdrs, r"(?m)^WARC-Type: (.*)$", 1).alias(
            "record_type"
        ),
        F.regexp_extract(hdrs, r"(?m)^WARC-Target-URI: (.*)$", 1).alias(
            "target_uri"
        ),
        F.regexp_extract(hdrs, r"(?m)^WARC-Record-ID: (.*)$", 1).alias(
            "record_id"
        ),
        clen.alias("content_length"),
        # Strip EXACTLY the framing newlines: the writer's record
        # newline (always) plus the text sink's line terminator (only
        # the file's last record keeps it — earlier ones lose it to the
        # lineSep match).  A regex '\n$' would be wrong here: Java's $
        # also matches BEFORE a final newline, so it eats a payload
        # byte when the payload itself ends with '\n'.  Content-Length
        # (bytes) disambiguates; framing newlines are 1 byte each.
        body.alias("__raw"),
    ).select(
        "src_file",
        "record_type",
        "target_uri",
        "record_id",
        "content_length",
        F.expr(
            "CASE"
            " WHEN octet_length(__raw) = content_length + 2"
            "  THEN substring(__raw, 1, char_length(__raw) - 2)"
            " WHEN octet_length(__raw) = content_length + 1"
            "  THEN substring(__raw, 1, char_length(__raw) - 1)"
            " ELSE __raw END"
        ).alias("payload"),
    )
    return out


def _parse_wet_bytes(name: str, blob: bytes) -> list[tuple]:
    """Content-Length-honoring record walk over one WET file.

    Accepts BOTH line conventions: real Common Crawl archives terminate
    header lines with CRLF (blank line = ``\\r\\n\\r\\n``, per the WARC
    spec), this module's writer uses bare LF (``\\n\\n``).  Whichever
    terminator appears first after the record start wins; header values
    are stripped of any trailing ``\\r``.
    """
    if name.endswith(".gz"):
        blob = gzip.decompress(blob)
    text_rows: list[tuple] = []
    pos = 0
    n = len(blob)
    header_re = re.compile(rb"(?m)^([A-Za-z0-9-]+): (.*?)\r?$")
    while pos < n:
        # find the record start
        start = blob.find(b"WARC/1.0", pos)
        if start < 0:
            break
        crlf = blob.find(b"\r\n\r\n", start)
        lf = blob.find(b"\n\n", start)
        if crlf >= 0 and (lf < 0 or crlf <= lf):
            hdr_end, sep = crlf, 4
        elif lf >= 0:
            hdr_end, sep = lf, 2
        else:
            break
        headers = dict(header_re.findall(blob[start:hdr_end]))
        length = int(headers.get(b"Content-Length", b"0"))
        payload = blob[hdr_end + sep : hdr_end + sep + length]
        text_rows.append(
            (
                name,
                headers.get(b"WARC-Type", b"").decode("utf-8"),
                headers.get(b"WARC-Target-URI", b"").decode("utf-8"),
                headers.get(b"WARC-Record-ID", b"").decode("utf-8"),
                length,
                payload.decode("utf-8", errors="replace"),
            )
        )
        pos = hdr_end + sep + length
    return text_rows


def read_wet_strict(spark: SparkSession, path: str) -> DataFrame:
    """Strict WET reader: one task per file, ``Content-Length``-honoring
    parse in an Arrow-batched ``mapInPandas`` (payloads may contain
    anything, including record sentinels; CRLF and LF archives both
    parse).  Schema matches :func:`read_wet`.

    Only PATHS ride the shuffle — files are opened inside the worker
    (the sources/arrow_ipc.py shape), so a segment is never
    materialized as an Arrow cell and the listing's file-packing
    heuristics cannot serialize several archives into one task.
    """
    files = spark.read.format("binaryFile").load(path).select("path")
    n = files.count()
    if n == 0:
        raise ValueError(f"no files under {path}")
    paths = files.repartition(n)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "src_file",
            "record_type",
            "target_uri",
            "record_id",
            "content_length",
            "payload",
        ]
        for pdf in batches:
            rows: list[tuple] = []
            for p in pdf["path"]:
                local = p.removeprefix("file:")
                with open(local, "rb") as fh:
                    blob = fh.read()
                rows.extend(
                    _parse_wet_bytes(p.rsplit("/", 1)[-1], blob)
                )
            yield pd.DataFrame(rows, columns=cols)

    return paths.mapInPandas(parse, _WET_SCHEMA)
