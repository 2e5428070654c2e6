"""Unit tests for the pure-Python Avro binary codec, incl. the schema
evolution cases from the reference (ConfluentAvroCatalystTest.scala:53-91)."""

from __future__ import annotations

import datetime as dt
import decimal

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spark_extensions_spark.schema.avro_codec import (
    AvroCodecError,
    make_decoder,
    make_encoder,
)

RECORD = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "i", "type": "int"},
        {"name": "l", "type": "long"},
        {"name": "f", "type": "float"},
        {"name": "d", "type": "double"},
        {"name": "s", "type": "string"},
        {"name": "b", "type": "boolean"},
        {"name": "by", "type": "bytes"},
        {"name": "opt", "type": ["null", "string"]},
        {"name": "arr", "type": {"type": "array", "items": "int"}},
        {"name": "m", "type": {"type": "map", "values": "long"}},
        {
            "name": "nested",
            "type": {
                "type": "record",
                "name": "n",
                "fields": [{"name": "x", "type": "int"}],
            },
        },
        {"name": "e", "type": {"type": "enum", "name": "col", "symbols": ["RED", "BLUE"]}},
    ],
}

VALUE = {
    "i": 42,
    "l": -(1 << 40),
    "f": 1.5,
    "d": 2.25,
    "s": "héllo",
    "b": True,
    "by": b"\x00\x01\xff",
    "opt": None,
    "arr": [1, -2, 3],
    "m": {"a": 1, "b": 2},
    "nested": {"x": 7},
    "e": "BLUE",
}


def test_roundtrip_record():
    enc = make_encoder(RECORD)
    dec = make_decoder(RECORD)
    assert dec(enc(VALUE)) == VALUE


def test_roundtrip_positional_tuple():
    """Positional encoding like MyAvroSerializer's struct matching."""
    enc = make_encoder(RECORD)
    dec = make_decoder(RECORD)
    as_tuple = tuple(VALUE[f["name"]] for f in RECORD["fields"])
    assert dec(enc(as_tuple)) == VALUE


def test_logical_types_roundtrip():
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "day", "type": {"type": "int", "logicalType": "date"}},
            {
                "name": "ts",
                "type": {"type": "long", "logicalType": "timestamp-micros"},
            },
            {
                "name": "tsm",
                "type": {"type": "long", "logicalType": "timestamp-millis"},
            },
            {
                "name": "dec",
                "type": {
                    "type": "bytes",
                    "logicalType": "decimal",
                    "precision": 10,
                    "scale": 2,
                },
            },
            {
                "name": "fdec",
                "type": {
                    "type": "fixed",
                    "name": "fx",
                    "size": 5,
                    "logicalType": "decimal",
                    "precision": 10,
                    "scale": 3,
                },
            },
        ],
    }
    v = {
        "day": dt.date(2024, 2, 29),
        "ts": dt.datetime(2024, 2, 29, 12, 34, 56, 789123),
        "tsm": dt.datetime(2024, 2, 29, 12, 34, 56, 789000),
        "dec": decimal.Decimal("-12345.67"),
        "fdec": decimal.Decimal("9999.999"),
    }
    enc = make_encoder(schema)
    dec = make_decoder(schema)
    assert dec(enc(v)) == v


def test_negative_decimal_fixed():
    schema = {
        "type": "fixed",
        "name": "fx",
        "size": 4,
        "logicalType": "decimal",
        "precision": 9,
        "scale": 2,
    }
    enc = make_encoder(schema)
    dec = make_decoder(schema)
    for s in ("-0.01", "-9999999.99", "0.00", "127.5"):
        v = decimal.Decimal(s).quantize(decimal.Decimal("0.01"))
        assert dec(enc(v)) == v


def test_enum_validation():
    schema = {"type": "enum", "name": "c", "symbols": ["A", "B"]}
    enc = make_encoder(schema)
    with pytest.raises(AvroCodecError, match="enum"):
        enc("NOPE")


def test_schema_evolution_old_writer_new_reader():
    """Old-writer/new-reader: added field takes its default, removed field
    is skipped (reference test ConfluentAvroCatalystTest.scala:66-77)."""
    old = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "int"},
            {"name": "gone", "type": "string"},
        ],
    }
    new = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "long"},  # int→long promotion
            {"name": "added", "type": ["null", "string"], "default": None},
        ],
    }
    enc = make_encoder(old)
    dec = make_decoder(old, new)
    assert dec(enc({"a": 5, "gone": "x"})) == {"a": 5, "added": None}


def test_schema_evolution_missing_default_fails():
    old = {"type": "record", "name": "r", "fields": [{"name": "a", "type": "int"}]}
    new = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "int"},
            {"name": "req", "type": "string"},  # no default → unreadable
        ],
    }
    with pytest.raises(AvroCodecError, match="default"):
        make_decoder(old, new)


def test_union_evolution():
    old = ["null", "int"]
    new = ["null", "long", "string"]
    enc = make_encoder(old)
    dec = make_decoder(old, new)
    assert dec(enc(3)) == 3
    assert dec(enc(None)) is None


def test_promotions():
    for w, r, v, expect in [
        ("int", "long", 7, 7),
        ("int", "double", 7, 7.0),
        ("long", "float", 1 << 20, float(1 << 20)),
        ("float", "double", 1.5, 1.5),
        ("string", "bytes", "hi", b"hi"),
        ("bytes", "string", b"hi", "hi"),
    ]:
        out = make_decoder(w, r)(make_encoder(w)(v))
        assert out == expect and type(out) is type(expect)


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=-(1 << 62), max_value=(1 << 62)),
    st.text(max_size=64),
    st.lists(st.integers(min_value=-(1 << 31), max_value=1 << 31), max_size=16),
)
def test_property_roundtrip(n, s, arr):
    schema = {
        "type": "record",
        "name": "p",
        "fields": [
            {"name": "n", "type": "long"},
            {"name": "s", "type": "string"},
            {"name": "arr", "type": {"type": "array", "items": "long"}},
        ],
    }
    v = {"n": n, "s": s, "arr": arr}
    assert make_decoder(schema)(make_encoder(schema)(v)) == v
