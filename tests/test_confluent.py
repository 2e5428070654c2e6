"""Tests for the Confluent registry client + column codecs.

Ports the reference's round-trip and evolution tests
(ConfluentAvroConnectorTest.scala:35-47, ConfluentAvroCatalystTest.scala:
53-77, ConfluentJsonConnectorTest.scala:36-48) with the same
mocked-registry strategy, plus HTTP-backend tests via `responses`.
"""

from __future__ import annotations

import json

import pytest
import responses

from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_extensions_spark.confluent import (
    HttpSchemaRegistry,
    InMemorySchemaRegistry,
    IncompatibleSchemaError,
    from_confluent_avro,
    from_confluent_json,
    to_confluent_avro,
    to_confluent_json,
)
from spark_extensions_spark.confluent.avro import parse_confluent_msg
from spark_extensions_spark.schema.avro import spark_to_avro


# ---------------------------------------------------------------- client

def test_subject_naming():
    c = InMemorySchemaRegistry()
    assert c.get_subject("topicA", "value") == "topicA-value"
    assert c.get_subject("topicA", "key") == "topicA-key"
    with pytest.raises(ValueError):
        c.get_subject("topicA", "neither")


SCHEMA_V1 = {
    "type": "record",
    "name": "r",
    "fields": [{"name": "a", "type": "int"}],
}
SCHEMA_V2 = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "a", "type": "int"},
        {"name": "b", "type": ["null", "string"], "default": None},
    ],
}
SCHEMA_BAD = {
    "type": "record",
    "name": "r",
    "fields": [{"name": "zzz", "type": "string"}],  # no default, breaks read
}


def test_set_or_update_schema_semantics():
    c = InMemorySchemaRegistry()
    id1, _ = c.set_or_update_schema("t-value", SCHEMA_V1)
    # identical schema → same id, no new registration
    id1b, _ = c.set_or_update_schema("t-value", SCHEMA_V1)
    assert id1 == id1b
    # compatible evolution registers a new id
    id2, _ = c.set_or_update_schema("t-value", SCHEMA_V2)
    assert id2 != id1
    assert c.get_latest_schema("t-value")[0] == id2
    # incompatible evolution raises
    with pytest.raises(IncompatibleSchemaError, match="backward"):
        c.set_or_update_schema("t-value", SCHEMA_BAD)
    # mutual check: v2→v1 is also readable (b has default... v1 reading v2
    # data: v1 has no field b → b skipped; a read as int) → mutual OK
    c2 = InMemorySchemaRegistry()
    c2.set_or_update_schema("t-value", SCHEMA_V1)
    c2.set_or_update_schema("t-value", SCHEMA_V2, mutual_read_check=True)


def test_set_or_get_schema():
    c = InMemorySchemaRegistry()
    id1, s1 = c.set_or_get_schema("t-value", SCHEMA_V1)
    id2, s2 = c.set_or_get_schema("t-value", SCHEMA_V2)  # existing wins
    assert (id2, s2) == (id1, s1)


@responses.activate
def test_http_backend():
    url = "http://registry.test"
    responses.get(
        f"{url}/subjects/t-value/versions/latest",
        json={"id": 7, "version": 1, "schema": json.dumps(SCHEMA_V1)},
    )
    responses.get(
        f"{url}/schemas/ids/7", json={"schema": json.dumps(SCHEMA_V1)}
    )
    responses.post(f"{url}/subjects/t-value/versions", json={"id": 8})
    c = HttpSchemaRegistry(url)
    sid, schema = c.get_latest_schema("t-value")
    assert sid == 7 and schema == SCHEMA_V1
    assert c.get_schema_by_id(7) == SCHEMA_V1
    assert c.get_schema_by_id(7) == SCHEMA_V1  # cached (one HTTP hit)
    assert (
        len([r for r in responses.calls if r.request.url.endswith("/ids/7")]) == 1
    )
    sid2, _ = c.set_or_update_schema("t-value", SCHEMA_V2)
    assert sid2 == 8


@responses.activate
def test_http_backend_missing_subject():
    url = "http://registry.test"
    responses.get(
        f"{url}/subjects/new-value/versions/latest",
        json={"error_code": 40401, "message": "not found"},
        status=404,
    )
    responses.post(f"{url}/subjects/new-value/versions", json={"id": 1})
    c = HttpSchemaRegistry(url)
    assert not c.schema_exists("new-value")
    sid, _ = c.set_or_update_schema("new-value", SCHEMA_V1)
    assert sid == 1


# ------------------------------------------------------- dataframe roundtrip

@pytest.fixture(scope="module")
def sample_df(spark):
    return spark.createDataFrame(
        [
            Row(id=1, name="alice", score=9.5, tags=["a", "b"]),
            Row(id=2, name="bob", score=None, tags=[]),
            Row(id=3, name=None, score=1.25, tags=["z"]),
        ]
    )


def test_avro_roundtrip_dataframe(spark, sample_df):
    """encode ∘ decode == identity (ConfluentAvroConnectorTest.scala:35-47)."""
    client = InMemorySchemaRegistry()
    framed = sample_df.select(
        to_confluent_avro(
            sample_df, F.struct("id", "name", "score", "tags"), "topicX",
            "value", client, update_allowed=True,
        ).alias("msg")
    )
    assert framed.schema["msg"].dataType.typeName() == "binary"
    back = framed.select(
        from_confluent_avro("msg", "topicX", "value", client).alias("data")
    ).select("data.*")
    got = {r["id"]: r for r in back.collect()}
    for r in sample_df.collect():
        g = got[r["id"]]
        assert g["name"] == r["name"]
        assert g["score"] == r["score"]
        assert g["tags"] == r["tags"]


def test_avro_wire_format(spark, sample_df):
    client = InMemorySchemaRegistry()
    framed = sample_df.select(
        to_confluent_avro(
            sample_df, F.struct("id", "name"), "wire", "value", client,
            update_allowed=True,
        ).alias("msg")
    ).head()
    msg = bytes(framed["msg"])
    assert msg[0] == 0x00  # magic byte
    schema_id, payload = parse_confluent_msg(msg)
    assert schema_id == client.get_latest_schema("wire-value")[0]
    assert len(payload) > 0
    with pytest.raises(ValueError, match="magic"):
        parse_confluent_msg(b"\x01\x00\x00\x00\x01xx")


def test_avro_decode_schema_evolution(spark, sample_df):
    """Messages written with schema v1 decode under reader v2 with the
    added column defaulted (ConfluentAvroCatalystTest.scala:66-77)."""
    client = InMemorySchemaRegistry()
    framed = sample_df.select(
        "id",
        to_confluent_avro(
            sample_df, F.struct("id", "name"), "evo", "value", client,
            update_allowed=True,
        ).alias("msg"),
    )
    pdf = framed.toPandas()  # materialize v1-framed messages

    # evolve the subject: add nullable column with default
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    v2 = spark_to_avro(
        StructType(
            [
                StructField("id", LongType(), True),
                StructField("name", StringType(), True),
                StructField("extra", StringType(), True),
            ]
        ),
        record_name="topLevelRecord",
    )
    client.set_or_update_schema("evo-value", v2)

    df2 = spark.createDataFrame(pdf)
    back = df2.select(
        "id", from_confluent_avro("msg", "evo", "value", client).alias("d")
    ).select("id", "d.name", "d.extra")
    rows = {r["id"]: r for r in back.collect()}
    assert rows[1]["name"] == "alice"
    assert all(r["extra"] is None for r in rows.values())


def test_avro_update_not_allowed(spark, sample_df):
    client = InMemorySchemaRegistry()
    client.set_or_update_schema(
        "locked-value",
        {
            "type": "record",
            "name": "topLevelRecord",
            "fields": [{"name": "other", "type": "string"}],
        },
    )
    with pytest.raises(IncompatibleSchemaError):
        to_confluent_avro(
            sample_df, F.struct("id", "name"), "locked", "value", client,
            update_allowed=False,
        )


def test_json_roundtrip_dataframe(spark, sample_df):
    """JSON encode→decode roundtrip (ConfluentJsonConnectorTest.scala:36-48)."""
    client = InMemorySchemaRegistry()
    encoded = sample_df.select(
        "id",
        to_confluent_json(
            sample_df, F.struct("id", "name", "score"), "jt", "value", client,
            update_allowed=True,
        ).alias("js"),
    )
    # subject registered with a draft-04 schema
    _, reg = client.get_latest_schema("jt-value")
    assert reg["properties"]["name"] == {"type": "string"}
    back = encoded.select(
        "id", from_confluent_json("js", "jt", "value", client).alias("d")
    ).select("id", "d.name", "d.score")
    rows = {r["id"]: r for r in back.collect()}
    assert rows[1]["name"] == "alice" and rows[3]["score"] == 1.25
    assert rows[2]["score"] is None


def test_avro_decode_mixed_writer_schemas(spark):
    """One binary column carrying messages framed with TWO different
    writer schema ids decodes correctly in a single pass (per-schema-id
    decoder dispatch, ConfluentAvroDataToCatalyst.scala:37-46)."""
    client = InMemorySchemaRegistry()
    v1 = {
        "type": "record",
        "name": "topLevelRecord",
        "fields": [{"name": "id", "type": ["null", "long"], "default": None}],
    }
    v2 = {
        "type": "record",
        "name": "topLevelRecord",
        "fields": [
            {"name": "id", "type": ["null", "long"], "default": None},
            {"name": "tag", "type": ["null", "string"], "default": None},
        ],
    }
    id1, _ = client.set_or_update_schema("mix-value", v1)
    id2, _ = client.set_or_update_schema("mix-value", v2)
    assert id1 != id2

    from spark_extensions_spark.confluent.avro import _frame
    from spark_extensions_spark.schema.avro_codec import make_encoder

    e1, e2 = make_encoder(v1), make_encoder(v2)
    msgs = [
        (_frame(id1, e1({"id": 1})),),
        (_frame(id2, e2({"id": 2, "tag": "t2"})),),
        (_frame(id1, e1({"id": 3})),),
    ]
    df = spark.createDataFrame(msgs, "msg binary")
    out = df.select(
        from_confluent_avro("msg", "mix", "value", client).alias("d")
    ).select("d.id", "d.tag")
    rows = {r["id"]: r["tag"] for r in out.collect()}
    # reader = latest (v2): v1 messages default tag to null
    assert rows == {1: None, 2: "t2", 3: None}


def test_registry_query_names_unique():
    from spark_extensions_spark.queries import registry

    names = [q.name for q in registry()]
    assert len(names) == len(set(names))
    assert len(names) >= 70
