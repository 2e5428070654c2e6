"""Arrow IPC source/sink roundtrips (sources/arrow_ipc.py)."""

from __future__ import annotations

import glob
import tempfile

import pyarrow.ipc as pa_ipc
import pytest

from pyspark.sql import functions as F

from spark_extensions_spark.sources.arrow_ipc import (
    read_arrow_ipc,
    write_arrow_ipc,
)


def test_roundtrip_multi_partition(spark):
    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 7).cast("double").alias("v"),
        F.concat(F.lit("s"), F.col("id").cast("string")).alias("s"),
    ).repartition(4)
    path = tempfile.mkdtemp(prefix="arrow_ipc_")
    write_arrow_ipc(df, path)
    files = glob.glob(path + "/*.arrow")
    assert len(files) == 4
    back = read_arrow_ipc(spark, path)
    assert back.schema == df.schema
    assert sorted(r.id for r in back.collect()) == list(range(1000))
    got = {r.id: (r.v, r.s) for r in back.collect()}
    assert got[13] == (13 % 7 * 1.0, "s13")


def test_files_are_readable_by_plain_pyarrow(spark):
    df = spark.range(10).select(F.col("id"), F.lit("x").alias("tag"))
    path = tempfile.mkdtemp(prefix="arrow_ipc_")
    write_arrow_ipc(df.coalesce(1), path)
    [f] = glob.glob(path + "/*.arrow")
    table = pa_ipc.open_file(f).read_all()
    assert table.num_rows == 10
    assert table.column_names == ["id", "tag"]


def test_read_empty_dir_raises(spark):
    path = tempfile.mkdtemp(prefix="arrow_ipc_")
    with pytest.raises(ValueError):
        read_arrow_ipc(spark, path)


def test_nulls_roundtrip(spark):
    df = spark.range(6).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, F.col("id").cast("double")).alias("v"),
    )
    path = tempfile.mkdtemp(prefix="arrow_ipc_")
    write_arrow_ipc(df, path)
    back = read_arrow_ipc(spark, path)
    vals = {r.id: r.v for r in back.collect()}
    assert vals[1] is None and vals[2] == 2.0
