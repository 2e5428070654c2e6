from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_extensions_spark.session import (  # noqa: E402
    ensure_workers_can_import,
    get_spark,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", master="local[8]")
    # ship the package zip to executor workers up front: tests that
    # reach a pandas UDF WITHOUT going through load_tables (which ships
    # it lazily) otherwise die with ModuleNotFoundError when the suite
    # runs from a foreign cwd — the exact driver-harness seam
    ensure_workers_can_import(spark)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
