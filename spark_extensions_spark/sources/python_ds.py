"""Custom connectors via the Python DataSource API (Spark 4.x).

The reference's source surface is Spark's own (SURVEY §2.C: provided
jars only); the PySpark-native engine goes one step further and hosts
*custom* connectors in pure Python — the modern extension point that
replaces implementing a Scala ``FileFormat``/``TableProvider``.

Two deterministic sources:

- ``SyntheticDocsDataSource`` (batch): generates a partitioned corpus
  of synthetic documents purely from the row id, so any engine can
  recompute the exact content (the DuckDB oracle does — see the
  ``python_ds_scan`` query). Implements ``pushFilters`` (Spark 4.1):
  ``>=``/``<``/``>``/``<=``/``=`` predicates on ``doc_id`` prune
  GENERATION (the Python analogue of parquet row-group pruning), so a
  filtered scan never materializes pruned rows at all.
- ``CounterStreamDataSource`` (streaming): an offset-tracked counter
  stream for deterministic replay tests — ``initialOffset`` 0, each
  batch advances by ``batch_size`` up to ``n``.

Scale note: partition planning happens on the driver (cheap arithmetic
over ``parts``); each ``InputPartition`` generates its slice
independently on executors via Arrow batches — the same
embarrassingly-parallel shape as a real object-store listing + ranged
read.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType


_SCHEMA_DDL = "doc_id bigint, title string, body string, score double"


def _row(i: int) -> tuple:
    body = hashlib.md5(str(i).encode()).hexdigest()
    return (i, f"doc-{i}", body, (i % 997) / 997.0)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 4))
        self.lo = 0
        self.hi = self.n

    def pushFilters(self, filters: Sequence) -> Iterator:
        """Prune the generated id range with comparison predicates on
        doc_id; anything else is returned for Spark to re-apply."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        for f in filters:
            attr = getattr(f, "attribute", None)
            if attr == ("doc_id",):
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, int(f.value))
                    continue
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, int(f.value) + 1)
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, int(f.value))
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, int(f.value) + 1)
                    continue
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, int(f.value))
                    self.hi = min(self.hi, int(f.value) + 1)
                    continue
            yield f

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        span = max(1, (hi - lo + self.parts - 1) // self.parts)
        return [
            _RangePartition(s, min(s + span, hi))
            for s in range(lo, hi, span)
        ] or [_RangePartition(0, 0)]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield _row(i)


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return _SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return _SyntheticDocsReader(self.options)


class _CounterStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.n = int(options.get("n", 100))
        self.batch = int(options.get("batch_size", 25))

    def initialOffset(self):
        return {"pos": 0}

    def latestOffset(self):
        # availableNow/poll path: advance one batch per call, capped at n
        return {"pos": self.n}

    def partitions(self, start, end):
        return [_RangePartition(start["pos"], end["pos"])]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield _row(i)

    def commit(self, end):
        pass


class CounterStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "counter_stream"

    def schema(self) -> str:
        return _SCHEMA_DDL

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _CounterStreamReader(self.options)


def register_python_sources(spark) -> None:
    """Idempotently register both sources with the session.

    Also enables ``spark.sql.python.filterPushdown.enabled`` (runtime
    conf, off by default in Spark 4.1) — without it a reader
    implementing ``pushFilters`` fails analysis outright.
    """
    if getattr(spark, "_sx_python_ds", False):
        return
    # the source classes pickle by module reference — executors must be
    # able to import the package even from a foreign-cwd driver
    from spark_extensions_spark.session import ensure_workers_can_import

    ensure_workers_can_import(spark)
    # addPyFile covers the batch DataSource workers (create_data_source
    # et al. add the pyFiles dir to sys.path) but NOT the long-running
    # python_streaming_source_runner, which unpickles the source with
    # no path setup at all — so from a foreign-cwd driver the stream
    # reader dies with ModuleNotFoundError. Registering this module for
    # BY-VALUE pickling makes the class self-contained in the pickle
    # and removes the import requirement entirely.
    from pyspark import cloudpickle  # Spark's vendored copy — the one
    # its serializers actually use; the standalone cloudpickle package
    # keeps a separate by-value registry and would be ignored

    import spark_extensions_spark.sources.python_ds as _this_module

    cloudpickle.register_pickle_by_value(_this_module)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticDocsDataSource)
    spark.dataSource.register(CounterStreamDataSource)
    spark._sx_python_ds = True
