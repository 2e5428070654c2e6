"""Public API facade: every __all__ export must resolve (keeps the
user-facing import surface from rotting as modules evolve)."""

import importlib


def test_public_facades_resolve():
    pkgs = [
        "spark_extensions_spark",
        "spark_extensions_spark.operators",
        "spark_extensions_spark.functions",
        "spark_extensions_spark.schema",
        "spark_extensions_spark.confluent",
        "spark_extensions_spark.sources",
        "spark_extensions_spark.streaming",
        "spark_extensions_spark.multimodal",
    ]
    total = 0
    for name in pkgs:
        mod = importlib.import_module(name)
        exports = getattr(mod, "__all__", [])
        assert exports, f"{name} has no __all__"
        for a in exports:
            assert hasattr(mod, a), f"{name}.{a} missing"
        total += len(exports)
    assert total > 100
