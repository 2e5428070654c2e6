"""spark_extensions_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference library
``smart-data-lake/spark-extensions`` (a thin Scala Catalyst-extension
layer, see SURVEY.md), re-expressed idiomatically on the public PySpark
DataFrame/SQL API, plus first-class large-scale training-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis).

Design rules (100 TB posture):
- Declarative DataFrame/SQL plans; let Catalyst/AQE pick physical strategy.
- Built-in ``pyspark.sql.functions`` in every hot path (whole-stage codegen);
  Arrow-batched pandas UDFs only where built-ins cannot express semantics.
- No driver-side collect in any operator; everything is map/shuffle over
  DataFrames.
"""

from spark_extensions_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
