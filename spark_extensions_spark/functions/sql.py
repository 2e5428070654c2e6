"""Dataset helpers — ``show_string`` and friends.

PySpark-native rebuild of ``DatasetHelper.showString``
(`/root/reference/src/main/scala/org/apache/spark/sql/
DatasetHelper.scala:25-27`), which exists only because the JVM method is
``private[sql]``; PySpark's own ``DataFrame.show`` goes through the same
rendering, exposed here as a returned string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def show_string(
    df: DataFrame,
    num_rows: int = 20,
    truncate: int = 20,
    vertical: bool = False,
) -> str:
    """``df.show()`` rendered to a returned string."""
    if hasattr(df, "_show_string"):  # pyspark >= 3.5 internal helper
        return df._show_string(num_rows, truncate, vertical)
    return df._jdf.showString(num_rows, truncate, vertical)
