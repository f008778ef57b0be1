"""Raw-SQL passthrough — the reference's entire query surface.

Counterpart of ``execute_sql`` (reference collect_plugins.py:220-228):
the reference forwards an opaque SQL string + bind vars to the target
database and streams dict rows back.  Here Spark SQL *is* the engine:
Catalyst parses/optimizes and the cluster executes, so the passthrough
is genuinely distributed instead of delegated.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def execute_sql(
    spark: SparkSession, sql: str, bind_vars: dict[str, Any] | None = None
) -> DataFrame:
    """Run SQL against the registered temp views.

    Named parameters (``:name``) use Spark's parameterized SQL (>=3.4)
    — safe binding, no string interpolation.
    """
    if bind_vars:
        return spark.sql(sql, args=bind_vars)
    return spark.sql(sql)


def stream_rows(df: DataFrame) -> Iterator[dict[str, Any]]:
    """Dict-row stream, mirroring the reference's async generator
    (collect_plugins.py:227-228) without materializing on the driver."""
    for row in df.toLocalIterator():
        yield row.asDict(recursive=True)
