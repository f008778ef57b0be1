"""Query registry backing ``__spark_entry__.queries()`` / ``oracle_sql()``.

Every operator slug from SURVEY.md §2 registers here: a Spark
implementation ``(spark, sf_dir) -> DataFrame`` and (when expressible)
an equivalent ANSI SQL string the DuckDB oracle runs on the same
parquet tables.  Column names/aliases are kept identical on both sides
because the driver's comparator sorts columns by name before hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query slug; ``oracle=None`` => rows-only check
    (genuinely non-SQL-expressible ops only)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side effects run."""
    from resotodatalink_spark.queries import (  # noqa: F401
        dedup,
        graph,
        layout,
        multimodal,
        pipeline,
        quality,
        relational,
        similarity,
        streaming,
        text,
        tpch,
    )
