"""Parquet table source for the driver's synthetic star schema.

Counterpart of the reference's "SQL result scan" input surface
(reference collect_plugins.py:220-228): the reference syncs kind tables
into a database and queries there; we read the parquet tables directly
and register temp views so the identical SQL works via ``spark.sql``.

Scans stay declarative (``spark.read.parquet``) so Catalyst pushes
filters into the parquet reader and prunes columns — check any plan for
``PushedFilters`` / ``ReadSchema``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table. Plain parquet scan — pushdown/pruning friendly.

    ``events.ts`` adapts to the file's footer type: a timestamp[us]
    footer (current testdata) reads natively as TIMESTAMP_NTZ, while a
    TIMESTAMP(NANOS) footer — which Spark's reader rejects — falls back
    to nanos-as-long (``spark.sql.legacy.parquet.nanosAsLong``) and is
    floor-truncated to microsecond NTZ, byte-for-byte what DuckDB's µs
    TIMESTAMP sees when it reads the same file.  The streaming reader
    (streaming/batch_stream.py) mirrors this branch.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # session may forbid runtime changes; builder sets it too
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.typeName() == "long":
            # convert_timezone pins the wall-clock to UTC as
            # TIMESTAMP_NTZ — the other tables' timestamps are read as
            # NTZ already, and NTZ keeps results independent of the
            # caller session's time zone (the DuckDB oracle is naive)
            df = df.withColumn(
                "ts",
                F.expr("convert_timezone('UTC', timestamp_micros(ts div 1000))"),
            )
    return df


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    register: bool = True,
    names: tuple[str, ...] | None = None,
) -> dict[str, DataFrame]:
    """Read tables (all by default); optionally register them as temp
    views (the SQL surface the reference promises via execute_sql).
    Pass ``names`` to skip footer reads for tables a query never touches
    — each spark.read.parquet costs a driver round-trip for the schema."""
    dfs = {name: table(spark, sf_dir, name) for name in (names or TABLES)}
    if register:
        for name, df in dfs.items():
            df.createOrReplaceTempView(name)
    return dfs
