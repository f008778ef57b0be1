"""Config surface compatible in shape with the reference's
(reference resotodatalink/__init__.py:4-7 and arrow/config.py:6-44), so
a reference user maps their setup 1:1:

* ``EngineConfig(connection_string, batch_size)`` — the JDBC sink
  config; ``connection_string`` is a ``jdbc:`` URL here.
* ``OutputConfig(destination, format)`` — the file sink config; the
  destination is just a URI string because the Hadoop filesystem layer
  subsumes the reference's S3Bucket/GCSBucket special-casing
  (writer.py:187-219): ``/path``, ``s3a://bucket/path`` and
  ``gs://bucket/path`` all behave identically.  ``batch_size``
  disappears — Spark's writer batches by partition, not by row count.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal

from pyspark.sql import SparkSession

from resotodatalink_spark.model.kinds import Model
from resotodatalink_spark.sources.graph import GraphSource


@dataclass(frozen=True)
class EngineConfig:
    connection_string: str
    batch_size: int = 5000


@dataclass(frozen=True)
class OutputConfig:
    destination: str
    format: Literal["parquet", "csv"] = "parquet"


def collect_sql(
    spark: SparkSession,
    source: GraphSource,
    model: Model,
    engine_config: EngineConfig,
    swap_temp_tables: bool = False,
    drop_existing_tables: bool = False,
) -> list[str]:
    """Reference-shaped entry point (collect_plugins.py:103-152) with
    the reference's two publish flags: ``swap_temp_tables`` executes
    the swap over a live JDBC connection, ``drop_existing_tables``
    then removes stale production tables (collect_plugins.py:107-108,
    sql.py:147-151)."""
    from resotodatalink_spark.operators.sync import collect_sql as _impl

    return _impl(
        spark,
        source,
        model,
        engine_config.connection_string,
        batch_size=engine_config.batch_size,
        run_swap=swap_temp_tables,
        drop_existing_tables=drop_existing_tables,
    )


def collect_to_file(
    spark: SparkSession,
    source: GraphSource,
    model: Model,
    output_config: OutputConfig,
) -> list[str]:
    """Reference-shaped entry point (collect_plugins.py:30-68)."""
    from resotodatalink_spark.operators.sync import collect_to_files

    return collect_to_files(
        spark, source, model, output_config.destination, fmt=output_config.format
    )
