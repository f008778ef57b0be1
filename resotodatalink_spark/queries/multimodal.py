"""Multimodal slug: binary payload -> Pandas-UDF decode -> metadata.

No ``oracle_sql`` entry on purpose: the mapInPandas stage is not
ANSI-SQL-expressible, so the driver records the rows-only check (the
pytest suite asserts the decoded values instead)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from resotodatalink_spark.operators.multimodal import attach_payload, decode_media
from resotodatalink_spark.registry import query
from resotodatalink_spark.sources.tables import table


@query("multimodal_decode")  # rows-only: Pandas-UDF stage, no SQL oracle
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return decode_media(attach_payload(d))
