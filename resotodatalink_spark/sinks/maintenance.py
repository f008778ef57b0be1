"""Table maintenance: compaction and schema-evolved reads.

A long-running sync at 100 TB accretes small files (every micro-batch
append adds a few) and evolving kind models add columns.  Both are
table-layout chores the engine should own:

* ``compact_table`` rewrites a parquet dir into ~``target_files`` files
  via a staging dir + atomic rename (same publish discipline as
  sinks.files) — readers never see a partial compaction.
* ``read_evolved`` reads a parquet dir written under several schema
  versions with ``mergeSchema``; columns missing in old files surface
  as NULLs, exactly the reference's NULL-fill semantics for absent
  props (sql.py:236-240) applied across time instead of across kinds.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from resotodatalink_spark.sinks.files import STAGING_SUFFIX, swap_staging


def compact_table(
    spark: SparkSession, dest_dir: str, table_name: str, target_files: int = 8
) -> int:
    """Rewrite ``dest_dir/table_name`` into ``target_files`` files.
    Returns the file count before compaction.  Uses coalesce (no
    shuffle) since compaction only merges, never redistributes."""
    path = os.path.join(dest_dir, table_name)
    before = len(
        [f for f in os.listdir(path) if f.endswith(".parquet")]
    )
    df = spark.read.parquet(path)
    df.coalesce(target_files).write.mode("overwrite").parquet(
        path + STAGING_SUFFIX
    )
    swap_staging(dest_dir, tables=[table_name])
    return before


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read a dir containing files with evolved (widened) schemas."""
    return spark.read.option("mergeSchema", True).parquet(path)
