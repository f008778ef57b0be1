"""Incremental upsert — beyond the reference's full-resync model.

The reference rebuilds every table per sync (drop_all + create_all,
sql.py:193-198).  At 100 TB a full rewrite per sync is untenable; the
incremental path is MERGE-by-key: keep existing rows whose key is not
in the update set (anti join), union the updates, publish atomically.
On a lakehouse table format this is a native MERGE INTO; on plain
parquet we express the same algebra with the staging-swap publish so
readers see old-or-new, never a mix.

The anti join shuffles on the key; with the table bucketed by the key
(sinks.bucketing) it is exchange-free on the existing side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from resotodatalink_spark.sinks.files import STAGING_SUFFIX, swap_staging


def upsert_table(
    spark: SparkSession,
    dest_dir: str,
    table_name: str,
    updates: DataFrame,
    key: str,
) -> None:
    """MERGE semantics: rows in ``updates`` replace same-key rows,
    everything else is kept."""
    path = os.path.join(dest_dir, table_name)
    if os.path.exists(path):
        existing = spark.read.parquet(path)
        kept = existing.join(updates.select(key).distinct(), key, "left_anti")
        merged = kept.unionByName(updates)
    else:
        merged = updates
    merged.write.mode("overwrite").parquet(path + STAGING_SUFFIX)
    swap_staging(dest_dir, tables=[table_name])


def delete_keys(
    spark: SparkSession, dest_dir: str, table_name: str, keys: DataFrame, key: str
) -> None:
    """Anti-join delete with the same atomic publish."""
    path = os.path.join(dest_dir, table_name)
    existing = spark.read.parquet(path)
    kept = existing.join(keys.select(key).distinct(), key, "left_anti")
    kept.write.mode("overwrite").parquet(path + STAGING_SUFFIX)
    swap_staging(dest_dir, tables=[table_name])
