"""File sinks with staged write + atomic publish.

The reference appends batches via per-table Parquet/CSV writers
(writer.py:171-184, 222-253) and publishes SQL tables by writing
``tmp_*`` tables then renaming (sql.py:129-159).  Spark's file commit
protocol already makes each ``df.write`` atomic per table; the
cross-table all-or-nothing publish the reference gets from its single
transaction (collect_plugins.py:193-194) is emulated with staging
directories renamed in one final pass.

CSV cannot hold nested types; nested columns are JSON-stringified the
way the reference's CSV type map does (type_converter.py:35-55,
writer.py:130-146).

Cloud paths (s3a://, gs://) work through the Hadoop filesystem — the
reference's spool-and-upload dance (writer.py:187-219) disappears.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

STAGING_SUFFIX = "__staging"


def stringify_nested(df: DataFrame) -> DataFrame:
    """JSON-encode array/map/struct columns for flat formats."""
    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
            cols.append(F.to_json(F.col(f.name)).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def write_table(
    df: DataFrame,
    dest_dir: str,
    table_name: str,
    fmt: str = "parquet",
    staging: bool = True,
) -> str:
    """Write one table under ``dest_dir``; with ``staging`` the data
    lands in ``<table>__staging`` until ``swap_staging`` publishes it."""
    name = table_name + STAGING_SUFFIX if staging else table_name
    path = os.path.join(dest_dir, name)
    if fmt == "csv":
        stringify_nested(df).write.mode("overwrite").option("header", True).csv(path)
    elif fmt == "parquet":
        df.write.mode("overwrite").parquet(path)
    else:
        raise ValueError(f"unsupported format: {fmt}")
    return path


OLD_SUFFIX = "__old"


def swap_staging(dest_dir: str, tables: list[str] | None = None) -> list[str]:
    """Publish ``*__staging`` dirs (reference swap_temp_tables,
    sql.py:129-159).  Local-FS implementation; on HDFS/S3 the same
    sequence goes through the Hadoop FileSystem API.

    Per table the order is: rename the live dir aside to ``<t>__old``,
    rename staging into place, delete the old dir LAST.  This is
    crash-recoverable (a crash leaves either the old or the new dir on
    disk, never neither) but NOT gap-free: between the two renames
    there is a brief instant where the live path does not exist and a
    concurrent reader fails.  If true no-gap reads are required,
    publish through a symlink flipped atomically (or a metastore
    pointer) instead.  ``tables`` scopes the
    publish to named tables; single-table writers (upsert/delete) pass
    it so a leftover staging dir from an unrelated failed job is never
    accidentally published."""
    published = []
    for entry in sorted(os.listdir(dest_dir)):
        if not entry.endswith(STAGING_SUFFIX):
            continue
        final = entry[: -len(STAGING_SUFFIX)]
        if tables is not None and final not in tables:
            continue
        final_path = os.path.join(dest_dir, final)
        old_path = final_path + OLD_SUFFIX
        if os.path.exists(old_path):  # leftover from a prior crash
            shutil.rmtree(old_path)
        had_old = os.path.exists(final_path)
        if had_old:
            os.rename(final_path, old_path)
        os.rename(os.path.join(dest_dir, entry), final_path)
        if had_old:
            shutil.rmtree(old_path)
        published.append(final)
    return published


def read_table(spark: SparkSession, dest_dir: str, table_name: str, fmt: str = "parquet") -> DataFrame:
    path = os.path.join(dest_dir, table_name)
    if fmt == "csv":
        return spark.read.option("header", True).option("inferSchema", True).csv(path)
    return spark.read.parquet(path)
