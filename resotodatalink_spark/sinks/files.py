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
reference's spool-and-upload dance (writer.py:187-219) disappears:
``df.write`` resolves the scheme itself, and ``swap_staging`` routes
its list/rename/delete through the Hadoop FileSystem API whenever the
destination is a URI (exercised in CI over ``file:`` URIs, which take
the exact same FS-API path as ``s3a://`` minus the S3 connector —
tests/test_sinks.py).  NOTE on object stores: S3 "rename" is
copy+delete (not atomic, O(data)); for heavy S3 publishing prefer a
table format with a metastore pointer flip.  The FS-API path is still
correct there — just not instantaneous.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.utils import AnalysisException

STAGING_SUFFIX = "__staging"

# Optional (id, kind) index table maintained alongside the kind tables
# (leading underscore keeps it out of the kind/link namespace).  At
# collector scale it turns incremental endpoint-kind resolution from
# "scan the id column of EVERY published kind table" into one bucketed
# join against one narrow table — see operators/incremental.py.
NODE_INDEX = "_node_index"


def _is_uri(path: str) -> bool:
    return "://" in path or path.startswith("file:")


class _HadoopFs:
    """Minimal list/exists/rename/rmtree over the JVM Hadoop
    FileSystem — the routing layer that makes the staged-publish
    sequence work on any scheme Spark can write to (K8, reference
    writer.py:187-219)."""

    def __init__(self, spark: SparkSession, base: str):
        jvm = spark._jvm
        self._Path = jvm.org.apache.hadoop.fs.Path
        hconf = spark._jsc.hadoopConfiguration()
        self._fs = self._Path(base).getFileSystem(hconf)

    def listdir(self, d: str) -> list[str]:
        p = self._Path(d)
        if not self._fs.exists(p):
            return []
        return [s.getPath().getName() for s in self._fs.listStatus(p)]

    def exists(self, p: str) -> bool:
        return bool(self._fs.exists(self._Path(p)))

    def rename(self, src: str, dst: str) -> None:
        if not self._fs.rename(self._Path(src), self._Path(dst)):
            raise OSError(f"rename failed: {src} -> {dst}")

    def rmtree(self, p: str) -> None:
        self._fs.delete(self._Path(p), True)


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
        flat = stringify_nested(df)
        flat.write.mode("overwrite").option("header", True).csv(path)
        _write_schema_marker(flat, path)
    elif fmt == "parquet":
        df.write.mode("overwrite").parquet(path)
    elif fmt == "orc":
        df.write.mode("overwrite").orc(path)
    elif fmt == "json":
        # JSON-lines keeps nested types natively; no stringification.
        # Type fidelity on re-read comes from the schema marker: JSON
        # text cannot distinguish timestamp/date/decimal from string,
        # so inference alone would round-trip them as strings.
        df.write.mode("overwrite").json(path)
        _write_schema_marker(df, path)
    else:
        raise ValueError(f"unsupported format: {fmt}")
    return path


SCHEMA_MARKER = "_schema.parquet"


def _write_schema_marker(df: DataFrame, table_path: str) -> None:
    """Zero-row parquet carrying the exact write-side schema for text
    formats, written INSIDE the table directory (the sink-side twin of
    ``sources.tables._read_any``'s schema-sibling convention, round-11
    advice) so a JSON/CSV round-trip keeps timestamp/date/decimal
    columns typed instead of falling back to string inference.

    Living inside the data dir (underscore-prefixed, so every Spark
    reader's hidden-file filter skips it) means it rides the SAME
    staging rename as its data — no publish-order crash window where a
    new schema could silently misparse old data, no extra entry in the
    swap, and ``df.write`` resolves cloud URIs the exact same way the
    data write did."""
    df.limit(0).write.mode("overwrite").parquet(
        table_path.rstrip("/") + "/" + SCHEMA_MARKER
    )


OLD_SUFFIX = "__old"


def swap_staging(
    dest_dir: str,
    tables: list[str] | None = None,
    spark: SparkSession | None = None,
) -> list[str]:
    """Publish ``*__staging`` dirs (reference swap_temp_tables,
    sql.py:129-159).  A plain local path uses ``os`` primitives; a URI
    destination (``file:``, ``hdfs://``, ``s3a://``, ``gs://``) routes
    every list/rename/delete through the Hadoop FileSystem API of the
    active Spark session — the same resolver ``df.write`` used, so any
    scheme the write reached can also be published (K8, reference
    writer.py:187-219).

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
    if _is_uri(dest_dir):
        spark = spark or SparkSession.getActiveSession()
        if spark is None:
            raise ValueError("URI destination needs an active SparkSession")
        fs = _HadoopFs(spark, dest_dir)
        listdir, exists = fs.listdir, fs.exists
        rename, rmtree = fs.rename, fs.rmtree
        join = lambda *parts: "/".join(p.rstrip("/") for p in parts)  # noqa: E731
    else:
        listdir, exists = os.listdir, os.path.exists
        rename, rmtree, join = os.rename, shutil.rmtree, os.path.join
    published = []
    for entry in sorted(listdir(dest_dir)):
        if not entry.endswith(STAGING_SUFFIX):
            continue
        final = entry[: -len(STAGING_SUFFIX)]
        if tables is not None and final not in tables:
            continue
        final_path = join(dest_dir, final)
        old_path = final_path + OLD_SUFFIX
        if exists(old_path):  # leftover from a prior crash
            rmtree(old_path)
        had_old = exists(final_path)
        if had_old:
            rename(final_path, old_path)
        rename(join(dest_dir, entry), final_path)
        if had_old:
            rmtree(old_path)
        published.append(final)
    return published


def read_table(
    spark: SparkSession,
    dest_dir: str,
    table_name: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
) -> DataFrame:
    """Read a published table back.  Text formats (csv/json) take the
    explicit ``schema`` when given, else the zero-row ``_schema.parquet``
    marker (``SCHEMA_MARKER``) ``write_table`` publishes INSIDE the
    table directory, else inference — the ladder that keeps
    timestamp/date/decimal columns typed across a JSON/CSV round-trip."""
    path = os.path.join(dest_dir, table_name)
    if fmt in ("csv", "json") and schema is None:
        # the marker lives inside the table dir, so this resolves on
        # any scheme df.write reached (local, file:, s3a://, ...) —
        # a plain reader probe, no local-only os.path.exists
        try:
            schema = spark.read.parquet(
                path.rstrip("/") + "/" + SCHEMA_MARKER
            ).schema
        except AnalysisException:
            schema = None  # pre-marker table: fall through to inference
    if fmt == "csv":
        r = spark.read.option("header", True)
        r = r.schema(schema) if schema is not None else r.option("inferSchema", True)
        return r.csv(path)
    if fmt == "orc":
        return spark.read.orc(path)
    if fmt == "json":
        r = spark.read
        if schema is not None:
            r = r.schema(schema)
        return r.json(path)
    return spark.read.parquet(path)
