"""JDBC sink — the reference's SQL-database path (sql.py:245-261).

The reference chunks INSERT statements at ``insert_batch_size`` (5000,
sql.py:173); Spark's JDBC writer does the same via ``batchsize`` with
one connection per partition, so ingest parallelism scales with the
DataFrame's partitioning instead of a single connection.

Dialect-specific behavior (column types, how nested values ship,
statement shapes) lives in the ``sinks.dialects`` registry (reference
DialectUpdater, sql.py:264-272; Snowflake specialization
snowflake.py:49-92) — ``write_jdbc`` resolves the dialect from the URL
and applies its ``prepare`` step before the write.

No database server exists in this environment, so the write itself is a
thin, untested-by-CI wrapper; the dialect statement generators ARE
unit-tested (tests/test_sinks.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from resotodatalink_spark.sinks.dialects import dialect_for


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    batch_size: int = 5000,
    properties: dict[str, str] | None = None,
    stringify: bool = True,
) -> None:
    props = {"batchsize": str(batch_size), **(properties or {})}
    out = dialect_for(url).prepare(df) if stringify else df
    out.write.jdbc(url=url, table=table, mode=mode, properties=props)


def swap_temp_tables_sql(
    tables: list[str],
    temp_prefix: str = "tmp_",
    drop_existing_tables: bool = False,
) -> list[str]:
    """The DDL the reference's swap performs (sql.py:129-159), emitted
    as statements for the target database to run: each staged ``tmp_*``
    table replaces its production counterpart atomically-per-table, and
    with ``drop_existing_tables`` any production table that was NOT
    updated this sync is dropped as stale (reference sql.py:147-151;
    golden-tested against stdlib sqlite3 in tests/test_jdbc_sqlite.py)."""
    stmts = []
    updated = set()
    for t in tables:
        if not t.startswith(temp_prefix):
            continue
        prod = t[len(temp_prefix):]
        updated.add(prod)
        stmts.append(f"DROP TABLE IF EXISTS {prod}")
        stmts.append(f"ALTER TABLE {t} RENAME TO {prod}")
    if drop_existing_tables:
        for t in tables:
            if not t.startswith(temp_prefix) and t not in updated:
                stmts.append(f"DROP TABLE IF EXISTS {t}")
    return stmts
