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

The write path IS executed in CI against Apache Derby — the embedded
engine already on Spark's classpath for the Hive metastore — via
``jdbc:derby:memory:`` URLs (tests/test_jdbc_derby.py), and the
statement generators additionally run against stdlib sqlite3
(tests/test_jdbc_sqlite.py).  ``execute_statements`` runs swap/DDL
over a live ``java.sql.Connection`` from the driver JVM — the analog
of the reference's engine-side swap execution (sql.py:129-159).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from resotodatalink_spark.sinks.dialects import dialect_for


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    batch_size: int = 5000,
    properties: dict[str, str] | None = None,
    stringify: bool = True,
    column_types: str | None = None,
) -> None:
    """``df.write.jdbc`` with dialect prepare; ``column_types`` is a
    Spark ``createTableColumnTypes`` fragment (see
    ``dialects.jdbc_column_types``) that makes the P9 VARCHAR width
    heuristic govern the DDL Spark generates — without it every string
    column gets the JDBC dialect's unbounded default."""
    props = {"batchsize": str(batch_size), **(properties or {})}
    out = dialect_for(url).prepare(df) if stringify else df
    w = out.write
    if column_types:
        w = w.option("createTableColumnTypes", column_types)
    w.jdbc(url=url, table=table, mode=mode, properties=props)


def execute_statements(
    spark: SparkSession,
    url: str,
    statements: list[str],
    tolerate_sqlstates: tuple[str, ...] = ("42Y55",),
) -> list[str]:
    """Execute DDL/DML statements over a live JDBC connection obtained
    from the driver JVM's ``DriverManager`` (how the reference's engine
    connection runs the swap, sql.py:129-159).  Driver-side on purpose:
    swap/DDL is a handful of metadata statements, not data movement —
    the data went through ``write_jdbc``'s distributed path.

    ``tolerate_sqlstates`` skips engines' missing-object errors where
    the dialect has no ``IF EXISTS`` guard (Derby 42Y55) — but ONLY on
    ``DROP`` statements, which are the guardless case.  A RENAME that
    hits the same state (e.g. the tmp table is missing after a partial
    prior run) is a failed publish, not a benign first-run drop, and
    must raise rather than let the old generation silently stay live.
    Anything else re-raises.  Returns the statements that actually
    executed."""
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    executed: list[str] = []
    try:
        st = conn.createStatement()
        for s in statements:
            try:
                st.execute(s)
                executed.append(s)
            except Exception as e:  # Py4JJavaError wrapping SQLException
                je = getattr(e, "java_exception", None)
                state = (
                    je.getSQLState()
                    if je is not None and hasattr(je, "getSQLState")
                    else None
                )
                is_drop = s.lstrip().upper().startswith("DROP ")
                if not is_drop or state not in tolerate_sqlstates:
                    raise
    finally:
        conn.close()
    return executed


def list_jdbc_tables(spark: SparkSession, url: str) -> list[str]:
    """Table names visible through JDBC metadata, lowercased (Derby
    reports unquoted identifiers uppercase) — the input
    ``swap_temp_tables_sql`` expects, mirroring the reference's
    pre-swap metadata reflection (sql.py:129-143).

    Enumeration is scoped to the connection's CURRENT schema (the
    reference reflects only the default schema, sql.py:129-134): an
    unscoped ``getTables(None, None, ...)`` walks every catalog and
    schema, and a stale-table sweep fed by that list would drop other
    applications' tables on a shared database."""
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        try:
            schema = conn.getSchema()  # JDBC 4.1; None on old drivers
        except Exception:
            schema = None
        rs = conn.getMetaData().getTables(None, schema, "%", None)
        out = []
        while rs.next():
            if rs.getString("TABLE_TYPE") == "TABLE":
                out.append(rs.getString("TABLE_NAME").lower())
        return sorted(out)
    finally:
        conn.close()


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
