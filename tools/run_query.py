"""Run any registered operator slug from the command line.

The user-facing entry point for ad-hoc use (the ``resotodatalink``
equivalent of pointing ``execute_sql`` at a database — here you point
a slug at a parquet directory):

    python tools/run_query.py <slug> [sf_dir] [--explain] [--oracle]
                              [--limit N]
    python tools/run_query.py --sql "SELECT ..." [sf_dir] [--explain]
    python tools/run_query.py --list [pattern]

``--sql`` registers every parquet table in ``sf_dir`` as a temp view
(region nation customer supplier part orders lineitem events
documents embeddings) and runs the statement through Spark SQL — the
``execute_sql`` entry point of the reference, Spark-side.

* default ``sf_dir`` is ``$SPARK_GRAFT_SF_DIR`` or /root/testdata/sf0.01
* ``--explain``  prints the formatted physical plan instead of rows
* ``--oracle``   runs the registered DuckDB oracle SQL side-by-side
                 and prints both row counts (a one-slug correctness
                 spot check; tools/check_queries.py does the full
                 value-hash comparison)
* ``--limit N``  caps printed rows (default 20; ``0`` prints none).
                 One bounded collect of N+1 rows serves both the
                 preview and the ``>= N+1``/exact row hint — no
                 second full execution, no unbounded collect
* ``--list``     prints registered slugs, optionally filtered by a
                 case-insensitive substring
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from resotodatalink_spark.sources.tables import TABLES, table  # noqa: E402


def main(argv: list[str]) -> int:
    argv = list(argv)
    limit = 20
    for i, a in enumerate(argv):
        if a.startswith("--limit="):
            limit = int(a.split("=", 1)[1])
        elif a == "--limit" and i + 1 < len(argv):
            limit = int(argv[i + 1])
            argv[i + 1] = "--consumed"
    args = [a for a in argv if not a.startswith("--")]
    flags = {a for a in argv if a.startswith("--") and "=" not in a}

    from resotodatalink_spark import registry

    registry.load_all()

    if "--list" in flags:
        pat = (args[0] if args else "").lower()
        for slug in sorted(registry.QUERIES):
            if pat in slug.lower():
                kind = "oracle" if slug in registry.ORACLES else "rows-only"
                print(f"{slug}  [{kind}]")
        return 0

    sql_stmt = None
    for i, a in enumerate(argv):
        if a == "--sql" and i + 1 < len(argv):
            sql_stmt = argv[i + 1]
            args = [x for x in args if x != sql_stmt]

    if not args and sql_stmt is None:
        print(__doc__)
        return 2
    sf_dir = (
        args[1 if sql_stmt is None else 0]
        if len(args) > (1 if sql_stmt is None else 0)
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    )

    if sql_stmt is not None:
        from resotodatalink_spark.session import get_spark

        spark = get_spark()
        for t in TABLES:
            try:  # any container table() resolves (parquet/orc/json/csv)
                table(spark, sf_dir, t).createOrReplaceTempView(t)
            except FileNotFoundError:
                pass
        df = spark.sql(sql_stmt)
        if "--explain" in flags:
            df.explain("formatted")
            return 0
        rows = df.limit(limit + 1).collect()
        for r in rows[:limit]:
            print(r.asDict())
        n_hint = f">= {limit + 1}" if len(rows) > limit else str(len(rows))
        print(f"-- sql: {n_hint} rows ({sf_dir})")
        return 0

    slug = args[0]
    if slug not in registry.QUERIES:
        near = [s for s in sorted(registry.QUERIES) if slug.lower() in s.lower()]
        print(f"unknown slug {slug!r}; close matches: {near[:8]}")
        return 2

    from resotodatalink_spark.session import get_spark

    spark = get_spark()
    df = registry.QUERIES[slug](spark, sf_dir)

    if "--explain" in flags:
        df.explain("formatted")
        return 0

    # One bounded action: collect limit+1 rows, print limit, derive a
    # ">= limit" hint from the sentinel row instead of a second full
    # execution via count().  --limit 0 prints nothing (and never
    # falls through to an unbounded whole-result collect).
    rows = df.limit(limit + 1).collect()
    for r in rows[:limit]:
        print(r.asDict())
    n_hint = f">= {limit + 1}" if len(rows) > limit else str(len(rows))
    print(f"-- {slug}: {n_hint} rows ({sf_dir})")

    if "--oracle" in flags and slug in registry.ORACLES:
        import duckdb

        con = duckdb.connect()
        for t in TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(path):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM '{path}'"
                )
        on = len(con.execute(registry.ORACLES[slug]).fetchall())
        n = df.count()  # exact count only on explicit --oracle opt-in
        print(f"-- spark: {n} rows")
        print(f"-- oracle: {on} rows ({'MATCH' if on == n else 'MISMATCH'})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
