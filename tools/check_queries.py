"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, sorted
column names, and an order-insensitive canonicalized value frame.
Stricter than the driver (exact canonical string equality), so passing
here should imply passing CORRECTNESS_r{N}.json.

Usage: python tools/check_queries.py [sf_dir] [slug ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from resotodatalink_spark.session import get_spark  # noqa: E402
from resotodatalink_spark.sources.tables import TABLES  # noqa: E402


def complex_columns(df: pd.DataFrame) -> list[str]:
    """Columns holding list/dict/ndarray values — the driver's
    attestation canonicalizer sorts frames with pandas ``sort_values``,
    which cannot factorize these (round-7 red row on
    ``regex_extract_all``).  The local gate now REJECTS them outright
    so an array-typed slug can never pass locally and fail the driver."""
    bad = []
    for c in df.columns:
        col = df[c]
        if len(col) == 0:
            continue
        sample = col.iloc[: min(len(col), 50)]
        if any(
            isinstance(v, (list, tuple, dict, set))
            or type(v).__module__ == "numpy"
            and getattr(v, "ndim", 0) > 0
            for v in sample
        ):
            bad.append(c)
    return bad


def canon_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        # full-precision repr: stricter than any sane driver hash
        if v == 0:
            v = 0.0
        return repr(v)
    if isinstance(v, (pd.Timestamp,)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_value(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def canon_frame(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: canon_value(None if v is pd.NaT else v))
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check-queries")

    def fresh_con():
        # SHORT-LIVED connections by design: a single sweep-long
        # connection malloc-failed ~130-145 oracles in on three long
        # runs (buffer-pool state accumulates across queries until any
        # next allocation dies, even one the same oracle passes in 0.0s
        # on a fresh connection) — tests/conftest.make_duck has the
        # full story.  Creation + view registration costs ~ms.
        c = duckdb.connect()
        c.execute("SET memory_limit='8GB'")
        c.execute("SET temp_directory='/tmp/duck_spill'")
        for t in TABLES:
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        return c

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures: list[str] = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        # deterministic block-manager hygiene between slugs: dead
        # localCheckpoint blocks otherwise wait on a driver GC for
        # ContextCleaner to reap them (bench.py round-9 OOM lesson)
        try:
            it = spark._jsparkSession.sparkContext().getPersistentRDDs().iterator()
            while it.hasNext():
                it.next()._2().unpersist(False)
        except Exception:
            pass
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: spark query raised")
            traceback.print_exc()
            failures.append(name)
            continue
        if name not in oracles:
            cc = complex_columns(sdf)
            if cc:
                print(
                    f"FAIL {name}: rows-only result has driver-"
                    f"uncanonicalizable (list/map-typed) columns: {cc}"
                )
                failures.append(name)
                continue
            print(f"ok   {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            if len(sdf) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            con = fresh_con()
            odf = con.execute(oracles[name]).df()
            con.close()
        except duckdb.Error:
            # one retry on another fresh connection: rare transient
            # duckdb errors observed on this sandbox; a genuine oracle
            # failure recurs and still FAILs below
            try:
                odf = fresh_con().execute(oracles[name]).df()
            except Exception:
                print(f"FAIL {name}: oracle SQL raised")
                traceback.print_exc()
                failures.append(name)
                continue
        except Exception:
            print(f"FAIL {name}: oracle SQL raised")
            traceback.print_exc()
            failures.append(name)
            continue
        problems = []
        for side, frame in (("spark", sdf), ("duckdb", odf)):
            cc = complex_columns(frame)
            if cc:
                problems.append(
                    f"{side} result has driver-uncanonicalizable "
                    f"(list/map-typed) columns: {cc} — emit array_join/"
                    f"to_json scalars instead"
                )
        if len(sdf) != len(odf):
            problems.append(f"row count spark={len(sdf)} duckdb={len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(
                f"columns spark={sorted(sdf.columns)} duckdb={sorted(odf.columns)}"
            )
        if not problems:
            cs, co = canon_frame(sdf), canon_frame(odf)
            if not cs.equals(co):
                neq = (cs != co).any(axis=1)
                idx = neq[neq].index[:3]
                for i in idx:
                    problems.append(f"row {i}: spark={cs.loc[i].to_dict()}")
                    problems.append(f"row {i}: duck ={co.loc[i].to_dict()}")
                problems.append(f"{int(neq.sum())} differing canonical rows")
        if problems:
            print(f"FAIL {name}:")
            for p in problems:
                print(f"  {p}")
            failures.append(name)
        else:
            print(f"ok   {name}: {len(sdf)} rows match ({time.time()-t0:.1f}s)")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        return 1
    print(f"all {len([n for n in qs if not only or n in only])} checked queries ok")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
