"""Property tests: the portable hash fragments evaluate to IDENTICAL
values in Spark SQL and DuckDB SQL — the contract every dedup oracle
rests on.  Strings are passed as DATA (no SQL literal injection), so
any printable-ASCII content is fair game."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from resotodatalink_spark.functions.hashing import (
    MINHASH_COEFS,
    MOD,
    minhash_sql,
    spread_sql,
    str_hash_sql,
)

ASCII = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=0, max_size=64
)


def _both_engines(spark, strings: list[str]) -> tuple[list, list]:
    pdf = pd.DataFrame({"s": strings})
    expr = str_hash_sql("s")
    sdf = spark.createDataFrame(pdf).selectExpr(f"{expr} AS h").toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    odf = con.execute(f"SELECT {expr} AS h FROM t").df()
    return sdf["h"].tolist(), odf["h"].tolist()


@settings(max_examples=10, deadline=None)
@given(st.lists(ASCII, min_size=1, max_size=30))
def test_str_hash_identical_across_engines(spark, strings):
    got_spark, got_duck = _both_engines(spark, strings)
    assert got_spark == got_duck


@settings(max_examples=10, deadline=None)
@given(st.lists(ASCII, min_size=1, max_size=30))
def test_hash_in_range_and_permutations_safe(spark, strings):
    got, _ = _both_engines(spark, strings)
    a_max = max(a for a, _ in MINHASH_COEFS)
    for h in got:
        assert 0 <= h < MOD
        # minhash permutation stays inside int64 for any valid h
        assert h * a_max < 2**63


def test_spread_and_minhash_fragments_match(spark):
    strings = ["key agg row", "table value part", "", "_", "x" * 64, "a b c"]
    pdf = pd.DataFrame({"s": strings})
    exprs = [spread_sql(str_hash_sql("s")), minhash_sql(str_hash_sql("s"), 0)]
    con = duckdb.connect()
    con.register("t", pdf)
    for expr in exprs:
        got_s = spark.createDataFrame(pdf).selectExpr(f"{expr} AS v").toPandas()
        # duck's >> needs no change here (fragment avoids shifts)
        got_d = con.execute(f"SELECT {expr} AS v FROM t").df()
        assert got_s["v"].tolist() == got_d["v"].tolist()
