"""Cross-engine property test for the portable hash: the SAME SQL
fragment must produce identical values in Spark and DuckDB for
arbitrary text — including non-ASCII, where the % 256 code-point clamp
(functions/hashing.py h8_sql) is what keeps both engines inside int64
instead of diverging (DuckDB errors on BIGINT overflow, non-ANSI Spark
wraps silently)."""

from __future__ import annotations

import random

import duckdb

from resotodatalink_spark.functions.hashing import str_hash_sql


def _corpus() -> list[str]:
    rng = random.Random(20260813)
    alphabets = [
        "abcdefghijklmnopqrstuvwxyz0123456789 _-",
        "àâçéèêëîïôùûüÿœæ",                       # latin-1 supplement
        "αβγδεζηθικλμνξοπρστυφχψω",               # greek
        "абвгдежзийклмнопрстуфхцчшщ",             # cyrillic
        "日本語のテキスト中文文本한국어",          # CJK + hangul
        "😀🎉🚀🔥🌍💡",                            # astral plane (surrogates)
    ]
    out = ["", "a", "_" * 16, "exactly16chars!!", "x" * 200]
    for _ in range(60):
        alpha = rng.choice(alphabets)
        out.append("".join(rng.choice(alpha) for _ in range(rng.randint(1, 40))))
    # mixed-script strings
    for _ in range(20):
        out.append("".join(rng.choice(rng.choice(alphabets)) for _ in range(24)))
    return out


def test_str_hash_matches_duckdb_on_unicode(spark):
    texts = _corpus()
    sdf = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i INT, t STRING")
    got = {
        r["i"]: r["h"]
        for r in sdf.selectExpr("i", f"{str_hash_sql('t')} AS h").collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE strs(i INT, t VARCHAR)")
    con.executemany("INSERT INTO strs VALUES (?, ?)", list(enumerate(texts)))
    want = dict(con.execute(f"SELECT i, {str_hash_sql('t')} FROM strs").fetchall())
    assert got == want
    # hashes are bounded and non-negative in both engines
    assert all(0 <= h < 2147483647 for h in got.values())
