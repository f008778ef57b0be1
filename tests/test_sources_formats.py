"""Container-format fallbacks in sources.tables: the same slug reads
the same rows whether a table ships as parquet, ORC, JSON-lines (with
a schema sibling), or headered CSV — the 'point the engine at raw
exports' path, S5's surface widened beyond the driver's parquet."""

from __future__ import annotations

import datetime

from resotodatalink_spark import registry
from resotodatalink_spark.sources.tables import table

registry.load_all()

_ORDERS = [
    (1, 1, "O", 1.0, datetime.datetime(2020, 1, 1), "x"),
    (2, 1, "O", 2.5, datetime.datetime(2020, 1, 2), "x"),
    (3, 2, "O", 9.0, datetime.datetime(2020, 1, 3), "x"),
]
_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string,"
    " o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def _benford(spark, d):
    return sorted(
        (r.digit, r.obs)
        for r in registry.QUERIES["benford_audit"](spark, str(d)).collect()
    )


def test_orc_json_csv_match_parquet(spark, tmp_path):
    df = spark.createDataFrame(_ORDERS, _SCHEMA)
    pq = tmp_path / "pq"
    df.write.parquet(f"{pq}/orders.parquet")
    expected = _benford(spark, pq)
    assert expected == [(1, 1), (2, 1), (9, 1)]

    orc = tmp_path / "orc"
    df.write.orc(f"{orc}/orders.orc")
    assert _benford(spark, orc) == expected

    js = tmp_path / "js"
    df.write.json(f"{js}/orders.json")
    # schema sibling: JSON carries no types — derive them from an
    # empty parquet of the same schema
    df.limit(0).write.parquet(f"{js}/orders.schema.parquet")
    assert _benford(spark, js) == expected

    csv = tmp_path / "csv"
    df.write.option("header", "true").csv(f"{csv}/orders.csv")
    df.limit(0).write.parquet(f"{csv}/orders.schema.parquet")
    assert _benford(spark, csv) == expected


def test_missing_table_raises(spark, tmp_path):
    import pytest

    with pytest.raises(FileNotFoundError, match="orders"):
        table(spark, str(tmp_path), "orders")


def test_uri_sf_dir_still_resolves(spark, tmp_path):
    """Hadoop-compatible URIs bypass the local-extension probes (they
    can't os.path.exists) and resolve via Spark as before — the
    code-review regression case for the _read_any change."""
    df = spark.createDataFrame(_ORDERS, _SCHEMA)
    df.write.parquet(f"{tmp_path}/orders.parquet")
    assert table(spark, f"file://{tmp_path}", "orders").count() == 3
