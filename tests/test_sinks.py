"""File sink + atomic swap semantics (reference sql_test.py:54-67 swap
goldens; collect_plugins_test.py:49-79 file round-trip)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from resotodatalink_spark.operators.flatten import sync_views
from resotodatalink_spark.sinks.files import (
    read_table,
    swap_staging,
    write_table,
)
from resotodatalink_spark.sources.graph import GraphSource
from tests.fixtures import example_docs, example_model


def test_parquet_staging_swap_roundtrip(spark, tmp_path):
    dest = str(tmp_path)
    model = example_model()
    src = GraphSource.from_docs(spark, example_docs())
    views = sync_views(spark, src, model)
    for name, df in views.items():
        write_table(df, dest, name)
    # nothing published yet
    assert all(e.endswith("__staging") for e in os.listdir(dest))
    published = swap_staging(dest)
    assert sorted(published) == [
        "link_some_instance_some_volume",
        "some_instance",
        "some_volume",
    ]
    back = read_table(spark, dest, "some_instance")
    assert back.count() == 1
    assert back.filter(F.col("_id") == "i-123").select("cores").collect()[0][0] == 4


def test_swap_replaces_existing(spark, tmp_path):
    dest = str(tmp_path)
    df1 = spark.range(3).withColumnRenamed("id", "v")
    write_table(df1, dest, "t", staging=False)
    assert read_table(spark, dest, "t").count() == 3
    df2 = spark.range(5).withColumnRenamed("id", "v")
    write_table(df2, dest, "t")  # staged
    assert read_table(spark, dest, "t").count() == 3  # still old data
    swap_staging(dest)
    assert read_table(spark, dest, "t").count() == 5


def test_csv_stringifies_nested(spark, tmp_path):
    dest = str(tmp_path)
    df = spark.sql(
        "select 1 as a, array('x','y') as arr, named_struct('k', 2) as st"
    )
    write_table(df, dest, "t", fmt="csv", staging=False)
    back = read_table(spark, dest, "t", fmt="csv")
    row = back.collect()[0]
    assert row["arr"] == '["x","y"]' and row["st"] == '{"k":2}'
