"""Bucketed table layout for co-located, shuffle-free joins.

The reference's link tables exist to be joined (sql.py:190-201); at
100 TB the winning physical layout is bucketing both join sides on the
key so the sort-merge join needs NO exchange — each bucket pair joins
locally.  This module writes/reads bucketed managed tables and the test
asserts the join plan is exchange-free on the bucketed key.

On a real lakehouse the same intent is expressed with table-format
clustering; Spark's saveAsTable bucketing is the built-in vehicle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — with matching
    bucket counts Spark elides both exchanges (verify with .explain:
    no Exchange above either scan)."""
    return spark.table(left_table).join(spark.table(right_table), key)
