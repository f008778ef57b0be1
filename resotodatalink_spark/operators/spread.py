"""Parallelism spreading for byte-small, FLOP-heavy inputs.

A single-row-group parquet file scans as 1-2 partitions, so any
compute-bound stage fed by it (k x d dot products, banded edit
distance, LSH banding) would run on 1-2 of the cluster's cores no
matter how many are available.  ``spread_partitions`` hash-repartitions such an
input up to the session's parallelism — one keyed shuffle of ~input
bytes buys full parallel compute.  It is a no-op (plan unchanged)
when the scan is already wide enough, so at 100 TB, where tables
arrive in thousands of splits, it adds nothing.

Used by the similarity family (measured in round 2: worst slug 8x)
and the levenshtein verify join (round 6: sf1 180s -> 17.5s).  The
counter-example is documented at queries/similarity.py kmeans_lloyd:
when the downstream is a broadcast BNLJ whose probe side is already
wide, the pre-shuffle only adds an exchange.

Known blind spot (round 11): ``getNumPartitions()`` counts byte-range
SPLITS, not data-bearing ones — a large file with ONE row group splits
into many ranges but only the range containing the row-group midpoint
carries rows, so the guard sees "already wide" and no-ops while the
scan runs on one task.  That is a data-layout defect, fixed at the
writer (tools/make_scaled_data.py pins ROW_GROUP_SIZE); probing actual
row distribution from here would cost a job per call site.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def spread_partitions(df: DataFrame, *keys: str | Column) -> DataFrame:
    """Hash-repartition ``df`` on ``keys`` up to the session's default
    parallelism iff the current partition count is below it."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    return df.repartition(target, *cols)
