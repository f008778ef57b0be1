"""Interval overlap join — the range-join pattern binned into an
equi-join.

A naive overlap join (``a.s < b.e AND b.s < a.e``) has no equality
predicate, so Spark can only plan it as a broadcast nested loop or
cartesian — a scale killer.  The standard fix (same family as the
levenshtein length-bucket join, operators/dedup.py): assign each
interval to every fixed-width time bucket it touches, equi-join on the
bucket, and keep each qualifying pair at exactly ONE canonical bucket
so no dedup shuffle is needed.

Canonical-witness rule: count the pair only where
``bk == max(start_bucket_a, start_bucket_b)``.  If two intervals
overlap, the later-starting one's start lies inside the other, so its
start bucket is covered by BOTH intervals' bucket spans — the witness
key always exists, and it is unique by construction.  This works for
arbitrary (mixed-length) intervals; the explode factor is
``interval_length / bucket_width + 1`` per row, so pick the width near
the typical interval length.

Reference parity: the reference has no interval/range join (its query
surface delegates to the target DB); this is training-pipeline
infrastructure (session overlap, speaker diarization, ad attribution)
in the same family as the dedup blocking joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def overlap_self_join(
    intervals: DataFrame,
    bucket_width: int,
    id_col: str = "id",
    start_col: str = "s",
    end_col: str = "e",
    block_cols: tuple[str, ...] = (),
) -> DataFrame:
    """All pairs (id_a < id_b) of half-open intervals [s, e) that
    overlap: ``a.s < b.e AND b.s < a.e`` (same block, if given).
    Returns (id_a, id_b, overlap) with the overlap length in the
    start/end unit.  ``bucket_width`` is in the same unit."""
    w = int(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")
    base = intervals.select(
        F.col(id_col).alias("_id"),
        F.col(start_col).cast("long").alias("_s"),
        F.col(end_col).cast("long").alias("_e"),
        *[F.col(c) for c in block_cols],
    )
    # half-open [s, e): the last touched bucket is floor((e-1)/w)
    e = base.withColumn(
        "bk",
        F.explode(
            F.sequence(
                F.floor(F.col("_s") / w),
                F.floor((F.col("_e") - 1) / w),
            )
        ),
    )
    a = e.select(
        F.col("_id").alias("id_a"),
        F.col("_s").alias("s_a"),
        F.col("_e").alias("e_a"),
        "bk",
        *[F.col(c) for c in block_cols],
    )
    b = e.select(
        F.col("_id").alias("id_b"),
        F.col("_s").alias("s_b"),
        F.col("_e").alias("e_b"),
        "bk",
        *[F.col(c) for c in block_cols],
    )
    # Pin sort-merge (optimization round 13): both join sides are the
    # SAME exploded corpus-sized frame, whose size estimate is the
    # pre-explode scan's — at sf10 the planner broadcast the full 10M+
    # row exploded events frame (PLAN_AUDIT: 0 exchanges, 1 hash join;
    # the single-threaded broadcast build was most of the 14.7s wall,
    # and at 100 TB it is a driver OOM).  Same rule as the posting
    # self-joins in operators/dedup.py — corpus x corpus never
    # broadcasts; SMJ sorts and spills.
    pairs = a.join(b.hint("merge"), [*block_cols, "bk"]).filter(
        (F.col("id_a") < F.col("id_b"))
        & (F.col("s_a") < F.col("e_b"))
        & (F.col("s_b") < F.col("e_a"))
        # canonical witness: the later start's bucket, shared by both
        # spans whenever the pair overlaps — each pair counted once,
        # no dropDuplicates exchange
        & (
            F.col("bk")
            == F.greatest(
                F.floor(F.col("s_a") / w), F.floor(F.col("s_b") / w)
            )
        )
    )
    return pairs.select(
        "id_a",
        "id_b",
        (
            F.least(F.col("e_a"), F.col("e_b"))
            - F.greatest(F.col("s_a"), F.col("s_b"))
        ).alias("overlap"),
    )
