"""Persisted MinHash signature store — continuous dedup for a growing
corpus.

The incremental-dedup QUERY shape (queries/dedup.py dedup_incremental:
batch band rows equi-join corpus band rows, never a corpus self-join)
assumes the corpus side is a cheap scan of PERSISTED signatures.  This
module owns that store's lifecycle, built from the same pieces as the
table sync (sinks/files.py staging + atomic swap; the merge algebra of
operators/incremental.py):

* ``bootstrap_signature_store`` — one narrow row per doc (doc_id,
  m0..m15), written through staging and published atomically.
* ``ingest_batch`` — per increment: sign ONLY the new batch, find its
  corpus twins against the stored table, then advance the store by
  merge (batch rows replace same-id rows, tombstoned ids swept) in the
  same staged-publish pattern.  Per-increment cost is
  O(batch + collisions + store rewrite); the store rewrite is a narrow
  16-int-column table, and on a partitioned layout the anti-join/union
  rewrite touches only the affected partitions (sinks/bucketing.py for
  the exchange-free variant).

Reference parity: the reference rebuilds every table per sync
(collect_plugins.py); this is the beyond-reference steady-state path,
the dedup analog of operators/incremental.sync_delta.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from resotodatalink_spark.functions.hashing import N_MINHASH
from resotodatalink_spark.operators.dedup import (
    minhash_pairs_between,
    minhash_signatures,
)
from resotodatalink_spark.sinks.files import read_table, swap_staging, write_table

SIGNATURE_TABLE = "_minhash_signatures"


def bootstrap_signature_store(
    docs: DataFrame, dest_dir: str, id_col: str = "doc_id", text_col: str = "text"
) -> None:
    """Sign the corpus and publish the signature table atomically."""
    sig = minhash_signatures(docs, id_col, text_col)
    write_table(sig, dest_dir, SIGNATURE_TABLE)
    swap_staging(dest_dir, [SIGNATURE_TABLE], spark=docs.sparkSession)


def read_signature_store(spark: SparkSession, dest_dir: str) -> DataFrame:
    return read_table(spark, dest_dir, SIGNATURE_TABLE)


def ingest_batch(
    spark: SparkSession,
    dest_dir: str,
    batch_docs: DataFrame,
    min_agree: int = 8,
    deleted_ids: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Dedupe a new batch against the stored corpus and advance the
    store one generation.

    Returns the twin pairs (batch_doc, corpus_doc, n_common) with
    ``n_common >= min_agree`` agreeing minhashes (est. Jaccard >=
    min_agree/16), MATERIALIZED before the publish — the result stays
    valid after the store generation advances under it.  A batch row
    whose id already exists in the store REPLACES it (re-crawled doc);
    ids in ``deleted_ids`` are swept.  Batch-internal twins are the
    batch self-dedup slugs' job, not this join's."""
    store = read_signature_store(spark, dest_dir)
    # One signature row per id, even if the batch spools the same doc
    # twice (re-crawl within a batch): without this, the anti-join
    # removes the old store row but unionByName appends EVERY batch
    # row, leaving multi-row ids that corrupt later generations.
    batch_sig = minhash_signatures(batch_docs, id_col, text_col).dropDuplicates(
        [id_col]
    )
    # the store may still hold a previous generation of re-crawled ids;
    # compare the batch against FOREIGN corpus rows only
    corpus = store.join(
        batch_sig.select(F.col(id_col)), id_col, "left_anti"
    )
    cand = minhash_pairs_between(batch_sig, corpus, id_col)
    sa = batch_sig.select(
        F.col(id_col).alias("batch_doc"),
        *[F.col(f"m{i}").alias(f"a{i}") for i in range(N_MINHASH)],
    )
    sb = corpus.select(
        F.col(id_col).alias("corpus_doc"),
        *[F.col(f"m{i}").alias(f"b{i}") for i in range(N_MINHASH)],
    )
    agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(N_MINHASH)
    )
    pairs = (
        cand.withColumnRenamed("doc_a", "batch_doc")
        .withColumnRenamed("doc_b", "corpus_doc")
        .join(sa, "batch_doc")
        .join(sb, "corpus_doc")
        .select("batch_doc", "corpus_doc", agree.cast("int").alias("n_common"))
        .filter(F.col("n_common") >= min_agree)
        # materialize NOW: the lazy plan reads the current store
        # generation, which the publish below renames out from under it
        .localCheckpoint(eager=True)
    )
    gone = batch_sig.select(F.col(id_col))
    if deleted_ids is not None:
        gone = gone.unionByName(deleted_ids.select(F.col(id_col)))
    next_store = store.join(gone, id_col, "left_anti").unionByName(batch_sig)
    if deleted_ids is not None:
        next_store = next_store.join(
            deleted_ids.select(F.col(id_col)), id_col, "left_anti"
        )
    write_table(next_store, dest_dir, SIGNATURE_TABLE)
    swap_staging(dest_dir, [SIGNATURE_TABLE], spark=spark)
    return pairs


def stream_ingest(
    spark: SparkSession,
    src_dir: str,
    checkpoint_dir: str,
    dest_dir: str,
    min_agree: int = 8,
    pairs_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Continuous dedup as a stream (the delta_sync pattern): drain a
    directory of spooled document-batch parquet files; every
    micro-batch runs ``ingest_batch`` — twins against the stored
    corpus, one atomic store generation per batch — and appends the
    twin pairs to ``pairs_dir`` (the curation pipeline's drop list).
    Restart-safe END TO END: the streaming checkpoint remembers which
    batch files were applied; a replayed batch re-merges into the
    store idempotently (same ids replace the same rows) AND
    re-overwrites its own ``batch_id=N`` pairs partition, so a crash
    between the store swap and the checkpoint commit cannot duplicate
    twin rows in ``pairs_dir``.  ``maxFilesPerTrigger=1`` makes each
    spooled file one generation — how the test replays a
    multi-generation history deterministically.

    UPGRADE NOTE (layout change, round 7): ``pairs_dir`` switched from
    a flat append layout to ``pairs_dir/batch_id=N/`` partitions.
    Readers now see an extra ``batch_id`` provenance column from
    partition discovery (``.drop("batch_id")`` to get the old shape),
    and any pre-existing FLAT pairs files from an earlier deployment
    must be migrated into a ``batch_id=-1`` subdirectory (or cleared
    with the checkpoint) before resuming — mixed flat + partitioned
    layouts under one root fail partition discovery."""
    schema = spark.read.parquet(src_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.parquet(src_dir)

    def handle(batch_df: DataFrame, _batch_id: int) -> None:
        pairs = ingest_batch(
            spark,
            dest_dir,
            batch_df,
            min_agree=min_agree,
            id_col=id_col,
            text_col=text_col,
        )
        if pairs_dir is not None:
            # Keyed by batch id and OVERWRITTEN on replay: a crash
            # between the store swap and the checkpoint commit replays
            # this batch, and mode="append" on the flat dir would spool
            # the same twin pairs twice.  Partition-style layout keeps
            # spark.read.parquet(pairs_dir) working (plus a batch_id
            # provenance column from partition discovery).
            pairs.write.mode("overwrite").parquet(
                f"{pairs_dir}/batch_id={_batch_id}"
            )

    (
        raw.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(handle)
        .start()
        .awaitTermination()
    )
