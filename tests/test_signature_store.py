"""Signature-store lifecycle: bootstrap -> ingest -> twins + atomic
generation advance (the continuous-dedup composition of the minhash
operators with the staged-publish sink)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from resotodatalink_spark.operators.dedup import (
    minhash_pairs_with_agreement,
    minhash_signatures,
)
from resotodatalink_spark.operators.signature_store import (
    SIGNATURE_TABLE,
    bootstrap_signature_store,
    ingest_batch,
    read_signature_store,
)

_BASE = "the quick brown fox jumps over the lazy dog again and again today"
_OTHER = "completely different content with no overlap whatsoever in words"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_ingest_finds_corpus_twins_and_advances_store(spark, tmp_path):
    dest = str(tmp_path / "store")
    os.makedirs(dest)
    corpus = _docs(spark, [(1, _BASE), (2, _OTHER), (3, _BASE + " extra")])
    bootstrap_signature_store(corpus, dest)
    assert os.path.isdir(os.path.join(dest, SIGNATURE_TABLE))

    # batch doc 10 is a near-dup of corpus doc 1; doc 11 is novel
    batch = _docs(spark, [(10, _BASE), (11, "entirely novel text here now")])
    pairs = ingest_batch(spark, dest, batch).collect()
    twins = {(r.batch_doc, r.corpus_doc) for r in pairs}
    assert (10, 1) in twins
    assert all(b != 11 for b, _ in twins)

    # pairs must be valid AFTER the store advanced (materialization)
    assert all(r.n_common >= 8 for r in pairs)

    # store now holds corpus + batch signatures, exactly once per id
    store = read_signature_store(spark, dest)
    ids = sorted(r.doc_id for r in store.select("doc_id").collect())
    assert ids == [1, 2, 3, 10, 11]
    # identical recompute: stored rows equal fresh signatures
    fresh = minhash_signatures(
        _docs(
            spark,
            [(1, _BASE), (2, _OTHER), (3, _BASE + " extra"),
             (10, _BASE), (11, "entirely novel text here now")],
        )
    )
    assert sorted(map(tuple, store.collect())) == sorted(
        map(tuple, fresh.collect())
    )
    # no staging or old dirs left behind
    assert sorted(os.listdir(dest)) == [SIGNATURE_TABLE]


def test_recrawl_replaces_and_tombstones_sweep(spark, tmp_path):
    dest = str(tmp_path / "store")
    os.makedirs(dest)
    bootstrap_signature_store(
        _docs(spark, [(1, _BASE), (2, _OTHER), (3, "some third doc text")]), dest
    )
    # doc 1 re-crawled with NEW text; doc 2 tombstoned
    batch = _docs(spark, [(1, "rewritten crawl of doc one content")])
    deleted = spark.createDataFrame([(2,)], "doc_id: long")
    pairs = ingest_batch(spark, dest, batch, deleted_ids=deleted).collect()
    # new text of doc 1 is no near-dup of anything remaining
    assert pairs == []
    store = read_signature_store(spark, dest)
    ids = sorted(r.doc_id for r in store.select("doc_id").collect())
    assert ids == [1, 3]
    # doc 1's stored signature matches its NEW text, not the old one
    new_sig = minhash_signatures(batch).collect()[0]
    stored = store.filter(F.col("doc_id") == 1).collect()[0]
    assert tuple(stored) == tuple(new_sig)


def test_batch_vs_store_equals_full_cross_check(spark, tmp_path):
    """The store path must find exactly the pairs a full recompute
    finds between the same batch/corpus split (>= 8/16 agreement)."""
    dest = str(tmp_path / "store")
    os.makedirs(dest)
    rows = [(i, f"{_BASE} variant {i % 3}") for i in range(20)]
    corpus_rows = [r for r in rows if r[0] % 4 != 0]
    batch_rows = [r for r in rows if r[0] % 4 == 0]
    bootstrap_signature_store(_docs(spark, corpus_rows), dest)
    got = {
        (r.batch_doc, r.corpus_doc, r.n_common)
        for r in ingest_batch(spark, dest, _docs(spark, batch_rows)).collect()
    }
    full = minhash_pairs_with_agreement(_docs(spark, rows))
    want = {
        (r.doc_a, r.doc_b, r.n_common)
        for r in full.collect()
        if r.doc_a % 4 == 0 and r.doc_b % 4 != 0 and r.n_common >= 8
    } | {
        (r.doc_b, r.doc_a, r.n_common)
        for r in full.collect()
        if r.doc_b % 4 == 0 and r.doc_a % 4 != 0 and r.n_common >= 8
    }
    assert got == want
    assert want, "fixture must actually contain cross twins"


def test_stream_ingest_multi_generation(spark, tmp_path):
    """Replay a 2-batch history through the streaming wrapper: one
    store generation per spooled file, twins accumulated in pairs_dir,
    final store identical to signing the full corpus."""
    from resotodatalink_spark.operators.signature_store import stream_ingest

    dest = str(tmp_path / "store")
    os.makedirs(dest)
    bootstrap_signature_store(_docs(spark, [(1, _BASE), (2, _OTHER)]), dest)

    src = str(tmp_path / "src")
    # two spooled batch files: batch A brings a twin of doc 1 (id 10),
    # batch B brings a twin of batch A's doc (id 20 ~ 10)
    _docs(spark, [(10, _BASE + " tail")]).coalesce(1).write.parquet(
        src, mode="append"
    )
    _docs(spark, [(20, _BASE + " tail")]).coalesce(1).write.parquet(
        src, mode="append"
    )
    pairs_dir = str(tmp_path / "pairs")
    stream_ingest(
        spark,
        src,
        str(tmp_path / "cp"),
        dest,
        pairs_dir=pairs_dir,
        max_files_per_trigger=1,
    )
    store = read_signature_store(spark, dest)
    assert sorted(r.doc_id for r in store.select("doc_id").collect()) == [
        1, 2, 10, 20,
    ]
    got = {
        (r.batch_doc, r.corpus_doc)
        for r in spark.read.parquet(pairs_dir).collect()
    }
    # each generation saw the store AS OF its batch: 10 paired with 1;
    # 20 paired with both 1 and the already-ingested 10
    assert (10, 1) in got and (20, 10) in got and (20, 1) in got
    fresh = minhash_signatures(
        _docs(spark, [(1, _BASE), (2, _OTHER),
                      (10, _BASE + " tail"), (20, _BASE + " tail")])
    )
    assert sorted(map(tuple, store.collect())) == sorted(
        map(tuple, fresh.collect())
    )


def test_ingest_batch_with_duplicate_ids_keeps_store_unique(spark, tmp_path):
    """A batch that spools the same doc_id twice (re-crawl within the
    batch) must still leave exactly one signature row per id — the
    round-6 advice found the anti-join/union merge would otherwise
    append both rows and corrupt every later generation."""
    dest = str(tmp_path / "store")
    os.makedirs(dest)
    bootstrap_signature_store(_docs(spark, [(1, _BASE)]), dest)

    batch = _docs(spark, [(10, _BASE + " tail"), (10, _BASE + " tail"), (11, _OTHER)])
    ingest_batch(spark, dest, batch)
    store = read_signature_store(spark, dest)
    ids = [r.doc_id for r in store.select("doc_id").collect()]
    assert sorted(ids) == [1, 10, 11]

    # and a SECOND generation over the deduped store stays clean
    ingest_batch(spark, dest, _docs(spark, [(10, _BASE + " tail two")]))
    store = read_signature_store(spark, dest)
    ids = [r.doc_id for r in store.select("doc_id").collect()]
    assert sorted(ids) == [1, 10, 11]
