"""Streaming incremental sync: a spooled multi-generation delta
history replayed chunk-by-chunk (maxFilesPerTrigger=1), landing on the
same exact goldens as the batch sync_delta path — and restart-safe via
the streaming checkpoint (a second drain applies nothing twice)."""

from __future__ import annotations

import pytest

import json
import os

from resotodatalink_spark.operators.sync import collect_to_files
from resotodatalink_spark.sinks.files import read_table
from resotodatalink_spark.sources.graph import GraphSource
from resotodatalink_spark.streaming.delta_sync import stream_delta_sync
from tests.fixtures import carz_ancestors, example_docs, example_model

CARZ = ("some_cloud", "some_account", "some_region", "some_zone")


def _rows(spark, dest, name):
    return sorted(tuple(r) for r in read_table(spark, dest, name).collect())


def _write_chunk(spool: str, seq: int, docs: list[dict]) -> None:
    with open(os.path.join(spool, f"delta-{seq:04d}.ndjson"), "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")


@pytest.mark.slow  # r13 verdict item 2: long sweep, full tier only
def test_streamed_generations_match_batch_goldens(spark, tmp_path):
    dest = str(tmp_path / "tables")
    spool = str(tmp_path / "spool")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(dest)
    os.makedirs(spool)
    collect_to_files(
        spark, GraphSource.from_docs(spark, example_docs()),
        example_model(), dest,
    )

    # generation 2: instance cores 4 -> 8, new volume v-456 replaces
    # v-123 as i-123's outbound target, v-123 deleted
    _write_chunk(spool, 1, [
        {
            "type": "node", "id": "i-123",
            "reported": {"kind": "some_instance", "id": "i-123",
                         "name": "in1", "alias": "t1", "description": "h1",
                         "cores": 8, "memory": 8},
            "ancestors": carz_ancestors(),
        },
        {
            "type": "node", "id": "v-456",
            "reported": {"kind": "some_volume", "id": "v-456",
                         "name": "vol2", "alias": "t2", "description": "h2",
                         "capacity": 20},
            "ancestors": carz_ancestors(),
        },
        {"type": "edge", "from": "i-123", "to": "v-456",
         "edge_type": "default"},
        {"type": "deleted", "id": "v-123"},
    ])
    # generation 3: v-456 grows; a tombstone for an id that never
    # existed must be a harmless no-op
    _write_chunk(spool, 2, [
        {
            "type": "node", "id": "v-456",
            "reported": {"kind": "some_volume", "id": "v-456",
                         "name": "vol2", "alias": "t2", "description": "h2",
                         "capacity": 21},
            "ancestors": carz_ancestors(),
        },
        {"type": "deleted", "id": "ghost-1"},
    ])

    stream_delta_sync(
        spark, spool, ckpt, example_model(), dest, max_files_per_trigger=1
    )

    assert _rows(spark, dest, "some_instance") == [
        ("i-123", 8, 8, "i-123", "in1", "t1", "h1", *CARZ)
    ]
    assert _rows(spark, dest, "some_volume") == [
        ("v-456", 21, "v-456", "vol2", "t2", "h2", *CARZ)
    ]
    assert _rows(spark, dest, "link_some_instance_some_volume") == [
        ("i-123", "v-456")
    ]

    # restart safety: a fresh drain over the same spool + checkpoint
    # must apply nothing (no duplicate generations)
    stream_delta_sync(
        spark, spool, ckpt, example_model(), dest, max_files_per_trigger=1
    )
    assert _rows(spark, dest, "some_volume") == [
        ("v-456", 21, "v-456", "vol2", "t2", "h2", *CARZ)
    ]

    # a NEW chunk after the restart is picked up where the stream left off
    _write_chunk(spool, 3, [{"type": "deleted", "id": "v-456"}])
    stream_delta_sync(
        spark, spool, ckpt, example_model(), dest, max_files_per_trigger=1
    )
    assert _rows(spark, dest, "some_volume") == []
    assert _rows(spark, dest, "link_some_instance_some_volume") == []
