"""Graph -> relational golden rows (reference tests/sql_test.py:70-128)
and the E2E view registration + SQL query path
(reference tests/collect_plugins_test.py:82-96)."""

from __future__ import annotations

from resotodatalink_spark.operators.flatten import (
    flatten_nodes,
    link_tables,
    sync_views,
)
from resotodatalink_spark.sources.graph import GraphSource
from tests.fixtures import example_docs, example_model


def test_flatten_golden_rows(spark):
    model = example_model()
    src = GraphSource.from_docs(spark, example_docs())
    inst = flatten_nodes(src.nodes, model, model.kinds["some_instance"])
    rows = [tuple(r) for r in inst.collect()]
    assert rows == [
        (
            "i-123",
            4,
            8,
            "i-123",
            "in1",
            "t1",
            "h1",
            "some_cloud",
            "some_account",
            "some_region",
            "some_zone",
        )
    ]
    vol = flatten_nodes(src.nodes, model, model.kinds["some_volume"])
    assert [tuple(r) for r in vol.collect()] == [
        (
            "v-123",
            12,
            "v-123",
            "vol1",
            "t1",
            "h1",
            "some_cloud",
            "some_account",
            "some_region",
            "some_zone",
        )
    ]


def test_null_fill_for_missing_props(spark):
    model = example_model()
    docs = [
        {
            "type": "node",
            "id": "v-9",
            "reported": {"kind": "some_volume", "id": "v-9"},
            "ancestors": {},
        }
    ]
    src = GraphSource.from_docs(spark, docs)
    row = flatten_nodes(src.nodes, model, model.kinds["some_volume"]).collect()[0]
    assert row["_id"] == "v-9" and row["id"] == "v-9"
    assert row["capacity"] is None and row["name"] is None and row["cloud"] is None


def test_link_tables(spark):
    src = GraphSource.from_docs(spark, example_docs())
    links = link_tables(src)
    assert set(links) == {("some_instance", "some_volume")}
    assert [tuple(r) for r in links[("some_instance", "some_volume")].collect()] == [
        ("i-123", "v-123")
    ]


def test_non_default_edges_dropped(spark):
    docs = example_docs() + [
        {"type": "edge", "from": "v-123", "to": "i-123", "edge_type": "delete"}
    ]
    src = GraphSource.from_docs(spark, docs)
    links = link_tables(src)
    assert set(links) == {("some_instance", "some_volume")}


def test_sync_views_and_sql(spark):
    """The golden SQL query shape from collect_plugins_test.py:87-96."""
    model = example_model()
    src = GraphSource.from_docs(spark, example_docs())
    views = sync_views(spark, src, model)
    assert set(views) == {
        "some_instance",
        "some_volume",
        "link_some_instance_some_volume",
    }
    got = spark.sql(
        "select id, cores, memory from some_instance order by id"
    ).collect()
    assert [r.asDict() for r in got] == [{"id": "i-123", "cores": 4, "memory": 8}]
    joined = spark.sql(
        """
        select i.id as instance_id, v.id as volume_id
        from some_instance i
        join link_some_instance_some_volume l on i._id = l.from_id
        join some_volume v on l.to_id = v._id
        """
    ).collect()
    assert [tuple(r) for r in joined] == [("i-123", "v-123")]


def test_flatten_complex_kinds(spark):
    """Arrays, maps, JSON-blob (any) and nested struct kinds flow
    through the compiler + from_json parse (reference type_converter
    micro-syntax, arrow path)."""
    from resotodatalink_spark.model.kinds import Kind, Model, Property

    model = Model(
        {
            "string": Kind("string"),
            "int64": Kind("int64"),
            "endpoint": Kind(
                "endpoint",
                properties=[
                    Property("host", "string"),
                    Property("port", "int64"),
                ],
            ),
            "service": Kind(
                "service",
                properties=[
                    Property("id", "string"),
                    Property("tags", "string[]"),
                    Property("limits", "dictionary[string, int64]"),
                    Property("raw", "any"),
                    Property("endpoint", "endpoint"),
                ],
                bases=[],
                aggregate_root=True,
            ),
        }
    )
    docs = [
        {
            "type": "node",
            "id": "svc-1",
            "reported": {
                "kind": "service",
                "id": "svc-1",
                "tags": ["a", "b"],
                "limits": {"cpu": 4, "mem": 2048},
                "raw": {"nested": [1, 2]},
                "endpoint": {"host": "h1", "port": 443},
            },
            "ancestors": {"cloud": {"reported": {"id": "c1"}}},
        }
    ]
    src = GraphSource.from_docs(spark, docs)
    row = flatten_nodes(src.nodes, model, model.kinds["service"]).collect()[0]
    assert row["tags"] == ["a", "b"]
    assert row["limits"] == {"cpu": 4, "mem": 2048}
    assert row["raw"] == '{"nested":[1,2]}'  # any -> JSON text
    assert row["endpoint"]["host"] == "h1" and row["endpoint"]["port"] == 443
    assert row["cloud"] == "c1"
