"""Test fixtures replicating the reference's (FIXTURES.md §1-2;
reference tests/conftest.py:23-64 and tests/sql_test.py:71-107)."""

from __future__ import annotations

from resotodatalink_spark.model.kinds import Kind, Model, Property


def example_model() -> Model:
    kinds = [
        Kind("string", runtime_kind=None),
        Kind("int32", runtime_kind=None),
        Kind("int64", runtime_kind=None),
        Kind("float", runtime_kind=None),
        Kind("double", runtime_kind=None),
        Kind("boolean", runtime_kind=None),
        Kind(
            "resource",
            properties=[
                Property("id", "string"),
                Property("name", "string", metadata={"len": 34}),
                Property("alias", "string"),
                Property("description", "string", metadata={"len": 1500}),
            ],
            bases=[],
            aggregate_root=True,
        ),
        Kind(
            "some_instance",
            properties=[
                Property("cores", "int32"),
                Property("memory", "int64"),
            ],
            bases=["resource"],
            aggregate_root=True,
            successor_kinds={"default": ["some_volume"]},
        ),
        Kind(
            "some_volume",
            properties=[Property("capacity", "int32")],
            bases=["resource"],
            aggregate_root=True,
        ),
    ]
    return Model({k.fqn: k for k in kinds})


def carz_ancestors() -> dict:
    return {
        "cloud": {"reported": {"id": "some_cloud"}},
        "account": {"reported": {"id": "some_account"}},
        "region": {"reported": {"id": "some_region"}},
        "zone": {"reported": {"id": "some_zone"}},
    }


def example_docs() -> list[dict]:
    """The node/edge docs from reference sql_test.py:71-107."""
    return [
        {
            "type": "node",
            "id": "i-123",
            "reported": {
                "kind": "some_instance",
                "id": "i-123",
                "name": "in1",
                "alias": "t1",
                "description": "h1",
                "cores": 4,
                "memory": 8,
            },
            "ancestors": carz_ancestors(),
        },
        {
            "type": "node",
            "id": "v-123",
            "reported": {
                "kind": "some_volume",
                "id": "v-123",
                "name": "vol1",
                "alias": "t1",
                "description": "h1",
                "capacity": 12,
            },
            "ancestors": carz_ancestors(),
        },
        {"type": "edge", "from": "i-123", "to": "v-123", "edge_type": "default"},
    ]


def example_collector_model() -> Model:
    """The example-collector's kind set (reference
    collect_plugins_test.py:27-46: 7 kind tables incl. one with zero
    instances, 7 link tables)."""
    kinds = [
        Kind("string", runtime_kind=None),
        Kind("int32", runtime_kind=None),
        Kind("int64", runtime_kind=None),
        Kind(
            "resource",
            properties=[Property("id", "string"), Property("name", "string")],
            bases=[],
            aggregate_root=True,
        ),
        Kind("example_account", properties=[], bases=["resource"], aggregate_root=True),
        Kind("example_region", properties=[], bases=["resource"], aggregate_root=True),
        Kind(
            "example_instance",
            properties=[
                Property("instance_cores", "int32"),
                Property("instance_memory", "int64"),
            ],
            bases=["resource"],
            aggregate_root=True,
        ),
        Kind("example_network", properties=[], bases=["resource"], aggregate_root=True),
        Kind(
            "example_volume",
            properties=[Property("volume_size", "int32")],
            bases=["resource"],
            aggregate_root=True,
        ),
        Kind(
            "example_custom_resource",
            properties=[],
            bases=["resource"],
            aggregate_root=True,
        ),
        Kind(
            "resource_short_property_access",
            properties=[Property("short", "string")],
            bases=["resource"],
            aggregate_root=True,
        ),
    ]
    return Model({k.fqn: k for k in kinds})


def example_collector_docs() -> list[dict]:
    """Node/edge docs shaped like the example collector's graph: 1
    account, 2 regions, 2 instances, 2 networks, 2 volumes, 1 custom
    resource, and the 7 edge pairs of collect_plugins_test.py:27-46."""

    def node(nid: str, kind: str, **props) -> dict:
        return {
            "type": "node",
            "id": nid,
            "reported": {"kind": kind, "id": nid, "name": f"name-{nid}", **props},
            "ancestors": carz_ancestors(),
        }

    def edge(a: str, b: str) -> dict:
        return {"type": "edge", "from": a, "to": b, "edge_type": "default"}

    return [
        node("acc-1", "example_account"),
        node("reg-1", "example_region"),
        node("reg-2", "example_region"),
        node("i-1", "example_instance", instance_cores=2, instance_memory=4),
        node("i-2", "example_instance", instance_cores=4, instance_memory=8),
        node("net-1", "example_network"),
        node("net-2", "example_network"),
        node("vol-1", "example_volume", volume_size=50),
        node("vol-2", "example_volume", volume_size=100),
        node("cr-1", "example_custom_resource"),
        edge("acc-1", "reg-1"),
        edge("acc-1", "reg-2"),
        edge("reg-1", "i-1"),
        edge("reg-2", "i-2"),
        edge("reg-1", "net-1"),
        edge("reg-2", "net-2"),
        edge("reg-1", "vol-1"),
        edge("reg-2", "vol-2"),
        edge("reg-1", "cr-1"),
        edge("net-1", "i-1"),
        edge("net-2", "i-2"),
        edge("i-1", "vol-1"),
        edge("i-2", "vol-2"),
    ]
