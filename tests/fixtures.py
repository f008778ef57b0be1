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
