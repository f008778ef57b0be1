"""Graph-search DSL: parser units + end-to-end execution over the
example graph (the surface the reference delegates to resotocore,
remote_graph.py:30-32, 49-63)."""

from __future__ import annotations

import pytest

from resotodatalink_spark.operators.search import (
    BoolOp,
    IsKind,
    Predicate,
    Traversal,
    execute_search,
    parse_search,
)
from resotodatalink_spark.sources.graph import GraphSource
from tests.fixtures import example_docs, example_model


def test_parse_shapes():
    s = parse_search("is(some_instance)")
    assert s.filter == IsKind("some_instance") and s.traversal is None

    s = parse_search('is(resource) and cores > 2 -[1:3]->')
    assert isinstance(s.filter, BoolOp) and s.filter.op == "and"
    assert s.filter.right == Predicate("cores", ">", 2)
    assert s.traversal == Traversal(1, 3, "out")

    s = parse_search('name == "in1" or (cores >= 4 and memory < 16)')
    assert isinstance(s.filter, BoolOp)

    s = parse_search("is(graph_root) -[2:]->")
    assert s.traversal.min_depth == 2 and s.traversal.max_depth >= 2

    # inbound range + edge-typed arrows
    s = parse_search("is(some_volume) <-[1:2]-")
    assert s.traversal == Traversal(1, 2, "in")
    s = parse_search("is(some_volume) <-[2:]-")
    assert s.traversal.min_depth == 2 and s.traversal.direction == "in"
    s = parse_search("is(some_instance) -delete->")
    assert s.traversal == Traversal(1, 1, "out", "delete")
    s = parse_search("is(some_volume) <-delete-")
    assert s.traversal == Traversal(1, 1, "in", "delete")
    s = parse_search("is(some_instance) -delete[1:3]->")
    assert s.traversal == Traversal(1, 3, "out", "delete")
    s = parse_search("is(some_volume) <-custom_type[2:4]-")
    assert s.traversal == Traversal(2, 4, "in", "custom_type")

    with pytest.raises(ValueError):
        parse_search("cores >")
    with pytest.raises(ValueError):
        parse_search("is(x) nonsense extra")


@pytest.fixture()
def graph(spark):
    return GraphSource.from_docs(spark, example_docs()), example_model()


def test_is_kind_includes_subclasses(spark, graph):
    src, model = graph
    # both some_instance and some_volume derive from resource
    got = {r["id"] for r in execute_search(src, model, "is(resource)").collect()}
    assert got == {"i-123", "v-123"}
    got = {r["id"] for r in execute_search(src, model, "is(some_volume)").collect()}
    assert got == {"v-123"}


def test_predicates(spark, graph):
    src, model = graph
    got = {r["id"] for r in execute_search(src, model, "cores > 2").collect()}
    assert got == {"i-123"}
    got = {
        r["id"] for r in execute_search(src, model, 'name == "vol1"').collect()
    }
    assert got == {"v-123"}
    got = {r["id"] for r in execute_search(src, model, 'name ~ "^v"').collect()}
    assert got == {"v-123"}
    got = {
        r["id"]
        for r in execute_search(
            src, model, "is(some_instance) and cores > 100"
        ).collect()
    }
    assert got == set()


def test_traversal(spark, graph):
    src, model = graph
    got = {
        r["id"]
        for r in execute_search(src, model, "is(some_instance) -->").collect()
    }
    assert got == {"v-123"}
    # inbound: who points at volumes
    got = {
        r["id"]
        for r in execute_search(src, model, "is(some_volume) <--").collect()
    }
    assert got == {"i-123"}
    # depth 2 from instances: nothing two hops out
    got = {
        r["id"]
        for r in execute_search(src, model, "is(some_instance) -[2:]->").collect()
    }
    assert got == set()
    # zero min depth includes the matched nodes themselves
    got = {
        r["id"]
        for r in execute_search(src, model, "is(some_instance) -[0:2]->").collect()
    }
    assert got == {"i-123", "v-123"}
    # ... exactly once, even when a matched node is also reachable
    rows = execute_search(src, model, "is(resource) -[0:1]->").collect()
    assert sorted(r["id"] for r in rows) == ["i-123", "v-123"]


def test_traversal_edge_types_and_inbound_range(spark):
    """delete-typed edges are invisible to untyped arrows and vice
    versa; <-[1:2]- walks the reversed graph through the depth range."""
    docs = example_docs()
    # a second volume linked from the instance by a delete-typed edge
    v2 = dict(docs[1], id="v-999")
    v2["reported"] = dict(docs[1]["reported"], id="v-999", name="vol9")
    docs = docs + [v2, {"type": "edge", "from": "i-123", "to": "v-999",
                        "edge_type": "delete"}]
    src = GraphSource.from_docs(spark, docs)
    model = example_model()

    got = {r["id"] for r in execute_search(src, model, "is(some_instance) -->").collect()}
    assert got == {"v-123"}  # delete edge not walked by the default arrow
    got = {r["id"] for r in execute_search(src, model, "is(some_instance) -delete->").collect()}
    assert got == {"v-999"}
    got = {r["id"] for r in execute_search(src, model, "is(some_volume) <-delete-").collect()}
    assert got == {"i-123"}
    # inbound range: volumes' ancestors within 2 hops = just the instance
    got = {r["id"] for r in execute_search(src, model, "is(some_volume) <-[1:2]-").collect()}
    assert got == {"i-123"}


def test_in_and_not(spark, graph):
    src, model = graph
    got = {
        r["id"]
        for r in execute_search(src, model, 'name in ["in1", "nope"]').collect()
    }
    assert got == {"i-123"}
    got = {
        r["id"] for r in execute_search(src, model, "cores in [4, 8]").collect()
    }
    assert got == {"i-123"}
    got = {
        r["id"]
        for r in execute_search(
            src, model, 'is(resource) and not name == "in1"'
        ).collect()
    }
    assert got == {"v-123"}
    s = parse_search("not (cores > 2 or capacity > 2)")
    from resotodatalink_spark.operators.search import NotOp

    assert isinstance(s.filter, NotOp)


def test_search_aggregate_clause(spark):
    from resotodatalink_spark.operators.search import execute_search
    from resotodatalink_spark.sources.graph import GraphSource
    from tests.fixtures import example_docs, example_model

    src = GraphSource.from_docs(spark, example_docs())
    rows = execute_search(
        src, example_model(),
        "aggregate(kind: sum(1) as n, min(cores) as min_cores): is(resource)",
    ).collect()
    got = {r["kind"]: (r["n"], r["min_cores"]) for r in rows}
    assert got == {"some_instance": (1, 4.0), "some_volume": (1, None)}


def test_search_with_empty_and_any(spark):
    from resotodatalink_spark.operators.search import execute_search
    from resotodatalink_spark.sources.graph import GraphSource
    from tests.fixtures import example_docs, example_model

    src = GraphSource.from_docs(spark, example_docs())
    model = example_model()
    no_vol = execute_search(
        src, model, "is(resource) with(empty, --> is(some_volume))"
    ).collect()
    assert {r["id"] for r in no_vol} == {"v-123"}
    has_vol = execute_search(
        src, model, "is(resource) with(any, --> is(some_volume))"
    ).collect()
    assert {r["id"] for r in has_vol} == {"i-123"}


def test_search_with_inbound_and_typed_arrows(spark):
    from resotodatalink_spark.operators.search import execute_search
    from resotodatalink_spark.sources.graph import GraphSource
    from tests.fixtures import example_docs, example_model

    docs = example_docs() + [
        {"type": "edge", "from": "v-123", "to": "i-123", "edge_type": "delete"}
    ]
    src = GraphSource.from_docs(spark, docs)
    model = example_model()
    # inbound: nodes with at least one predecessor instance
    got = execute_search(
        src, model, "is(resource) with(any, <-- is(some_instance))"
    ).collect()
    assert {r["id"] for r in got} == {"v-123"}
    # typed: only the delete edge satisfies -delete->
    got = execute_search(
        src, model, "is(resource) with(any, -delete-> is(some_instance))"
    ).collect()
    assert {r["id"] for r in got} == {"v-123"}
    got = execute_search(
        src, model, "is(resource) with(empty, -delete->)"
    ).collect()
    assert {r["id"] for r in got} == {"i-123"}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        parse_search("is(resource) with(any, -[1:2]->)")


def test_parse_fulltext_and_nested_with():
    from resotodatalink_spark.operators.search import Fulltext, WithClause

    s = parse_search('"some term" and is(resource)')
    assert isinstance(s.filter, BoolOp)
    assert s.filter.left == Fulltext("some term")

    s = parse_search(
        'is(resource) with(empty, --> with(any, -delete-> cores > 2))'
    )
    w = s.with_clause
    assert isinstance(w, WithClause) and w.mode == "empty" and w.filter is None
    assert w.nested is not None and w.nested.mode == "any"
    assert w.nested.edge_type == "delete"
    assert w.nested.filter == Predicate("cores", ">", 2)
    # a filter AND a nested with on the same level
    s = parse_search(
        'is(resource) with(any, --> is(some_volume) with(empty, -->))'
    )
    assert s.with_clause.filter == IsKind("some_volume")
    assert s.with_clause.nested.mode == "empty"


def test_fulltext_whole_token_match(spark, graph):
    src, model = graph
    # matches the instance doc ({"name":"in1",...}), case-insensitive
    got = {r["id"] for r in execute_search(src, model, '"IN1"').collect()}
    assert got == {"i-123"}
    # whole-token: "in" alone must not match "in1"
    got = {r["id"] for r in execute_search(src, model, '"in"').collect()}
    assert got == set()
    # spans kinds and composes with bool ops
    got = {
        r["id"]
        for r in execute_search(src, model, '"in1" or "vol1"').collect()
    }
    assert got == {"i-123", "v-123"}
    # regex-special characters in the term are literal (re.escape)
    got = {r["id"] for r in execute_search(src, model, '"i.1"').collect()}
    assert got == set()  # '.' must NOT wildcard-match 'in1'


def test_nested_with_execution(spark):
    """instance -> volume -> (delete) snapshot chain: nested with()
    selects by the neighbor's OWN neighbors."""
    docs = example_docs()
    snap = dict(docs[1], id="s-1")
    snap["reported"] = dict(docs[1]["reported"], id="s-1", name="snap1")
    docs = docs + [
        snap,
        {"type": "edge", "from": "v-123", "to": "s-1", "edge_type": "delete"},
    ]
    src = GraphSource.from_docs(spark, docs)
    model = example_model()
    # instances with a volume that HAS a delete-successor
    got = execute_search(
        src, model,
        'is(some_instance) with(any, --> is(some_volume) '
        'with(any, -delete->))',
    ).collect()
    assert {r["id"] for r in got} == {"i-123"}
    # instances with a volume that has NO delete-successor: none
    got = execute_search(
        src, model,
        'is(some_instance) with(any, --> is(some_volume) '
        'with(empty, -delete->))',
    ).collect()
    assert {r["id"] for r in got} == set()


def test_parse_function_predicates():
    from resotodatalink_spark.operators.search import FnPredicate

    s = parse_search('in_subnet(ip, "10.0.0.0/8")')
    assert s.filter == FnPredicate("in_subnet", "ip", ["10.0.0.0/8"])
    s = parse_search('is(resource) and has_key(tags, "env", "owner")')
    assert s.filter.right == FnPredicate("has_key", "tags", ["env", "owner"])
    with pytest.raises(ValueError):
        parse_search("in_subnet(ip)")  # missing the CIDR argument
    with pytest.raises(ValueError):
        parse_search('in_subnet(ip, 17)')  # non-string argument


def test_fn_predicates_execution(spark):
    docs = []
    for i, (ip, tags) in enumerate([
        ("10.1.2.3", {"env": "prod", "owner": "a"}),
        ("10.130.0.9", {"env": "dev"}),
        ("192.168.0.1", {}),
        ("not-an-ip", None),
    ]):
        reported = {"kind": "some_volume", "id": f"n-{i}", "name": f"n{i}",
                    "alias": "x", "description": "d", "capacity": 1,
                    "ip": ip}
        if tags is not None:
            reported["tags"] = tags
        docs.append({"type": "node", "id": f"n-{i}", "reported": reported,
                     "ancestors": None})
    src = GraphSource.from_docs(spark, docs)
    model = example_model()
    got = {r["id"] for r in execute_search(
        src, model, 'in_subnet(ip, "10.0.0.0/9")').collect()}
    assert got == {"n-0"}  # /9 covers 10.0-127.*; 10.130 is outside
    got = {r["id"] for r in execute_search(
        src, model, 'in_subnet(ip, "10.0.0.0/8")').collect()}
    assert got == {"n-0", "n-1"}  # malformed ip never matches
    got = {r["id"] for r in execute_search(
        src, model, 'has_key(tags, "env")').collect()}
    assert got == {"n-0", "n-1"}
    got = {r["id"] for r in execute_search(
        src, model, 'has_key(tags, "env", "owner")').collect()}
    assert got == {"n-0"}


def test_in_subnet_matches_ipaddress_ground_truth(spark):
    """The shift-arithmetic CIDR test must agree with the stdlib
    ipaddress module over a structured grid of addresses (boundary
    octets, prefix edges 0/1/8/22/32) plus malformed strings."""
    import ipaddress
    import json as _json

    octets = [0, 1, 63, 64, 127, 128, 192, 255]
    ips = [f"{a}.{b}.{c}.{d}"
           for a in octets[:4] for b in octets for c in octets[:4]
           for d in (0, 255)]
    ips += ["10.64.0.0", "10.63.255.255", "not-an-ip", "1.2.3", "1.2.3.4.5",
            # out-of-range octets must NEVER match: pre-fix, 10.0.300.1
            # aliased 300 into higher bits and falsely matched
            # 10.0.0.0/8 (round-5 advisor finding)
            "256.1.1.1", "10.0.300.1", "10.0.0.999", "01.2.3.4x"]
    cidrs = ["0.0.0.0/0", "10.0.0.0/8", "128.0.0.0/1",
             "63.128.64.0/22", "127.255.0.255/32"]
    docs = [
        {"type": "node", "id": f"n-{i}",
         "reported": {"kind": "some_volume", "id": f"n-{i}", "name": "n",
                      "alias": "a", "description": "d", "capacity": 1,
                      "ip": ip},
         "ancestors": None}
        for i, ip in enumerate(ips)
    ]
    src = GraphSource.from_docs(spark, docs)
    model = example_model()

    def truth(ip: str, cidr: str) -> bool:
        try:
            addr = ipaddress.IPv4Address(ip)
        except ipaddress.AddressValueError:
            return False
        return addr in ipaddress.IPv4Network(cidr, strict=False)

    for cidr in cidrs:
        got = {
            _json.loads(r["reported"])["ip"]
            for r in execute_search(
                src, model, f'in_subnet(ip, "{cidr}")'
            ).collect()
        }
        expected = {ip for ip in ips if truth(ip, cidr)}
        assert got == expected, f"cidr={cidr}: {got ^ expected}"


def test_search_sort_limit(spark):
    from resotodatalink_spark.operators.search import execute_search
    from resotodatalink_spark.sources.graph import GraphSource
    from tests.fixtures import example_docs, example_model

    src = GraphSource.from_docs(spark, example_docs())
    rows = execute_search(
        src, example_model(), "is(resource) sort name desc limit 1"
    ).collect()
    assert [r["id"] for r in rows] == ["v-123"]


def test_duration_literal_parsing():
    from resotodatalink_spark.operators.search import _duration_offset

    assert _duration_offset("-3d") == -3 * 86400
    assert _duration_offset("2h") == 2 * 3600
    assert _duration_offset("-15min") == -900
    assert _duration_offset("1w") == 604800
    assert _duration_offset("45s") == 45
    assert _duration_offset("3dx") is None
    assert _duration_offset("prod") is None  # plain strings unaffected
    assert _duration_offset(3) is None


def test_duration_literal_gated_on_property_kind(spark):
    """Round-7 advisor finding: a duration-shaped literal on a
    STRING-kinded property must compare as a plain string (the
    reference coerces durations only for datetime-kinded properties),
    and ``~`` operands are always regexes, never durations."""
    docs = [
        {
            "type": "node",
            "id": f"n-{i}",
            "reported": {
                "kind": "some_volume", "id": f"n-{i}", "name": name,
                "alias": "x", "description": "d", "capacity": 1,
            },
            "ancestors": None,
        }
        for i, name in enumerate(["45s", "2h", "prod"])
    ]
    src = GraphSource.from_docs(spark, docs)
    model = example_model()
    # name is string-kinded: == "45s" is literal string equality
    got = {r["id"] for r in execute_search(src, model, 'name == "45s"').collect()}
    assert got == {"n-0"}
    # ~ is regex even when the pattern is duration-shaped
    got = {r["id"] for r in execute_search(src, model, 'name ~ "2h"').collect()}
    assert got == {"n-1"}
    # ordering ops on a string-kinded property stay lexicographic
    got = {r["id"] for r in execute_search(src, model, 'name > "45s"').collect()}
    assert got == {"n-2"}  # "prod" > "45s" lexicographically; "2h" < "45s"


def test_time_relative_predicate_execution(spark):
    from datetime import datetime, timezone

    docs = []
    for i, ctime in enumerate(
        ["2023-12-30 12:00:00", "2023-12-25 00:00:00", "2023-10-01 08:30:00"]
    ):
        docs.append(
            {
                "type": "node",
                "id": f"n-{i}",
                "reported": {
                    "kind": "some_volume", "id": f"n-{i}", "name": f"n{i}",
                    "alias": "x", "description": "d", "capacity": 1,
                    "ctime": ctime,
                },
                "ancestors": None,
            }
        )
    src = GraphSource.from_docs(spark, docs)
    model = example_model()
    # ctime must be DECLARED datetime-kinded for the duration literal
    # to reinterpret (the gate added after the round-7 advisor finding;
    # the reference's base resource kind declares ctime: datetime).
    from resotodatalink_spark.model.kinds import Kind, Property

    model.kinds["datetime"] = Kind("datetime")
    model.kinds["some_volume"].properties.append(Property("ctime", "datetime"))
    now = datetime(2024, 1, 1, tzinfo=timezone.utc)
    got = {
        r["id"]
        for r in execute_search(
            src, model, 'ctime > "-3d"', now=now
        ).collect()
    }
    assert got == {"n-0"}
    got = {
        r["id"]
        for r in execute_search(
            src, model, 'ctime < "-1w"', now=now
        ).collect()
    }
    assert got == {"n-2"}
    # pinned now is deterministic: same search twice, same rows
    again = {
        r["id"]
        for r in execute_search(src, model, 'ctime < "-1w"', now=now).collect()
    }
    assert again == got
