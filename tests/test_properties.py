"""Property-based tests (hypothesis) for the pure-Python load-bearing
components: the search-DSL parser and the kind-model flattening.

The reference DECLARES hypothesis as a test dep but never imports it
(reference pyproject.toml:70; verified repo-wide in SURVEY.md §5) — so
this file goes one step beyond its test strategy: random ASTs rendered
to search text must parse back to the identical AST, and random kind
graphs (including cycles) must flatten under the documented invariants.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from resotodatalink_spark.model.kinds import CARZ, Kind, Model, Property
from resotodatalink_spark.operators.search import (
    BoolOp,
    IsKind,
    NotOp,
    Predicate,
    Search,
    Traversal,
    parse_search,
)

# --- search DSL: render(ast) -> parse -> ast round-trip ---------------------

_WORDS = st.sampled_from(
    ["cores", "memory", "name", "kind", "reported.size", "a.b.c", "capacity"]
)
_KINDS = st.sampled_from(["some_instance", "some_volume", "resource", "aws.ec2"])
_OPS = st.sampled_from(["==", "!=", ">", ">=", "<", "<=", "~"])
_STR_LIT = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789_- ", min_size=0, max_size=12
)
_NUM_LIT = st.one_of(
    st.integers(min_value=-999, max_value=999),
    st.floats(min_value=-99.5, max_value=99.5, allow_nan=False).map(
        lambda f: round(f, 3)
    ),
)


def _lit_to_text(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return f'"{v}"'
    if isinstance(v, float) and v == int(v):
        return f"{v:.1f}"  # keep a dot so it parses back as float
    return str(v)


_predicates = st.builds(
    Predicate,
    path=_WORDS,
    op=_OPS,
    value=st.one_of(_STR_LIT, _NUM_LIT, st.booleans()),
).map(
    # "~" compares as regex: keep the value a string so rendering is
    # unambiguous; booleans only with ==/!=
    lambda p: Predicate(p.path, "==", p.value)
    if isinstance(p.value, bool) and p.op not in ("==", "!=")
    else (Predicate(p.path, p.op, str(p.value)) if p.op == "~" else p)
)

_leaves = st.one_of(st.builds(IsKind, kind=_KINDS), _predicates)


def _filters(depth: int):
    if depth <= 0:
        return _leaves
    sub = _filters(depth - 1)
    return st.one_of(
        _leaves,
        st.builds(NotOp, child=sub),
        st.builds(BoolOp, op=st.sampled_from(["and", "or"]), left=sub, right=sub),
    )


_traversals = st.one_of(
    st.none(),
    st.builds(
        Traversal,
        min_depth=st.integers(min_value=1, max_value=3),
        max_depth=st.integers(min_value=3, max_value=6),
        direction=st.sampled_from(["out", "in"]),
        edge_type=st.one_of(st.none(), st.sampled_from(["delete", "custom_x"])),
    ),
)


def _render_filter(node) -> str:
    if isinstance(node, IsKind):
        return f"is({node.kind})"
    if isinstance(node, Predicate):
        return f"{node.path} {node.op} {_lit_to_text(node.value)}"
    if isinstance(node, NotOp):
        return f"not ({_render_filter(node.child)})"
    if isinstance(node, BoolOp):
        return (
            f"({_render_filter(node.left)}) {node.op} "
            f"({_render_filter(node.right)})"
        )
    raise TypeError(node)


def _render_traversal(t: Traversal) -> str:
    rng = f"[{t.min_depth}:{t.max_depth}]"
    typ = t.edge_type or ""
    if t.direction == "out":
        return f"-{typ}{rng}->"
    return f"<-{typ}{rng}-"


@settings(max_examples=200, deadline=None)
@given(filt=_filters(3), trav=_traversals, limit=st.one_of(st.none(), st.integers(1, 50)))
def test_search_render_parse_roundtrip(filt, trav, limit):
    text = _render_filter(filt)
    if trav is not None:
        text += " " + _render_traversal(trav)
    if limit is not None:
        text += f" limit {limit}"
    got = parse_search(text)
    assert got == Search(filt, trav, None, None, None, limit)


# --- kind model: flattening invariants over random graphs -------------------

_prop_names = st.sampled_from(["id", "name", "size", "kind", "zone", "extra"])


@st.composite
def _models(draw):
    n = draw(st.integers(min_value=1, max_value=6))
    names = [f"k{i}" for i in range(n)]
    kinds = {}
    for i, name in enumerate(names):
        props = [
            Property(
                pn,
                "string",
                synthetic={"path": []} if draw(st.booleans()) and pn == "extra" else None,
            )
            for pn in draw(st.lists(_prop_names, max_size=4, unique=True))
        ]
        # bases may point ANYWHERE, including later kinds and itself —
        # cycles must terminate via the visited set
        bases = draw(st.lists(st.sampled_from(names), max_size=2, unique=True))
        kinds[name] = Kind(
            name, properties=props, bases=bases, aggregate_root=True
        )
    return Model(kinds)


@settings(max_examples=200, deadline=None)
@given(model=_models(), with_id=st.booleans())
def test_kind_properties_invariants(model, with_id):
    for kind in model.kinds.values():
        props, _ = model.kind_properties(kind, with_id=with_id)
        names = [p.name for p in props]
        # carz columns appended exactly at the end, in order — with NO
        # dedup against real props: the reference does
        # `id_prop + prs + carz` (schema_utils.py:63), so a kind owning
        # a real 'zone' property yields a DUPLICATE column there and
        # here alike (bug-for-bug parity, found by this very test)
        assert tuple(names[-4:]) == CARZ
        body_names = names[: len(names) - 4]
        # the flattened body itself is duplicate-free and terminates
        # even on cyclic bases graphs (visited-set protection)
        assert len(body_names) == len(set(body_names))
        # _id leads iff requested
        assert (names[0] == "_id") == with_id
        body = set(body_names) - {"_id"}
        # 'kind' and synthetic props never survive flattening; every
        # eligible own-or-inherited prop does
        own_and_inherited = set()
        seen: set[str] = set()
        stack = [kind.fqn]
        while stack:
            cur = stack.pop()
            if cur in seen:
                continue
            seen.add(cur)
            k = model.kinds.get(cur)
            if k is None:
                continue
            own_and_inherited |= {
                p.name
                for p in (k.properties or [])
                if p.synthetic is None and p.name != "kind"
            }
            stack.extend(k.bases or [])
        assert body == own_and_inherited
