"""Graph-search DSL: a subset of the reference's search language,
compiled to DataFrame plans.

The reference sends search strings like ``is(graph_root) -[2:]->`` to
the resotocore server and only consumes the resulting node stream
(remote_graph.py:30-32, 49-63).  Here the search executes natively:

    search := filter ( traversal )?
    filter := term (("and" | "or") term)*
    term   := "is(" kind ")"
            | path op literal          e.g.  cores > 2,  name == "in1"
            | path "in" "[" literal ("," literal)* "]"
            | "not" term
            | "(" filter ")"
    op     := == != > >= < <= ~ (regex match)
    trav   := "-->"  |  "<--"  |  "-[a:b]->"  |  "-[a:]->"

Semantics follow the reference where observable:

* ``is(k)`` matches kind ``k`` AND every kind that (transitively)
  lists it in ``bases`` — the inheritance-aware type filter.
* property paths address the raw ``reported`` JSON (nested paths with
  dots); numeric comparisons cast to double, ``~`` uses regex.
* a trailing traversal returns the nodes reached from the filtered
  set within the depth range (min..max hops, outbound for ``->``),
  implemented with the iterative-join BFS (operators/traversal.py) —
  each hop is one distributed join, no server round-trip.

Scope consciously excludes the reference DSL's aggregates/with()/
sort/limit clauses — those are the relational surface this engine
already exposes via Spark SQL.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from resotodatalink_spark.model.kinds import Model
from resotodatalink_spark.operators.traversal import reachable
from resotodatalink_spark.sources.graph import GraphSource

# --- AST -------------------------------------------------------------------


@dataclass
class IsKind:
    kind: str


@dataclass
class Predicate:
    path: str
    op: str
    value: Union[int, float, str, bool]


@dataclass
class BoolOp:
    op: str  # "and" | "or"
    left: "Node"
    right: "Node"


@dataclass
class NotOp:
    child: "Node"


Node = Union[IsKind, Predicate, BoolOp, "NotOp"]


@dataclass
class Traversal:
    min_depth: int
    max_depth: int
    direction: str  # "out" | "in"


@dataclass
class Search:
    filter: Node
    traversal: Optional[Traversal]


# --- parser ------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<is>is\(\s*[\w.]+\s*\))"
    r"|(?P<trav>-\[\d+:\d*\]->|-->|<--)"
    r"|(?P<lpar>\()|(?P<rpar>\))"
    r"|(?P<op>==|!=|>=|<=|>|<|~)"
    r"|(?P<bool>\band\b|\bor\b)"
    r"|(?P<not>\bnot\b)|(?P<in>\bin\b)"
    r"|(?P<lbr>\[)|(?P<rbr>\])|(?P<comma>,)"
    r"|(?P<str>\"[^\"]*\"|'[^']*')"
    r"|(?P<num>-?\d+(?:\.\d+)?)"
    r"|(?P<word>[\w.]+))"
)


def _tokenize(text: str) -> list[tuple[str, str]]:
    tokens, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m or m.end() == pos:
            raise ValueError(f"search syntax error at: {text[pos:]!r}")
        pos = m.end()
        for name, val in m.groupdict().items():
            if val is not None:
                tokens.append((name, val.strip()))
                break
    return tokens


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.tokens = tokens
        self.i = 0

    def peek(self) -> Optional[tuple[str, str]]:
        return self.tokens[self.i] if self.i < len(self.tokens) else None

    def next(self) -> tuple[str, str]:
        tok = self.peek()
        if tok is None:
            raise ValueError("unexpected end of search")
        self.i += 1
        return tok

    def parse(self) -> Search:
        filt = self.parse_bool()
        trav = None
        if (tok := self.peek()) and tok[0] == "trav":
            self.next()
            trav = _parse_traversal(tok[1])
        if self.peek() is not None:
            raise ValueError(f"trailing tokens: {self.tokens[self.i:]}")
        return Search(filt, trav)

    def parse_bool(self) -> Node:
        left = self.parse_term()
        while (tok := self.peek()) and tok[0] == "bool":
            self.next()
            right = self.parse_term()
            left = BoolOp(tok[1], left, right)
        return left

    def parse_term(self) -> Node:
        kind_tok, val = self.next()
        if kind_tok == "not":
            return NotOp(self.parse_term())
        if kind_tok == "is":
            return IsKind(val[3:-1].strip())
        if kind_tok == "lpar":
            inner = self.parse_bool()
            if self.next()[0] != "rpar":
                raise ValueError("expected )")
            return inner
        if kind_tok == "word":
            op_tok, op = self.next()
            if op_tok == "in":
                return Predicate(val, "in", self.parse_list())
            if op_tok != "op":
                raise ValueError(f"expected operator after {val}")
            lit_tok, lit = self.next()
            if lit_tok == "str":
                value: Union[int, float, str, bool] = lit[1:-1]
            elif lit_tok == "num":
                value = float(lit) if "." in lit else int(lit)
            elif lit_tok == "word" and lit in ("true", "false"):
                value = lit == "true"
            else:
                raise ValueError(f"bad literal {lit!r}")
            return Predicate(val, op, value)
        raise ValueError(f"unexpected token {val!r}")


    def parse_list(self) -> list:
        if self.next()[0] != "lbr":
            raise ValueError("expected [ after in")
        items: list = []
        while True:
            tok, lit = self.next()
            if tok == "str":
                items.append(lit[1:-1])
            elif tok == "num":
                items.append(float(lit) if "." in lit else int(lit))
            else:
                raise ValueError(f"bad list literal {lit!r}")
            tok, _ = self.next()
            if tok == "rbr":
                return items
            if tok != "comma":
                raise ValueError("expected , or ] in list")


def _parse_traversal(text: str) -> Traversal:
    if text == "-->":
        return Traversal(1, 1, "out")
    if text == "<--":
        return Traversal(1, 1, "in")
    m = re.match(r"-\[(\d+):(\d*)\]->", text)
    assert m
    lo = int(m.group(1))
    hi = int(m.group(2)) if m.group(2) else lo + 8  # unbounded -> capped
    return Traversal(lo, hi, "out")


def parse_search(text: str) -> Search:
    return _Parser(_tokenize(text)).parse()


# --- compiler ---------------------------------------------------------------


def _matching_kinds(model: Model, base: str) -> set[str]:
    """kind + every kind that transitively derives from it (is(base)
    semantics — subclasses match)."""
    out = set()
    for k in model.kinds.values():
        seen: set[str] = set()
        stack = [k.fqn]
        while stack:
            cur = stack.pop()
            if cur in seen:
                continue
            seen.add(cur)
            if cur == base:
                out.add(k.fqn)
                break
            if kk := model.kinds.get(cur):
                stack.extend(kk.bases or [])
    return out


def _predicate_column(pred: Predicate) -> Column:
    path = pred.path
    if path.startswith("reported."):
        path = path[len("reported."):]
    raw = F.get_json_object("reported", f"$.{path}")
    if pred.op == "in":
        values = pred.value
        col = raw.cast("double") if values and isinstance(
            values[0], (int, float)
        ) else raw
        return col.isin(
            *[float(v) if isinstance(v, (int, float)) else v for v in values]
        )
    if isinstance(pred.value, bool):
        col: Column = raw.cast("boolean")
        lit = F.lit(pred.value)
    elif isinstance(pred.value, (int, float)):
        col = raw.cast("double")
        lit = F.lit(float(pred.value))
    else:
        col, lit = raw, F.lit(pred.value)
    if pred.op == "==":
        return col == lit
    if pred.op == "!=":
        return col != lit
    if pred.op == ">":
        return col > lit
    if pred.op == ">=":
        return col >= lit
    if pred.op == "<":
        return col < lit
    if pred.op == "<=":
        return col <= lit
    if pred.op == "~":
        return col.rlike(str(pred.value))
    raise ValueError(f"unsupported op {pred.op}")


def _filter_column(node: Node, model: Model) -> Column:
    if isinstance(node, IsKind):
        kinds = _matching_kinds(model, node.kind)
        return F.col("kind").isin(*kinds) if kinds else F.lit(False)
    if isinstance(node, Predicate):
        return _predicate_column(node)
    if isinstance(node, BoolOp):
        left = _filter_column(node.left, model)
        right = _filter_column(node.right, model)
        return left & right if node.op == "and" else left | right
    if isinstance(node, NotOp):
        return ~_filter_column(node.child, model)
    raise TypeError(node)


def execute_search(source: GraphSource, model: Model, search_text: str) -> DataFrame:
    """Run a search over the graph; returns matching nodes
    (id, kind, reported) — after the traversal when one is present."""
    search = parse_search(search_text)
    matched = source.nodes.filter(_filter_column(search.filter, model))
    if search.traversal is None:
        return matched.select("id", "kind", "reported")
    t = search.traversal
    edges = source.default_edges().select(
        F.col("from_id").alias("src"), F.col("to_id").alias("dst")
    )
    if t.direction == "in":
        edges = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    starts = matched.select(F.col("id").alias("node_id"))
    reached = reachable(
        edges, starts, max_depth=t.max_depth, min_depth=max(t.min_depth, 1)
    )
    out = source.nodes.join(
        reached.select(F.col("node_id").alias("id")), "id"
    ).select("id", "kind", "reported")
    if t.min_depth == 0:  # include the matched nodes themselves
        out = out.unionByName(matched.select("id", "kind", "reported")).distinct()
    return out
