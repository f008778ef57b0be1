"""Progress tree rendering (SURVEY.md §2.9 O1).

The reference renders collection progress as a rich tree with
done/in-progress markers, percentage labels, a terminal-height cap, and
an error/warning message summary (reference show_progress.py:12-69,
backed by resotolib's ProgressTree).  This is the dependency-free
equivalent: a nested step tree keyed by ``/``-separated paths, rendered
to plain text with box-drawing characters — no ``rich``, no terminal
control, so it works in any log sink.

It plugs into the existing ``Feedback`` protocol (operators/sync.py:29)
via ``TreeFeedback``: every ``progress_done(step, cur, total)`` call
updates the step's node, and ``render()`` shows the whole pipeline.
Spark-side granularity stays table-level on purpose — intra-write task
progress belongs to the cluster UI, not the driver loop.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional


@dataclass
class _Node:
    name: str
    current: int = 0
    total: int = 0
    children: dict[str, "_Node"] = field(default_factory=dict)

    @property
    def done(self) -> bool:
        if self.children:
            return all(c.done for c in self.children.values())
        return self.total > 0 and self.current >= self.total

    def percentage(self) -> int:
        """Leaf: own ratio; inner node: mean of children (the
        reference's overall_progress() roll-up shape)."""
        if self.children:
            kids = list(self.children.values())
            return round(sum(c.percentage() for c in kids) / len(kids))
        if self.total <= 0:
            return 0
        return min(100, round(100 * self.current / self.total))


class ProgressTree:
    """Hierarchical progress: paths like ``"collect/write/orders"``
    address nested steps; each update sets (current, total) for a leaf.
    """

    def __init__(self, name: str = "Progress"):
        self.root = _Node(name)
        self.messages: list[tuple[str, str]] = []  # (level, text)

    def update(self, path: str, current: int, total: int) -> None:
        node = self.root
        for part in path.split("/"):
            node = node.children.setdefault(part, _Node(part))
        node.current, node.total = current, total

    # reference-style name (resotolib ProgressTree.add_progress)
    add_progress = update

    def message(self, level: str, text: str) -> None:
        self.messages.append((level, text))

    @property
    def error_count(self) -> int:
        return sum(1 for level, _ in self.messages if level == "error")

    @property
    def warning_count(self) -> int:
        return sum(1 for level, _ in self.messages if level in ("warn", "warning"))

    def render(self, max_height: Optional[int] = None) -> str:
        """Plain-text tree, capped at ``max_height`` lines (the
        reference caps at terminal height, show_progress.py:30-32;
        deeper rows past the cap are elided, never wrapped)."""
        # one list element per physical line so the max_height cap
        # counts what it emits (an embedded newline would undercount)
        lines: list[str] = []
        if self.messages:
            lines.append(f"- {self.error_count} errors")
            lines.append(f"- {self.warning_count} warnings")

        def label(n: _Node) -> str:
            mark = "[x]" if n.done else "[ ]"
            return f"{mark} {n.name} ({n.percentage()}%)"

        def walk(n: _Node, prefix: str) -> None:
            kids = list(n.children.values())
            for i, child in enumerate(kids):
                if max_height is not None and len(lines) >= max_height:
                    return
                last = i == len(kids) - 1
                branch = "`- " if last else "|- "
                lines.append(prefix + branch + label(child))
                walk(child, prefix + ("   " if last else "|  "))

        header = self.root.name if not self.root.children else (
            f"{self.root.name} ({self.root.percentage()}%)"
        )
        lines.insert(2 if self.messages else 0, header)
        walk(self.root, "")
        if max_height is not None:
            lines = lines[:max_height]
        return "\n".join(lines)


class TreeFeedback:
    """Feedback-protocol adapter: collect_* pipelines report into a
    ProgressTree; nest steps with ``/`` in the step name.  Pass ``out``
    (any write()-able) to also log one ``step: current/total`` line per
    update — the plain-text analog of the reference's live re-render."""

    def __init__(self, tree: "Optional[ProgressTree | str]" = None, out=None):
        # accept a plain root name too — the pre-round-4 signature took
        # name:str first, and a str here would otherwise construct fine
        # but explode on the first progress_done (str has no .update)
        if isinstance(tree, str):
            tree = ProgressTree(tree)
        self.tree = tree or ProgressTree()
        self.out = out

    def progress_done(self, step: str, current: int, total: int) -> None:
        self.tree.update(step, current, total)
        if self.out is not None:
            self.out.write(f"{step}: {current}/{total}\n")

    def render(self, max_height: Optional[int] = None) -> str:
        return self.tree.render(max_height)
