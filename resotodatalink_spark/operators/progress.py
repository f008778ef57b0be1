"""Progress tree renderer — the reference's show_progress surface
(reference show_progress.py:12-69) without the ``rich`` dependency.

The reference renders a resotocore ProgressTree as a rich.Tree with
per-node percentage / done markers, capped to the terminal height.
This is the same model on the stdlib: a path-addressed tree of
(current, total) counters, rendered as an indented text tree with the
identical node format (done -> check mark, single-step -> in_progress,
else percentage) and the same height cap.  ``TreeFeedback`` adapts it
to the ``Feedback`` protocol the sync entry points already thread
through (operators/sync.py), so ``collect_to_files(…,
feedback=TreeFeedback())`` gets a live rendering with no code changes.
"""

from __future__ import annotations

import shutil
import sys
from dataclasses import dataclass, field
from typing import IO, Optional


@dataclass
class _Node:
    name: str
    current: int = 0
    total: int = 1
    children: dict[str, "_Node"] = field(default_factory=dict)

    @property
    def done(self) -> bool:
        if self.children:
            return all(c.done for c in self.children.values())
        return self.current >= self.total

    def percentage(self) -> int:
        if self.children:
            kids = list(self.children.values())
            return sum(c.percentage() for c in kids) // len(kids)
        if self.total <= 0:
            return 100
        return min(100 * self.current // self.total, 100)


class ProgressTree:
    """Path-addressed progress counters ('collect/write_tables')."""

    def __init__(self, name: str = "Progress"):
        self.root = _Node(name)

    def add_progress(self, path: str, current: int, total: int) -> None:
        node = self.root
        for part in path.split("/"):
            node = node.children.setdefault(part, _Node(part))
        node.current, node.total = current, max(total, 1)

    def render(self, max_height: Optional[int] = None) -> str:
        max_height = max_height or shutil.get_terminal_size(fallback=(80, 25))[1]
        lines: list[str] = []

        def marker(n: _Node) -> str:
            # reference show_progress.py:49-52: done -> check, a
            # single-step node shows a state word, else the percentage
            state = "done" if n.done else "in_progress"
            text = state if n.total == 1 and not n.children else f"{n.percentage()}%"
            return f"{'[x]' if n.done else '[ ]'} {n.name} ({text})"

        def walk(n: _Node, depth: int) -> None:
            if len(lines) >= max_height:
                return
            lines.append("  " * depth + marker(n))
            for child in n.children.values():
                walk(child, depth + 1)

        walk(self.root, 0)
        return "\n".join(lines)


class TreeFeedback:
    """Feedback adapter: accumulate into a ProgressTree and optionally
    re-render to a stream after every update."""

    def __init__(self, name: str = "Progress", out: Optional[IO[str]] = None):
        self.tree = ProgressTree(name)
        self.out = out

    def progress_done(self, step: str, current: int, total: int) -> None:
        self.tree.add_progress(step, current, total)
        if self.out is not None:
            print(self.tree.render(), file=self.out)


def print_progress(tree: ProgressTree, out: IO[str] = sys.stderr) -> None:
    print(tree.render(), file=out)
