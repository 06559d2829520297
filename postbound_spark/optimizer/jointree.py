"""Join trees — the exchange format between join-order optimizers and the
DataFrame compiler.

Mirrors the reference's ``JoinTree`` (rbergm/PostBOUND
``postbound/_hints.py:1230``; annotated variant ``LogicalJoinTree:1648``):
an immutable binary tree whose leaves are base tables, with outer/inner
children distinguished (outer = probe/stream side, inner = build side).
In Spark the tree is *enforced by construction*: the compiler emits
``df.join`` calls in exactly this shape (Catalyst keeps the given order
when CBO join reordering is off), and the inner/outer distinction maps to
broadcast/build-side placement.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Iterator


@dataclass(frozen=True)
class JoinTree:
    """Leaf: ``table`` set, children empty. Join: two children."""

    outer: "JoinTree | None"
    inner: "JoinTree | None"
    table: str | None = None
    cardinality: float = math.nan  # optional annotation (estimated rows)

    # -- construction -------------------------------------------------------

    @staticmethod
    def leaf(table: str, cardinality: float = math.nan) -> "JoinTree":
        return JoinTree(None, None, table, cardinality)

    @staticmethod
    def join(outer: "JoinTree", inner: "JoinTree", cardinality: float = math.nan) -> "JoinTree":
        return JoinTree(outer, inner, None, cardinality)

    @staticmethod
    def left_deep(tables: list[str]) -> "JoinTree":
        """Left-deep tree joining ``tables`` front to back (the shape every
        bottom-up ordering algorithm emits by default)."""
        tree = JoinTree.leaf(tables[0])
        for t in tables[1:]:
            tree = JoinTree.join(tree, JoinTree.leaf(t))
        return tree

    # -- inspection ---------------------------------------------------------

    @property
    def is_leaf(self) -> bool:
        return self.table is not None

    def tables(self) -> list[str]:
        if self.is_leaf:
            return [self.table]
        return self.outer.tables() + self.inner.tables()

    def joins(self) -> Iterator["JoinTree"]:
        """Post-order iteration over join nodes (the order the compiler
        materializes them)."""
        if self.is_leaf:
            return
        yield from self.outer.joins()
        yield from self.inner.joins()
        yield self

    def depth(self) -> int:
        if self.is_leaf:
            return 1
        return 1 + max(self.outer.depth(), self.inner.depth())

    def is_linear(self) -> bool:
        """True for left-deep/right-deep trees (ref: ``_qep.py:1290``)."""
        if self.is_leaf:
            return True
        return (self.outer.is_leaf or self.inner.is_leaf) and (
            self.outer.is_linear() and self.inner.is_linear()
        )

    def is_bushy(self) -> bool:
        return not self.is_linear()

    def annotate(self, cardinality: float) -> "JoinTree":
        return JoinTree(self.outer, self.inner, self.table, cardinality)

    def __str__(self) -> str:
        if self.is_leaf:
            return self.table
        return f"({self.outer} ⋈ {self.inner})"
