"""Visualization utilities for optimizer artifacts.

The reference ships a ``vis/`` package (rbergm/PostBOUND
``postbound/vis/`` — ``trees.py`` generic tree plotting, ``graphs.py``
graph plotting, ``optimizer.py`` ``plot_join_tree`` / ``plot_join_graph``
/ ``plot_query_plan`` / ``plot_analyze_plan`` / ``plot_relalg``,
``tonic.py`` QEP-S rendering, ``fdl.py`` force-directed layouts) built on
the ``graphviz`` Python package. This module re-expresses that surface as
**plain DOT source strings**: DOT is a stable text format every graphviz
install renders, so the research-convenience layer works in containers
that ship neither the graphviz binary nor matplotlib — and the strings
are trivially assertable in tests. ``render()`` gates the actual
rasterization on a ``dot`` binary being present.

Layout helpers use networkx (a declared dependency of the reference as
well) and return plain ``{node: (x, y)}`` dicts.
"""

from __future__ import annotations

import math
import shutil
import subprocess
from collections.abc import Callable

__all__ = [
    "DotBuilder",
    "plot_join_tree",
    "plot_join_graph",
    "plot_relalg",
    "plot_query_plan",
    "plot_analyze_plan",
    "plot_tonic_qeps",
    "force_directed_layout",
    "kamada_kawai_layout",
    "fruchterman_reingold_layout",
    "render",
]


def _escape(text: str) -> str:
    return text.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


class DotBuilder:
    """Minimal DOT assembler (ref ``vis/trees.py`` — the generic
    structure-to-graphviz transformer, minus the graphviz dependency)."""

    def __init__(self, name: str = "G", directed: bool = False):
        self.directed = directed
        self.name = name
        self._nodes: list[str] = []
        self._edges: list[str] = []
        self._ids: dict[object, str] = {}
        # identity-keyed nodes must outlive their dict entry: a GC'd key
        # would free its id() for reuse and silently merge two nodes
        self._retained: list[object] = []

    @staticmethod
    def _node_key(key: object) -> object:
        # dedup plain value keys (table names, (set, label) pairs) by
        # VALUE — two equal but non-identical strings are the same graph
        # node. Everything else (tree nodes, often value-hashable frozen
        # dataclasses) keys by IDENTITY: two equal subtrees in one tree
        # are still two distinct drawn nodes.
        if isinstance(key, (str, bytes, int, float, tuple, frozenset)):
            return ("v", key)
        return id(key)

    def node(self, key: object, label: str, **attrs: str) -> str:
        dedup = self._node_key(key)
        node_id = self._ids.get(dedup)
        if node_id is None:
            node_id = f"n{len(self._ids)}"
            self._ids[dedup] = node_id
            if not isinstance(dedup, tuple):  # identity-keyed → keep alive
                self._retained.append(key)
            parts = [f'label="{_escape(label)}"'] + [
                f'{k}="{_escape(v)}"' for k, v in sorted(attrs.items())
            ]
            self._nodes.append(f"  {node_id} [{', '.join(parts)}];")
        return node_id

    def edge(self, a: str, b: str, label: str | None = None, **attrs: str) -> None:
        arrow = "->" if self.directed else "--"
        all_attrs = dict(attrs)
        if label:
            all_attrs["label"] = label
        suffix = (
            " [" + ", ".join(f'{k}="{_escape(v)}"' for k, v in sorted(all_attrs.items())) + "]"
            if all_attrs
            else ""
        )
        self._edges.append(f"  {a} {arrow} {b}{suffix};")

    def source(self) -> str:
        kind = "digraph" if self.directed else "graph"
        body = "\n".join(self._nodes + self._edges)
        return f"{kind} {self.name} {{\n  node [shape=box, fontname=monospace];\n{body}\n}}\n"


def _card(value: float) -> str:
    if value is None or (isinstance(value, float) and math.isnan(value)):
        return "?"
    return f"{value:,.0f}"


def plot_join_tree(tree) -> str:
    """Join tree → DOT (ref ``vis/optimizer.py:41`` ``plot_join_tree``):
    leaves are base tables, inner nodes ``⋈`` with their cardinality
    annotation (UES bounds, DP estimates, injected cards — whatever the
    producing stage wrote)."""
    dot = DotBuilder("join_tree")

    def walk(node) -> str:
        if node.is_leaf:
            label = node.table
            if not math.isnan(node.cardinality):
                label += f"\n{_card(node.cardinality)}"
            return dot.node(node, label)
        label = "JOIN"
        if not math.isnan(node.cardinality):
            label += f"\ncard={_card(node.cardinality)}"
        me = dot.node(node, label, shape="ellipse")
        dot.edge(me, walk(node.outer))
        dot.edge(me, walk(node.inner))
        return me

    walk(tree)
    return dot.source()


def plot_join_graph(spec, card_of=None) -> str:
    """Join graph → DOT (ref ``vis/optimizer.py:131`` ``plot_join_graph``):
    tables as nodes, equi-join predicates as edges; PK-FK edges render as
    directed arrows FK → PK (the reference's primary/foreign key arrow
    convention), n:m edges as plain lines.

    ``card_of(table) -> float`` optionally annotates each node with its
    cardinality (ref ``annotate_cards``/``estimated_cards``
    ``vis/optimizer.py:176-303`` — the reference threads an estimator or
    the true counts into the node labels the same way)."""
    dot = DotBuilder("join_graph", directed=True)
    for t in spec.tables:
        label = t if card_of is None else f"{t}\n|R| = {_card(card_of(t))}"
        dot.node(t, label)
    for e in spec.edges:
        a = dot.node(e.left_table, e.left_table)
        b = dot.node(e.right_table, e.right_table)
        label = f"{e.left_col} = {e.right_col}"
        if e.is_pk_fk():
            fk = e.fk_table()
            src, dst = (a, b) if fk == e.left_table else (b, a)
            dot.edge(src, dst, label)
        else:
            dot.edge(a, b, label, dir="none", style="dashed")
    return dot.source()


_RELALG_SYMBOLS = {
    "Relation": "", "Selection": "σ", "Projection": "π", "Map": "χ",
    "Rename": "ρ", "ThetaJoin": "⋈", "NaturalJoin": "⋈ (natural)",
    "CrossProduct": "×", "SemiJoin": "⋉", "AntiJoin": "▷",
    "Grouping": "γ", "DuplicateElimination": "δ", "Sort": "τ",
    "Union": "∪", "Intersection": "∩", "Difference": "−",
}


def _relalg_label(node) -> str:
    kind = type(node).__name__
    symbol = _RELALG_SYMBOLS.get(kind, kind)
    detail = ""
    for attr in ("table", "predicate", "columns", "keys", "mapping", "alias"):
        value = getattr(node, attr, None)
        if value:
            text = str(value)
            detail = text if len(text) <= 40 else text[:37] + "..."
            break
    label = f"{symbol} {kind}" if symbol and symbol != kind else kind
    return f"{label}\n{detail}" if detail else label


def plot_relalg(relnode) -> str:
    """Relational-algebra tree → DOT (ref ``vis/optimizer.py:524``
    ``plot_relalg``) with the reference's operator symbols."""
    dot = DotBuilder("relalg", directed=True)

    def walk(node) -> str:
        me = dot.node(node, _relalg_label(node))
        for child in node.children():
            dot.edge(me, walk(child))
        return me

    walk(relnode)
    return dot.source()


def _plan_dot(plan, annotate: Callable) -> str:
    dot = DotBuilder("query_plan", directed=True)

    def walk(node) -> str:
        me = dot.node(node, annotate(node))
        for child in node.children:
            dot.edge(me, walk(child))
        return me

    walk(plan)
    return dot.source()


def plot_query_plan(plan) -> str:
    """Physical/logical plan → DOT with cardinality estimates (ref
    ``vis/optimizer.py:384`` ``plot_query_plan``). ``plan`` is a
    :class:`~postbound_spark.optimizer.qep.PlanNode`."""
    return _plan_dot(plan, lambda n: f"{n.name}\nest={_card(n.estimated_rows)}")


def plot_analyze_plan(plan) -> str:
    """EXPLAIN-ANALYZE-style plot: estimates, actuals, and per-node
    q-error (ref ``vis/optimizer.py:429`` ``plot_analyze_plan``)."""

    def annotate(n) -> str:
        q = n.qerror()
        qtext = "" if math.isnan(q) else f"\nq-err={q:.2f}"
        return (
            f"{n.name}\nest={_card(n.estimated_rows)} "
            f"act={_card(n.actual_rows)}{qtext}"
        )

    return _plan_dot(plan, annotate)


def plot_tonic_qeps(selection) -> str:
    """TONIC QEP-S prefix trie → DOT (ref ``vis/tonic.py:40``
    ``plot_tonic_qeps``): each node shows its path step and the
    recommended operator with its normalized (weight-averaged) cost —
    computed with the SELECTION's own min_operators/gamma so the plot
    never shows a recommendation the stage would not emit."""
    dot = DotBuilder("tonic_qeps", directed=True)
    min_ops = getattr(selection, "min_operators", 1)
    gamma = getattr(selection, "gamma", 0.8)

    def label(step: str, node) -> str:
        rec = node.recommendation(min_ops, gamma)
        if rec is None:
            return step
        return f"{step}\n{rec.name} (cost {node.normalized_cost(rec, gamma):.2f})"

    def walk(step: str, node) -> str:
        me = dot.node(node, label(step, node))
        for child_step, child in sorted(node.children.items()):
            dot.edge(me, walk(child_step, child))
        return me

    walk("QEP-S", selection.root)
    return dot.source()


def force_directed_layout(spec, iterations: int = 50, seed: int = 0) -> dict:
    """Force-directed table positions for a join graph (ref ``vis/fdl.py:21``
    ``force_directed_layout`` — delegates to networkx exactly like the
    reference; returns ``{table: (x, y)}``)."""
    import networkx as nx

    g = nx.Graph()
    g.add_nodes_from(spec.tables)
    g.add_edges_from((e.left_table, e.right_table) for e in spec.edges)
    pos = nx.spring_layout(g, iterations=iterations, seed=seed)
    return {t: (float(x), float(y)) for t, (x, y) in pos.items()}


def kamada_kawai_layout(spec) -> dict:
    """Kamada-Kawai table positions (ref ``vis/fdl.py:33`` — same
    networkx delegation; deterministic, no seed needed). networkx
    implements it on scipy — absent scipy this raises the scipy
    ImportError (actionable: install scipy), matching the module's
    import-gate discipline."""
    import networkx as nx

    g = nx.Graph()
    g.add_nodes_from(spec.tables)
    g.add_edges_from((e.left_table, e.right_table) for e in spec.edges)
    pos = nx.kamada_kawai_layout(g)
    return {t: (float(x), float(y)) for t, (x, y) in pos.items()}


def fruchterman_reingold_layout(spec, iterations: int = 50, seed: int = 0) -> dict:
    """Fruchterman-Reingold positions (ref ``vis/fdl.py:54``). networkx's
    ``spring_layout`` IS this algorithm — the reference exposes both
    names and so do we, sharing one implementation."""
    return force_directed_layout(spec, iterations=iterations, seed=seed)


def render(dot_source: str, out_path: str, fmt: str = "png") -> str:
    """Rasterize DOT via the ``dot`` binary when installed; raises a clear
    error otherwise (the DOT source itself is always usable)."""
    if shutil.which("dot") is None:
        raise RuntimeError(
            "graphviz 'dot' binary not installed — save the DOT source and "
            "render it where graphviz is available"
        )
    subprocess.run(
        ["dot", f"-T{fmt}", "-o", out_path],
        input=dot_source.encode(),
        check=True,
    )
    return out_path
