"""Notebook display integration (ref ``postbound/_ipython.py``): register
IPython pretty-printers so the research IR renders readably at the REPL —
queries as formatted SQL, join trees as their ⋈ nesting with
cardinality annotations, plan nodes as the indented estimate/actual tree,
and operator assignments as one line per forced join.

Everything degrades gracefully: :func:`setup_pretty_printers` is a no-op
outside IPython, and :func:`format_sql` (the reference's ``format_quick``,
qal serialization) is plain string work usable anywhere — tests cover it
directly.
"""

from __future__ import annotations

__all__ = ["format_sql", "inspect_assignment", "inspect_join_tree", "setup_pretty_printers"]

#: clauses that open a new line at top nesting depth, longest first so
#: GROUP BY wins over a bare GROUP inside an identifier
_CLAUSES = (
    "SELECT", "FROM", "WHERE", "GROUP BY", "HAVING", "ORDER BY",
    "LIMIT", "OFFSET", "UNION ALL", "UNION", "INTERSECT", "EXCEPT",
)


def format_sql(query) -> str:
    """Render a parsed query (or raw SQL string) with one major clause per
    line and AND-chains in WHERE continued on indented lines — the
    reference's ``format_quick`` affordance for reading workload texts.

    Purely lexical outside of strings (clause keywords inside quoted
    literals are left alone); nested subqueries keep their inline form,
    which matches the reference's quick formatter's depth-0-only layout.
    """
    text = query if isinstance(query, str) else query.to_sql()
    out: list[str] = []
    i, depth, in_str = 0, 0, False
    buf: list[str] = []

    def flush(newline_indent: str | None) -> None:
        chunk = "".join(buf).rstrip()
        if not chunk.startswith("  "):  # two spaces mark a deliberate indent
            chunk = chunk.lstrip()
        if chunk:
            out.append(chunk)
        buf.clear()
        if newline_indent is not None:
            buf.append(newline_indent)

    upper = text.upper()
    while i < len(text):
        ch = text[i]
        if in_str:
            buf.append(ch)
            if ch == "'":
                in_str = False
            i += 1
            continue
        if ch == "'":
            in_str = True
            buf.append(ch)
            i += 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if depth == 0:
            # identifier boundary includes '_': snake_case names embedding
            # a keyword (o_limit, ship_from) must never tear; the appended
            # text is the ORIGINAL slice, so case is preserved and the
            # output stays lexically lossless
            def _word(c: str) -> bool:
                return c.isalnum() or c == "_"

            matched = next(
                (
                    c
                    for c in _CLAUSES
                    if upper.startswith(c, i)
                    and (i == 0 or not _word(text[i - 1]))
                    and not (i + len(c) < len(text) and _word(text[i + len(c)]))
                ),
                None,
            )
            if matched and i > 0:
                flush(None)
                buf.append(text[i : i + len(matched)])
                i += len(matched)
                continue
            if upper.startswith("AND ", i) and i > 0 and not _word(text[i - 1]):
                flush("  " + text[i : i + 3])
                i += 3
                continue
        buf.append(ch)
        i += 1
    flush(None)
    return "\n".join(out)


def inspect_join_tree(tree) -> str:
    """One line per join level: the ⋈ nesting plus the annotated
    cardinality/bound where present (ref ``JoinTree.inspect``)."""
    lines: list[str] = []

    def walk(node, indent: int) -> None:
        pad = "  " * indent
        if node.is_leaf:
            lines.append(f"{pad}{node.table}")
            return
        card = getattr(node, "cardinality", None)
        note = f"  [card≤{card:g}]" if card is not None and card == card else ""
        lines.append(f"{pad}⋈{note}")
        walk(node.outer, indent + 1)
        walk(node.inner, indent + 1)

    walk(tree, 0)
    return "\n".join(lines)


def inspect_assignment(assignment) -> str:
    """One line per forced join/scan operator + global settings (ref
    ``PhysicalOperatorAssignment.inspect``)."""
    lines = [
        f"{' ⋈ '.join(sorted(tables))}: {op.name}"
        for tables, op in sorted(
            assignment.join_operators.items(), key=lambda kv: sorted(kv[0])
        )
    ]
    lines += [
        f"scan {table}: {op.name}"
        for table, op in sorted(assignment.scan_operators.items())
    ]
    lines += [f"set {k} = {v}" for k, v in sorted(assignment.global_settings.items())]
    if assignment.materialize:
        lines += [
            f"materialize {' ⋈ '.join(sorted(t))}"
            for t in sorted(assignment.materialize, key=sorted)
        ]
    return "\n".join(lines) or "(no operators forced)"


def setup_pretty_printers() -> bool:
    """Register renderers with IPython's pretty module for the four IR
    types (ref ``setup_pretty_printers``). Returns False (and does
    nothing) when IPython is absent — safe to call from library init."""
    try:
        from IPython.lib import pretty
    except ImportError:
        return False

    from postbound_spark.optimizer.hints import PhysicalOperatorAssignment
    from postbound_spark.optimizer.jointree import JoinTree
    from postbound_spark.optimizer.qep import PlanNode
    from postbound_spark.plans.qal import SqlQuery

    def printer(render):
        def fn(obj, p, cycle):
            p.text(type(obj).__name__ + "(...)" if cycle else render(obj))

        return fn

    pretty.for_type(SqlQuery, printer(format_sql))
    pretty.for_type(PlanNode, printer(lambda n: n.pretty()))
    pretty.for_type(JoinTree, printer(inspect_join_tree))
    pretty.for_type(PhysicalOperatorAssignment, printer(inspect_assignment))
    return True
