"""SQL text → qal IR: the engine's front door, ``parse_query``.

Re-expresses the reference's parser layer (rbergm/PostBOUND
``postbound/parser.py``: ``parse_query`` :2240, namespace binding
``QueryNamespace`` :204, optional live schema binding :2272-2280). The
reference delegates tokenizing/parsing to pglast (Postgres's real parser,
``parser.py:38``); neither pglast nor sqlglot is available here, so this is
a self-contained recursive-descent parser for the ANSI SELECT surface the
qal IR models (SURVEY.md §2.3-§2.5). Like the reference, parsing is
single-process pure Python; execution is elsewhere (Spark runs the IR's
``to_sql`` rendering, so Catalyst remains the semantic analyzer).

Supported surface (mirroring the reference's ParserTests feature matrix,
``tests/test_qal.py:437-600``):

- SELECT [DISTINCT] projections with aliases, ``*`` and ``t.*``
- implicit FROM (comma list) and explicit INNER/CROSS JOIN ... ON, which is
  normalized to implicit form exactly like the reference's
  ``explicit_to_implicit`` rewrite (``transform.py:172``)
- FROM-subqueries ``(SELECT ...) alias`` — lifted into synthetic CTEs
  (semantics-preserving for the non-lateral case the IR models)
- WHERE/HAVING predicate grammar: ``= <> != < <= > >=``, [NOT] BETWEEN,
  [NOT] IN (list | subquery), [NOT] LIKE/ILIKE, IS [NOT] NULL,
  IS [NOT] DISTINCT FROM, [NOT] EXISTS, AND/OR/NOT, bare boolean
  expressions, ``ANY``/``ALL`` quantified comparisons
- expressions: literals, column refs, arithmetic ``+ - * / % ||``, function
  calls (any name passes through uninterpreted, ref qal/_qal.py:797-803)
  with DISTINCT / FILTER (WHERE ...) / OVER (window), CAST and ``::``,
  CASE (searched + simple), EXTRACT, ARRAY literals and subscripts,
  scalar subqueries
- GROUP BY / HAVING / ORDER BY (ASC/DESC, NULLS FIRST/LAST) /
  LIMIT / OFFSET / FETCH {FIRST|NEXT} n ROWS ONLY
- WITH (multiple, non-recursive — same scope limit as the reference,
  qal/_qal.py:8436) and set operations UNION [ALL] / INTERSECT / EXCEPT
  (→ :class:`~postbound_spark.plans.qal.SetQuery`)

- SELECT DISTINCT ON (exprs) (ref Select ctor qal/_qal.py:5867)
- LEFT/RIGHT/FULL [OUTER] and NATURAL [LEFT|RIGHT|FULL] JOIN chains,
  modeled structurally as ``SqlQuery.joins`` (ref JoinType qal/_qal.py:6672,
  ExplicitFromClause :7074) — inner joins before any outer link still
  normalize to implicit form
- LATERAL correlated subqueries in FROM (ref SubqueryTableSource :6270),
  decorrelated by the algebra converter

Out of scope, with explicit errors: recursive CTEs (same limit as the
reference, qal/_qal.py:8436), JOIN ... USING, comma FROM items after an
explicit join chain. These shapes still execute in the engine via the
registry's direct-SQL path (queries/surface.py).

Binding: alias→table resolution always happens (reference: "always
performed", parser.py:1-7). Unqualified columns are bound against an
optional ``schema`` mapping ``{table: [columns]}`` — the analog of the
reference's live ``DatabaseSchema`` binding — and left unbound otherwise.
"""

from __future__ import annotations

import itertools
import re
from dataclasses import replace

from postbound_spark.plans import qal as Q

__all__ = ["parse_query", "ParserError", "UnsupportedSqlError", "to_query_spec"]


class ParserError(ValueError):
    """Malformed SQL for the supported grammar."""


class UnsupportedSqlError(ParserError):
    """Recognized SQL that the qal IR deliberately does not model."""


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
      (?P<ws>\s+|--[^\n]*|/\*.*?\*/)
    | (?P<estr>[eE]'(?:[^'\\]|\\.|'')*')
    | (?P<str>'(?:[^']|'')*')
    | (?P<num>\d+(?:_\d+)*\.(?:\d+(?:_\d+)*)?(?:[eE][+-]?\d+)?|\.\d+(?:_\d+)*(?:[eE][+-]?\d+)?|\d+(?:_\d+)*(?:[eE][+-]?\d+)?)
    | (?P<qid>"[^"]*")
    | (?P<id>[A-Za-z_][A-Za-z_0-9$]*)
    | (?P<op>\|\||::|@>|<@|&&|<=|>=|<>|!=|[=<>(),.\[\]{}*/+\-%:^])
    """,
    re.X | re.S,
)

_KEYWORDS_STOP = {
    # tokens that terminate an expression / cannot start a primary
    "from", "where", "group", "having", "order", "limit", "offset", "fetch",
    "as", "on", "join", "inner", "left", "right", "full", "cross", "natural",
    "and", "or", "not", "in", "is", "between", "like", "ilike", "similar", "rlike",
    "then",
    "when", "else", "end", "union", "intersect", "except", "asc", "desc",
    "nulls", "by", "distinct", "all", "any", "some", "exists", "over",
    "partition", "filter", "rows", "row", "only", "with", "using",
    "lateral", "outer", "window", "qualify",
}


_E_ESCAPES = {
    "n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
    "\\": "\\", "'": "'",
}


def _decode_estring(tok: str) -> str:
    """Postgres escape-string literal ``E'…'`` → standard SQL literal
    (pglast normalizes these to plain string constants, so the reference
    accepts them transparently; we decode at tokenize time so the rest
    of the pipeline — and both engines — only ever see ANSI literals)."""
    body, out, i = tok[2:-1], [], 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            out.append(_E_ESCAPES.get(body[i + 1], body[i + 1]))
            i += 2
        elif c == "'":  # '' escape
            out.append("'")
            i += 2
        else:
            out.append(c)
            i += 1
    return "'" + "".join(out).replace("'", "''") + "'"


class _Tokens:
    def __init__(self, text: str):
        self.toks: list[str] = []
        pos = 0
        while pos < len(text):
            m = _TOKEN_RE.match(text, pos)
            if m is None:
                raise ParserError(f"cannot tokenize at: {text[pos:pos + 25]!r}")
            pos = m.end()
            if m.lastgroup == "estr":
                self.toks.append(_decode_estring(m.group()))
            elif m.lastgroup == "num" and "_" in m.group():
                # numeric underscore separators (DuckDB/modern dialects:
                # 1_000_000) — Spark has no spelling, strip at the door
                self.toks.append(m.group().replace("_", ""))
            elif m.lastgroup != "ws":
                self.toks.append(m.group())
        self.i = 0

    # -- cursor ------------------------------------------------------------

    def peek(self, ahead: int = 0) -> str | None:
        j = self.i + ahead
        return self.toks[j] if j < len(self.toks) else None

    def peek_kw(self, ahead: int = 0) -> str | None:
        t = self.peek(ahead)
        return t.lower() if t is not None else None

    def next(self) -> str:
        if self.i >= len(self.toks):
            raise ParserError("unexpected end of input")
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, *kws: str) -> bool:
        """Consume the next len(kws) tokens iff they match case-insensitively."""
        for off, kw in enumerate(kws):
            if self.peek_kw(off) != kw:
                return False
        self.i += len(kws)
        return True

    def expect(self, kw: str) -> str:
        t = self.peek()
        if t is None or t.lower() != kw.lower():
            raise ParserError(f"expected {kw!r}, found {t!r}")
        return self.next()

    def at_ident(self) -> bool:
        t = self.peek()
        if t is None:
            return False
        return t.startswith('"') or (
            re.match(r"[A-Za-z_]", t) is not None and t.lower() not in _KEYWORDS_STOP
        )


def _ident(tok: str) -> str:
    if tok.startswith('"'):
        inner = tok[1:-1]
        if not re.fullmatch(r"[A-Za-z_][A-Za-z_0-9$]*", inner):
            # a quoted identifier that is not a plain identifier would
            # render as broken bare text downstream (and Spark reads
            # double quotes as STRING literals — cross-engine quoting
            # rules diverge); reject instead of silently mangling
            raise UnsupportedSqlError(
                f"quoted identifier {tok} uses characters beyond "
                "[A-Za-z0-9_$] — rename it (double-quote identifier "
                "rules diverge between engines)"
            )
        return inner
    return tok.lower()


# ---------------------------------------------------------------------------
# expression parse result: rendered text + referenced columns
# ---------------------------------------------------------------------------


class _Expr:
    __slots__ = ("sql", "cols", "row")

    def __init__(
        self,
        sql: str,
        cols: tuple[Q.ColumnReference, ...] = (),
        row: "tuple[_Expr, ...] | None" = None,
    ):
        self.sql = sql
        self.cols = cols
        #: row-value constructor elements — `(a, b)` in comparison/IN
        #: position; the predicate layer expands row ops structurally
        self.row = row

    def to_qal(self) -> Q.SqlExpression:
        return Q.SqlExpression(self.sql, self.cols)


def _merge(sql: str, *parts: _Expr) -> _Expr:
    return _Expr(sql, tuple(c for p in parts for c in p.cols))


#: marker rendered for `OVER wname` until the WINDOW clause is parsed.
#: NUL-delimited on BOTH sides: a NUL cannot appear in tokenized SQL text
#: (so a string literal can never false-positive the leftover check) and
#: the terminal NUL makes one window name never a prefix of another's
#: marker (`w` vs `w__x`).
#: uniquifier for QUALIFY's marker/source names (atomic under the GIL)
_QUALIFY_COUNTER = itertools.count(1)

#: uniquifier for the GROUPS-frame peer-index columns / source names
_GROUPS_COUNTER = itertools.count(1)

_WINREF_PREFIX = "\x00WINREF\x00"

#: sentinel for ORDER BY ALL — expanded at the parse_query level (the
#: select list of the leftmost operand is known there); NUL-delimited so
#: no tokenized SQL text can collide with it
_ORDER_ALL_MARKER = "\x00ORDERALL\x00"
_WINREF_SUFFIX = "\x00"


def _winref_marker(name: str) -> str:
    return f"{_WINREF_PREFIX}{name}{_WINREF_SUFFIX}"


def _winref_name(sql: str) -> str:
    """The window name of the first unresolved marker in ``sql``."""
    return sql.split(_WINREF_PREFIX, 1)[1].split(_WINREF_SUFFIX, 1)[0]


def _resolve_winrefs(
    proj: Q.BaseProjection, named: dict[str, _Expr]
) -> Q.BaseProjection:
    """Inline named-window definitions into a projection's
    ``OVER <marker>`` references (text + referenced columns)."""
    sql = proj.expr.sql
    if _WINREF_PREFIX not in sql:
        return proj
    cols = list(proj.expr.columns)
    for wname, spec in named.items():
        marker = f"OVER {_winref_marker(wname)}"
        if marker in sql:
            sql = sql.replace(marker, f"OVER ({spec.sql})")
            cols.extend(spec.cols)
    return Q.BaseProjection(Q.SqlExpression(sql, tuple(cols)), proj.alias)


def _resolve_order_winrefs(
    order_by: tuple[Q.OrderByExpression, ...], named: dict[str, _Expr]
) -> tuple[Q.OrderByExpression, ...]:
    """Inline named-window definitions into top-level ORDER BY keys.

    ANSI (and the reference's pglast grammar) scope a ``WINDOW w AS
    (...)`` clause over the declaring SELECT's own ORDER BY, so
    ``SELECT x FROM t WINDOW w AS (...) ORDER BY rank() OVER w`` is
    legal — but our ORDER BY parses at the set-query level where the
    SELECT's window map is no longer on the stack. ``parse_query``
    captures the map when its operand is a single SELECT and resolves
    here; markers that survive (set queries, undefined names) fall
    through to the caller's UnsupportedSqlError."""
    out = []
    for o in order_by:
        sql = o.expr.sql
        if _WINREF_PREFIX not in sql:
            out.append(o)
            continue
        cols = list(o.expr.columns)
        for wname, spec in named.items():
            marker = f"OVER {_winref_marker(wname)}"
            if marker in sql:
                sql = sql.replace(marker, f"OVER ({spec.sql})")
                cols.extend(spec.cols)
        out.append(replace(o, expr=Q.SqlExpression(sql, tuple(cols))))
    return tuple(out)


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


_IDENT_CHAIN_RE = re.compile(r"[A-Za-z_][A-Za-z_0-9$]*(?:\.[A-Za-z_][A-Za-z_0-9$]*)*")


def _expand_grouping_sets(
    q: "Q.SqlQuery", sets: list[list[_Expr]]
) -> "Q.SqlQuery | Q.SetQuery":
    """Desugar ``GROUP BY GROUPING SETS (s1, s2, ...)`` into the textbook
    UNION ALL of one grouped aggregate per set, with grouping columns
    absent from a set projected as NULL (same output name, so the
    branches align positionally). EXPRESSION elements (round-10 wave-5
    closure) are matched to select items by TEXT; when such an element
    must NULL-pad a branch its select item needs an alias (the output
    name the branches align on). A single set degenerates to an
    ordinary GROUP BY."""
    all_group = {e.sql for s in sets for e in s}
    clones: list[Q.SqlQuery] = []
    for s in sets:
        in_set = {e.sql for e in s}
        in_set_bare = {c.rsplit(".", 1)[-1] for c in in_set}

        def mark_grouping(text: str) -> str:
            # GROUPING(col, …) is a per-set CONSTANT under the expansion:
            # a BITMASK with the leftmost argument as the most significant
            # bit, 1 when that column is absent from this set
            # (super-aggregate row) — rewritten to the literal on BOTH
            # engines, which also sidesteps dtype gaps (round-10: the
            # multi-argument bitmask form, ANSI GROUPING_ID semantics)
            def mask(m: "re.Match") -> str:
                bits = 0
                for arg in m.group(1).split(","):
                    bare = arg.strip().rsplit(".", 1)[-1]
                    bits = (bits << 1) | (0 if bare in in_set_bare else 1)
                return str(bits)

            return re.sub(
                r"\bgrouping\s*\(\s*([\w$.]+(?:\s*,\s*[\w$.]+)*)\s*\)",
                mask,
                text,
                flags=re.I,
            )

        def null_absent(text: str) -> str:
            # a grouping column ABSENT from this set is NULL in the
            # branch's OUTPUT (the padding rule) — so its references in
            # expression position (e.g. `CASE WHEN grouping(k)=1 THEN -1
            # ELSE k END`, wave-8 probe) become NULL. References INSIDE
            # aggregate arguments stay: aggregates compute over the
            # underlying rows, never the padded key.
            from postbound_spark.plans.algebra import _find_agg_calls

            absent = sorted(all_group - in_set, key=len, reverse=True)
            if not absent:
                return text
            spans: list[tuple[int, int]] = []
            pos = 0
            for call in _find_agg_calls(text):
                at = text.find(call, pos)
                if at >= 0:
                    spans.append((at, at + len(call)))
                    pos = at + len(call)

            def sub_segment(seg: str) -> str:
                for key in absent:
                    bare = key.rsplit(".", 1)[-1]
                    seg = re.sub(
                        rf"(?<![\w$.])(?:[\w$]+\.)?{re.escape(bare)}(?![\w$(])",
                        "NULL",
                        seg,
                    )
                return seg

            out, last = [], 0
            for s, e in spans:
                out.append(sub_segment(text[last:s]))
                out.append(text[s:e])
                last = e
            out.append(sub_segment(text[last:]))
            return "".join(out)

        select = []
        for p in q.select:
            sql = p.expr.sql
            if sql in all_group and sql not in in_set:
                if p.alias is None and not _IDENT_CHAIN_RE.fullmatch(sql):
                    raise UnsupportedSqlError(
                        "a grouping-set EXPRESSION key needs an alias on "
                        f"its select item ({sql!r}) — the NULL-padded "
                        "branches align on the output name"
                    )
                out_name = p.alias or sql.rsplit(".", 1)[-1]
                select.append(
                    Q.BaseProjection(Q.SqlExpression("NULL"), out_name)
                )
            else:
                marked = mark_grouping(sql)
                if marked != sql:
                    # only expressions that referenced GROUPING() also
                    # NULL-pad their absent-key references — a plain
                    # aggregate-only item never needs (and must not risk)
                    # the textual substitution
                    marked = null_absent(marked)
                if marked != sql and p.alias is None:
                    raise UnsupportedSqlError(
                        "GROUPING() select items need an alias under the "
                        "grouping-sets expansion (engines disagree on the "
                        "default name)"
                    )
                select.append(
                    p
                    if marked == sql
                    else Q.BaseProjection(
                        Q.SqlExpression(marked, p.expr.columns), p.alias
                    )
                )
        having = q.having
        if having is not None:
            marked = mark_grouping(having.to_sql())
            if marked != having.to_sql():
                marked = null_absent(marked)
                having = Q.UnaryPredicate(
                    Q.UnaryOperation.BARE, Q.SqlExpression(marked)
                )
        clones.append(
            replace(
                q,
                select=tuple(select),
                having=having,
                group_by=tuple(e.to_qal() for e in s),
            )
        )
    out: Q.SqlQuery | Q.SetQuery = clones[0]
    for c in clones[1:]:
        out = Q.SetQuery(out, Q.SetOperator.UNION_ALL, c)
    return out


def _align_union_by_name(
    left: "Q.SqlQuery", right: "Q.SqlQuery"
) -> tuple["Q.SqlQuery", "Q.SqlQuery"]:
    """Desugar ``UNION [ALL] BY NAME`` (DuckDB): operands align on OUTPUT
    NAMES instead of position — the combined schema is the left's names
    followed by the right-only names, and a side missing a name pads it
    with NULL. Both operands are re-projected in the combined order at
    parse time, so the downstream set operation stays positional (the
    engine-portable form both Spark and the relational algebra execute)."""

    def names_of(side: "Q.SqlQuery", which: str) -> list[str]:
        if not isinstance(side, Q.SqlQuery):
            raise UnsupportedSqlError(
                "UNION BY NAME over nested set-operation operands is not "
                "modeled — parenthesize and alias a derived table"
            )
        out = []
        for p in side.select:
            from postbound_spark.plans.algebra import _output_name

            name = p.alias or _output_name(p.expr.sql)
            if name is None or p.expr.sql == "*" or p.expr.sql.endswith(".*"):
                raise UnsupportedSqlError(
                    f"UNION BY NAME needs derivable output names on the "
                    f"{which} operand — alias the select item "
                    f"({p.expr.sql!r})"
                )
            out.append(name)
        if len(set(out)) != len(out):
            raise UnsupportedSqlError(
                "UNION BY NAME with duplicate output names is ambiguous"
            )
        return out

    lnames, rnames = names_of(left, "left"), names_of(right, "right")
    combined = lnames + [n for n in rnames if n not in lnames]

    def reproject(side: "Q.SqlQuery", names: list[str]) -> "Q.SqlQuery":
        have = dict(zip(names, side.select))
        new_select = tuple(
            Q.BaseProjection(
                have[n].expr if n in have else Q.SqlExpression("NULL"), n
            )
            for n in combined
        )
        return replace(side, select=new_select)

    return reproject(left, lnames), reproject(right, rnames)


def _apply_cte_target_columns(
    name: str, body, cols: list[str]
):
    """Desugar ``WITH name(col, …) AS (SELECT …)`` by positionally
    re-aliasing the body's projections (ref ``WithQuery`` target columns,
    qal/_qal.py:5304). For a set-operation body the LEFTMOST operand
    carries the output names on every engine, so that is where the
    aliases land."""
    if isinstance(body, Q.SetQuery):
        return replace(
            body, left=_apply_cte_target_columns(name, body.left, cols)
        )
    if any(p.expr.sql == "*" or p.expr.sql.endswith(".*") for p in body.select):
        raise UnsupportedSqlError(
            f"CTE {name!r} has a target-column list over a * projection — "
            "positional aliasing needs explicit select items"
        )
    if len(body.select) != len(cols):
        raise ParserError(
            f"CTE {name!r} target-column list has {len(cols)} names but "
            f"the body selects {len(body.select)} columns"
        )
    new_select = tuple(
        Q.BaseProjection(p.expr, alias=c) for p, c in zip(body.select, cols)
    )
    return replace(body, select=new_select)


def _resolve_ordinal(projections, expr, clause: str, by_output_name: bool = False):
    """ANSI ordinal references ("ORDER BY 1", "GROUP BY 2") resolve to
    select-list positions at parse time: downstream the IR compiles
    expressions verbatim, where a bare integer is a CONSTANT — a silent
    no-op sort / single-group aggregation.

    ``by_output_name`` is for set queries: their ORDER BY sorts the
    *combined* output, where the leftmost operand's raw expression (e.g.
    a table-qualified ``n.n_name``) no longer resolves — the ordinal must
    map to the output column name (alias, or the unqualified tail of a
    plain column reference) instead."""
    if not expr.sql.isdigit():
        return expr
    idx = int(expr.sql)
    if not 1 <= idx <= len(projections):
        raise UnsupportedSqlError(
            f"{clause} ordinal {idx} is outside the select list"
        )
    target = projections[idx - 1]
    if target.expr.sql == "*":
        raise UnsupportedSqlError(
            f"{clause} ordinal cannot resolve through SELECT *"
        )
    if clause == "ORDER BY" and target.alias:
        return Q.SqlExpression(target.alias)
    if by_output_name:
        if _IDENT_CHAIN_RE.fullmatch(target.expr.sql):
            return Q.SqlExpression(target.expr.sql.rsplit(".", 1)[-1])
        raise UnsupportedSqlError(
            f"{clause} ordinal {idx} targets an unaliased computed "
            "expression of a set query — alias the select item"
        )
    return target.expr


class _Parser:
    def __init__(self, text: str, schema: dict[str, list[str]] | None = None):
        if "\x00" in text:
            # SQL text never legitimately carries NUL (engines reject it
            # too); rejecting it here makes the NUL-delimited named-window
            # marker genuinely un-fakeable by string-literal content
            raise ParserError("NUL byte in SQL text")
        self.t = _Tokens(text)
        #: table → column list, when the caller passed one to
        #: parse_query. Column BINDING still happens post-parse (_bind);
        #: the parser itself consults this only where a desugar needs to
        #: enumerate a source's columns (PIVOT/UNPIVOT implicit groups)
        self._schema = {
            k.lower(): list(v) for k, v in (schema or {}).items()
        }
        self._cte_counter = 0
        #: set when `OVER wname` emits a named-window marker — gates the
        #: leftover-marker scan so marker-free queries (the overwhelming
        #: majority) never pay a full to_sql() render at parse exit
        self.emitted_winref = False
        #: the most recently completed _parse_select's WINDOW clause map —
        #: captured by parse_query (whose ORDER BY parses after the SELECT
        #: scope has closed) to resolve `OVER wname` in top-level ORDER BY.
        #: _parse_select always overwrites it on exit, so a nested
        #: subquery's map can never leak into its enclosing select.
        self._last_named_windows: dict[str, _Expr] = {}
        #: set by _parse_select on `GROUP BY GROUPING SETS (...)`;
        #: consumed (and reset) by the nearest enclosing parse_query,
        #: which expands the select into a UNION ALL chain
        self._pending_grouping_sets: list[list[_Expr]] | None = None
        #: GROUPS-frame windows recorded by _parse_window_body while a
        #: select list parses: dense-rank window spec text → synthetic
        #: peer-index column name. Consumed (and save/restored around
        #: nested scopes) by _parse_select's _desugar_groups call.
        self._groups_windows: dict[str, str] = {}
        #: deferred star expansions (`* REPLACE`, COLUMNS('regex'),
        #: wave-28): marker text → ("replace", pairs) | ("columns", rx);
        #: each _parse_select expands (and removes) the markers its own
        #: projection list carries once its FROM sources are known
        self._star_expansions: dict[str, tuple] = {}
        self._star_marker_n = 0
        #: stack of CTE-name → parsed-body dicts, one per query scope
        #: (wave-30): lets PIVOT/star-expansion enumerate a CTE source's
        #: columns, including through bare-star derived tables
        self._cte_scopes: list[dict] = []

    # ---- queries ---------------------------------------------------------

    def parse(self) -> Q.SqlQuery | Q.SetQuery:
        explain = self._parse_explain()
        q = self.parse_query()
        if self.t.peek() is not None:
            raise ParserError(f"trailing tokens at {self.t.peek()!r}")
        if self._groups_windows:
            # recorded by a window OUTSIDE any select list (top-level
            # ORDER BY) — no scope computes the peer index there
            raise UnsupportedSqlError(
                "GROUPS window frames outside a SELECT list are not "
                "modeled"
            )
        if explain is not None:
            q = replace(q, explain=explain)
        return q

    def _parse_explain(self) -> Q.Explain | None:
        """Leading ``EXPLAIN [ANALYZE] [(option, ...)]`` (ref ExplainStmt
        parse, parser.py:1996: ANALYZE flag + FORMAT option; unknown
        options are a loud ParserError exactly like the reference)."""
        if self.t.peek_kw() != "explain":
            return None
        self.t.next()
        analyze, fmt = False, "TEXT"
        if self.t.peek_kw() == "analyze":
            self.t.next()
            analyze = True
        elif self.t.peek() == "(" and self.t.peek_kw(1) not in ("select", "with"):
            # parens after EXPLAIN are an option list unless they open a
            # query — ref ExplainStmt options (unknown option = loud error)
            self.t.next()
            while True:
                opt = self.t.next().lower()
                if opt == "analyze":
                    analyze = True
                elif opt == "format":
                    fmt = self.t.next().upper()
                elif opt == "verbose":
                    pass  # accepted, no IR effect (plan text is already full)
                else:
                    raise ParserError(f"unknown explain option: {opt!r}")
                if not self.t.accept(","):
                    break
            self.t.expect(")")
        return Q.Explain(analyze, fmt)

    def parse_query(self) -> Q.SqlQuery | Q.SetQuery:
        # Grouping sets are threaded through parser state between
        # _parse_select (producer) and the enclosing parse_query
        # (consumer).  A NESTED parse_query — a subquery parsed after the
        # outer GROUP BY, e.g. in HAVING or a later set-operand's WHERE —
        # must not steal the outer query's pending sets, so the outer
        # value is saved here and restored on every exit path.
        outer_pending = self._pending_grouping_sets
        self._pending_grouping_sets = None
        try:
            return self._parse_query_inner()
        finally:
            self._pending_grouping_sets = outer_pending

    def _parse_query_inner(self) -> Q.SqlQuery | Q.SetQuery:
        # CTE bodies visible to this scope (and, via the stack, its
        # subqueries) — consulted by _pivot_source_info to resolve a
        # star-through-CTE source's column list (wave-30)
        self._cte_scopes.append({})
        try:
            return self._parse_query_inner_impl()
        finally:
            self._cte_scopes.pop()

    def _parse_query_inner_impl(self) -> Q.SqlQuery | Q.SetQuery:
        ctes: list[tuple[str, Q.SqlQuery | Q.SetQuery]] = []
        if self.t.accept("with"):
            # WITH RECURSIVE (extension — the reference excludes recursion,
            # qal/_qal.py:8436): the keyword scopes over the whole WITH
            # list; an entry becomes a RecursiveCte only when its body
            # actually references its own name (ANSI)
            recursive_with = bool(self.t.accept("recursive"))
            while True:
                name = _ident(self.t.next())
                # target-column list: WITH v(a, b) AS (…) — desugared into
                # the body's projection aliases (ref WithQuery target
                # columns, qal/_qal.py:5304); VALUES bodies route through
                # a ValuesTableSource subselect (ref ValuesWithQuery :5469)
                cols: list[str] = []
                if self.t.accept("("):
                    cols.append(_ident(self.t.next()))
                    while self.t.accept(","):
                        cols.append(_ident(self.t.next()))
                    self.t.expect(")")
                self.t.expect("as")
                materialized = False
                if self.t.accept("not"):
                    # NOT MATERIALIZED = the default inline treatment
                    self.t.expect("materialized")
                elif self.t.accept("materialized"):
                    materialized = True
                self.t.expect("(")
                if self.t.peek_kw() == "values":
                    if not cols:
                        raise UnsupportedSqlError(
                            "a VALUES-backed CTE needs a target-column "
                            "list — WITH v(a, b) AS (VALUES …) — engines "
                            "disagree on default VALUES column names"
                        )
                    rows = self._parse_values()
                    width = len(rows[0])
                    if any(len(r) != width for r in rows) or width != len(cols):
                        raise ParserError(
                            f"VALUES rows and target columns of CTE "
                            f"{name!r} disagree on width"
                        )
                    body: Q.SqlQuery | Q.SetQuery = Q.SqlQuery(
                        select=(Q.star(),),
                        from_tables=(
                            Q.ValuesTableSource(
                                rows,
                                alias=f"__values_{name}",
                                columns=tuple(cols),
                            ),
                        ),
                    )
                else:
                    body = self.parse_query()
                    if cols:
                        body = _apply_cte_target_columns(name, body, cols)
                self.t.expect(")")
                if recursive_with and Q.references_table(body, name):
                    if materialized:
                        raise UnsupportedSqlError(
                            "MATERIALIZED on a recursive CTE is not modeled"
                        )
                    cls = Q.RecursiveCte
                elif recursive_with and Q.references_table_deep(body, name):
                    # self-reference hides inside a WHERE/SELECT subquery of
                    # the step — reject loudly (Postgres rejects this shape
                    # too) rather than resolve the name against the catalog
                    raise UnsupportedSqlError(
                        f"recursive reference to {name!r} appears only inside "
                        "a subquery of the recursive step; move the "
                        "self-reference into the step's FROM clause"
                    )
                else:
                    cls = (
                        Q.MaterializedCte
                        if materialized
                        else Q.CommonTableExpression
                    )
                ctes.append(cls(name, body))
                self._cte_scopes[-1][name.lower()] = body
                if not self.t.accept(","):
                    break
        # set operations combine at this level (ref SetQuery :9396); ANSI
        # precedence: INTERSECT binds tighter than UNION/EXCEPT, so the
        # INTERSECT runs are folded in an inner loop before the outer
        # UNION/EXCEPT chain sees them ("a UNION b INTERSECT c" is
        # a UNION (b INTERSECT c) on every engine)
        def intersect_chain() -> Q.SqlQuery | Q.SetQuery:
            operand = self._parse_set_operand()
            while self.t.peek_kw() == "intersect":
                self.t.next()
                if self.t.accept("distinct"):
                    # explicit DISTINCT is the ANSI default spelling
                    op = Q.SetOperator.INTERSECT
                elif self.t.accept("all"):
                    op = Q.SetOperator.INTERSECT_ALL
                else:
                    op = Q.SetOperator.INTERSECT
                rhs = self._parse_set_operand()
                operand = Q.SetQuery(operand, op, rhs)
            return operand

        q = intersect_chain()
        while self.t.peek_kw() in ("union", "except"):
            kw = self.t.next().lower()
            if self.t.accept("distinct"):
                op = (
                    Q.SetOperator.UNION
                    if kw == "union"
                    else Q.SetOperator.EXCEPT
                )
            elif kw == "union":
                op = (
                    Q.SetOperator.UNION_ALL
                    if self.t.accept("all")
                    else Q.SetOperator.UNION
                )
            else:
                op = (
                    Q.SetOperator.EXCEPT_ALL
                    if self.t.accept("all")
                    else Q.SetOperator.EXCEPT
                )
            by_name = False
            if (
                kw == "union"
                and self.t.peek_kw() == "by"
                and self.t.peek_kw(1) == "name"
            ):
                self.t.next()
                self.t.next()
                by_name = True
            rhs = intersect_chain()
            if by_name:
                q, rhs = _align_union_by_name(q, rhs)
            q = Q.SetQuery(q, op, rhs)
        pending_sets = self._pending_grouping_sets
        self._pending_grouping_sets = None
        if pending_sets is not None:
            if isinstance(q, Q.SetQuery):
                raise UnsupportedSqlError(
                    "GROUPING SETS inside a set operation is not modeled — "
                    "write the per-set UNION ALL expansion directly"
                )
            q = _expand_grouping_sets(q, pending_sets)
        # trailing ORDER BY / LIMIT / OFFSET / FETCH apply to the whole
        # query (plain or set) — operands never consume them, so the
        # clauses cannot mis-bind to the rightmost set operand. Ordinals
        # resolve against the (leftmost) select list here, where the
        # column source of the combined result is known.
        # capture the (single-SELECT) operand's WINDOW map BEFORE parsing
        # ORDER BY — a scalar subquery inside an ORDER BY key would
        # overwrite _last_named_windows with its own (empty) map
        named_windows = (
            self._last_named_windows if not isinstance(q, Q.SetQuery) else {}
        )
        order_by, limit, offset, fetch_direction, fetch_ties = (
            self._parse_order_limit()
        )
        if fetch_ties and not order_by:
            raise UnsupportedSqlError(
                "FETCH ... WITH TIES requires an ORDER BY clause — without "
                "one there is no tie group to extend"
            )
        if named_windows:
            order_by = _resolve_order_winrefs(order_by, named_windows)
        for o in order_by:
            if _WINREF_PREFIX in o.expr.sql:
                raise UnsupportedSqlError(
                    f"named window {_winref_name(o.expr.sql)!r} referenced "
                    "in ORDER BY is not defined in this scope — a WINDOW "
                    "clause scopes over its own SELECT's ORDER BY only "
                    "(set-query ORDER BY cannot see operand windows; "
                    "order by the select-item alias instead)"
                )
        leftmost = q
        while isinstance(leftmost, Q.SetQuery):
            leftmost = leftmost.left
        if order_by and order_by[0].expr.sql == _ORDER_ALL_MARKER:
            # ORDER BY ALL → one key per select item, list order, shared
            # direction/null placement
            tmpl = order_by[0]
            expanded: list[Q.OrderByExpression] = []
            for p in leftmost.select:
                text = p.alias or p.expr.sql
                if text == "*" or text.endswith(".*"):
                    raise UnsupportedSqlError(
                        "ORDER BY ALL with a star select is not modeled — "
                        "name the columns"
                    )
                expanded.append(
                    replace(
                        tmpl, expr=Q.SqlExpression(text, p.expr.columns)
                    )
                )
            order_by = tuple(expanded)
        order_by = tuple(
            replace(
                o,
                expr=_resolve_ordinal(
                    leftmost.select,
                    o.expr,
                    "ORDER BY",
                    by_output_name=isinstance(q, Q.SetQuery),
                ),
            )
            for o in order_by
        )
        if (
            not isinstance(q, Q.SetQuery)
            and order_by
            and len(q.from_tables) == 1
            and q.from_tables[0].full_name.startswith("__qualify_src")
        ):
            # the QUALIFY desugar renamed the outputs to their bare
            # names — a QUALIFIED key in the top-level ORDER BY
            # (`ORDER BY o.k` above `QUALIFY ...`) must follow suit
            # (wave-30 composition find; DuckDB resolves it through
            # the qualify, so failing at analysis was a parity gap)
            outs = {(p.alias or p.expr.sql).lower() for p in q.select}
            order_by = tuple(
                replace(o, expr=Q.SqlExpression(m.group(2)))
                if (
                    (m := re.fullmatch(
                        r"([\w$]+)\.([\w$]+)", o.expr.sql.strip()
                    ))
                    and m.group(2).lower() in outs
                )
                else o
                for o in order_by
            )
        if (
            not isinstance(q, Q.SetQuery)
            and order_by
            and any(_has_window_call(o.expr.sql) for o in order_by)
        ):
            # WINDOW calls in ORDER BY keys: Spark's Sort operator
            # rejects window expressions outright where DuckDB evaluates
            # them (wave-21). Desugared like QUALIFY: each window-bearing
            # key becomes a helper select item (windows evaluate in the
            # SELECT — over the aggregated frame when GROUP BY is
            # present), one level up orders by the helper and projects
            # the original output names.
            q, order_by = self._desugar_orderby_windows(q, order_by)
        if isinstance(q, Q.SetQuery):
            if fetch_direction != "first":
                # FETCH PRIOR/LAST is this parser's extension for plain
                # queries (inverted-window rewrite); the reference's
                # SetQuery Limit clause has no direction concept either
                raise UnsupportedSqlError(
                    "FETCH PRIOR/LAST on a set query is not modeled"
                )
            if order_by or limit is not None or offset is not None:
                q = replace(
                    q,
                    order_by=order_by,
                    limit=limit,
                    offset=offset,
                    fetch_ties=fetch_ties,
                )  # SetQuery carries fetch_ties too (ANSI allows it)
        elif (
            order_by
            or limit is not None
            or offset is not None
            or fetch_direction != "first"
        ):
            q = replace(
                q,
                order_by=order_by,
                limit=limit,
                offset=offset,
                fetch_direction=fetch_direction,
                fetch_ties=fetch_ties,
            )
        if ctes:
            # both query kinds carry a WITH clause (ref SetQuery
            # cte_clause, qal/_qal.py:9423)
            q = replace(q, ctes=tuple(ctes) + q.ctes)
        if isinstance(q, Q.SqlQuery):
            q = _bind(q)
        return q

    def _parse_set_operand(self) -> Q.SqlQuery | Q.SetQuery:
        if self.t.accept("("):
            # parenthesized query — operand of a set op or plain grouping
            q = self.parse_query()
            self.t.expect(")")
            return q
        if self.t.peek_kw() == "values":
            # top-level VALUES statement (ANSI table-value constructor):
            # `VALUES (1, 'a'), (2, 'b')` ≡ SELECT * over an inline
            # relation; columns named col0..colN-1 (DuckDB's own default,
            # so identical text stays oracle-comparable). Composes with
            # set ops and the trailing ORDER BY/LIMIT by construction.
            rows = self._parse_values()
            width = len(rows[0])
            if any(len(r) != width for r in rows):
                raise ParserError("VALUES rows disagree on width")
            names = tuple(f"col{i}" for i in range(width))
            return Q.SqlQuery(
                # explicit select list (not *) so ORDER BY ordinals and
                # output-name references resolve against the VALUES row
                select=tuple(
                    Q.BaseProjection(Q.SqlExpression(n), None) for n in names
                ),
                from_tables=(
                    Q.ValuesTableSource(
                        rows, alias="__values_stmt", columns=names
                    ),
                ),
            )
        if self.t.peek_kw() == "table":
            # Postgres `TABLE name` shorthand ≡ SELECT * FROM name —
            # pglast normalizes it to a SelectStmt, so the reference's
            # parser accepts it transparently; composes with set ops
            # (`TABLE a UNION TABLE b`) by construction here
            self.t.next()
            name = _ident(self.t.next())
            return Q.SqlQuery(
                select=(Q.BaseProjection(Q.SqlExpression("*"), None),),
                from_tables=(Q.TableReference(name),),
            )
        q = self._parse_select()
        # GROUPING SETS expand PER OPERAND (round-11): consuming the
        # pending sets here lets grouping-sets selects participate in set
        # operations — the desugared UNION ALL simply becomes a nested
        # set operand. Plain queries take the same route (the top-level
        # expansion in parse_query remains as a safety net).
        pending = self._pending_grouping_sets
        self._pending_grouping_sets = None
        if pending is not None:
            return _expand_grouping_sets(q, pending)
        return q

    def _splice_from_first(self) -> None:
        """DuckDB FROM-first syntax (wave-28): ``FROM t [SELECT items]
        [WHERE ...]`` — reorder the token stream into canonical
        SELECT-first form in place (``FROM t`` alone selects ``*``).
        Pure reordering, so every downstream clause parser is unchanged."""
        toks = self.t.toks
        i = self.t.i  # points at FROM
        clause_kws = {
            "select", "where", "group", "having", "order", "limit",
            "offset", "qualify", "union", "intersect", "except",
            "window", "fetch",
        }

        def scan(start: int, stop_kws: set[str]) -> int:
            depth = 0
            j = start
            while j < len(toks):
                t = toks[j]
                if t == "(":
                    depth += 1
                elif t == ")":
                    if depth == 0:
                        break
                    depth -= 1
                elif depth == 0 and t.lower() in stop_kws:
                    break
                j += 1
            return j

        j = scan(i + 1, clause_kws)
        from_chunk = toks[i:j]
        if j < len(toks) and toks[j].lower() == "select":
            k = scan(j + 1, clause_kws - {"select"})
            new = (
                toks[:i]
                + [toks[j]]
                + toks[j + 1 : k]
                + from_chunk
                + toks[k:]
            )
        else:
            new = toks[:i] + ["SELECT", "*"] + from_chunk + toks[j:]
        self.t.toks = new

    def _expand_star_markers(
        self, projections, tables, explicit_joins, lifted
    ):
        """Expand `* REPLACE` / COLUMNS('regex') markers (wave-28) now
        that the FROM sources are known. Single-source only — the
        in-place column ordering both expansions promise has no stable
        meaning across a join's two sides."""
        if explicit_joins or len(tables) != 1:
            raise UnsupportedSqlError(
                "* REPLACE / COLUMNS('regex') expand over a single "
                "source — project the join into a derived table first"
            )
        _txt, cols = self._pivot_source_info(tables[0], lifted)
        out = []
        for p in projections:
            payload = self._star_expansions.pop(p.expr.sql, None)
            if payload is None:
                out.append(p)
                continue
            kind, data = payload
            if kind == "replace":
                repl = {name.lower(): e for e, name in data}
                unknown = sorted(
                    set(repl) - {c.lower() for c in cols}
                )
                if unknown:
                    raise UnsupportedSqlError(
                        f"* REPLACE names columns the source lacks: "
                        f"{unknown}"
                    )
                for c in cols:
                    r = repl.get(c.lower())
                    if r is None:
                        out.append(
                            Q.BaseProjection(Q.SqlExpression(c))
                        )
                    else:
                        out.append(Q.BaseProjection(r.to_qal(), c))
            else:
                matched = [c for c in cols if data.search(c)]
                if not matched:
                    raise UnsupportedSqlError(
                        f"COLUMNS({data.pattern!r}) matches no column "
                        f"of {tables[0].identifier!r}"
                    )
                out.extend(
                    Q.BaseProjection(Q.SqlExpression(c)) for c in matched
                )
        return out

    def _parse_select(self) -> Q.SqlQuery:
        if self.t.peek_kw() == "from":
            self._splice_from_first()
        self.t.expect("select")
        # GROUPS-frame windows recorded while THIS select's expressions
        # parse are consumed by _desugar_groups below; the enclosing
        # scope's pending map is saved so a subquery cannot steal it
        outer_groups = self._groups_windows
        self._groups_windows = {}
        distinct = False
        distinct_on: tuple[Q.SqlExpression, ...] = ()
        if self.t.accept("distinct"):
            if self.t.accept("on"):
                # DISTINCT ON (exprs) — ref Select ctor qal/_qal.py:5867
                self.t.expect("(")
                exprs = [self._parse_expression()]
                while self.t.accept(","):
                    exprs.append(self._parse_expression())
                self.t.expect(")")
                distinct_on = tuple(e.to_qal() for e in exprs)
            else:
                distinct = True
        projections = [self._parse_projection()]
        while self.t.accept(","):
            projections.append(self._parse_projection())

        tables: list[Q.TableReference] = []
        join_preds: list[Q.AbstractPredicate] = []
        lifted_ctes: list[tuple[str, Q.SqlQuery | Q.SetQuery]] = []
        explicit_joins: list[Q.JoinedTable] = []
        if self.t.accept("from"):
            tables, join_preds, lifted_ctes, explicit_joins = self._parse_from()

        where = self._parse_predicate() if self.t.accept("where") else None
        # explicit-JOIN ON conditions merge into WHERE — the reference's
        # explicit_to_implicit normalization (transform.py:172)
        if join_preds:
            conds = join_preds + ([where] if where is not None else [])
            where = Q.and_(*conds)

        group_by: tuple[Q.SqlExpression, ...] = ()
        if self.t.accept("group", "by"):
            if self.t.peek_kw() == "all":
                # GROUP BY ALL (DuckDB/Spark modern-dialect shorthand):
                # group by every select item that contains no aggregate
                # call — expanded at parse time so the IR stays explicit
                # and both engines see equivalent text via to_sql()
                self.t.next()
                from postbound_spark.plans.algebra import _find_agg_calls

                keys: list[Q.SqlExpression] = []
                for p in projections:
                    text = p.expr.sql
                    blanked = re.sub(r"'(?:[^']|'')*'", "''", text)
                    if text == "*" or text.endswith(".*"):
                        raise UnsupportedSqlError(
                            "GROUP BY ALL with a star select is not modeled"
                        )
                    if _find_agg_calls(text):
                        continue
                    if re.search(r"\bover\s*\(", blanked, re.I):
                        raise UnsupportedSqlError(
                            "GROUP BY ALL with window functions in the "
                            "select list is not modeled"
                        )
                    keys.append(p.expr)
                if not keys:
                    raise UnsupportedSqlError(
                        "GROUP BY ALL found no non-aggregate select items"
                    )
                group_by = tuple(keys)
            else:
                # GROUP BY element [, element ...] where each element is a
                # plain expression, ROLLUP(...), CUBE(...), or GROUPING
                # SETS (...). ANSI composes a MIXED list as the CROSS
                # PRODUCT of each element's set list (a plain expression
                # is the singleton list [[e]]), so `GROUP BY a, ROLLUP(b,
                # c)` = sets {(a,b,c),(a,b),(a)}. Any multi-set element →
                # the whole clause desugars at the parse_query level into
                # a UNION ALL of per-set grouped aggregates with
                # NULL-padded grouping columns (the textbook expansion;
                # the reference's IR model excludes grouping sets,
                # qal/_qal.py:8438 — this engine executes them).
                element_lists: list[list[list[_Expr]]] = []
                any_multi = False
                while True:
                    if self.t.accept("grouping", "sets"):
                        self.t.expect("(")
                        sets: list[list[_Expr]] = []
                        while True:
                            if self.t.accept("("):
                                one: list[_Expr] = []
                                if not self.t.accept(")"):
                                    one.append(self._parse_value_or_predicate())
                                    while self.t.accept(","):
                                        one.append(self._parse_value_or_predicate())
                                    self.t.expect(")")
                                sets.append(one)
                            else:
                                # bare element = singleton set (ANSI)
                                sets.append([self._parse_value_or_predicate()])
                            if not self.t.accept(","):
                                break
                        self.t.expect(")")
                        element_lists.append(sets)
                        any_multi = True
                    elif self.t.peek_kw() in ("rollup", "cube"):
                        # ROLLUP = the prefix hierarchy incl. the grand
                        # total, CUBE = the power set; Spark's own
                        # rollup()/cube() are the DataFrame-API
                        # spellings, the native path executes the
                        # per-set UNION ALL so DuckDB runs identical text
                        form = self.t.next().lower()
                        self.t.expect("(")
                        cols = [self._parse_expression()]
                        while self.t.accept(","):
                            cols.append(self._parse_expression())
                        self.t.expect(")")
                        if form == "rollup":
                            sets = [cols[:i] for i in range(len(cols), -1, -1)]
                        else:
                            from itertools import combinations

                            sets = [
                                list(c)
                                for r in range(len(cols), -1, -1)
                                for c in combinations(cols, r)
                            ]
                        element_lists.append(sets)
                        any_multi = True
                    else:
                        # value-or-predicate: boolean keys
                        # (`GROUP BY x > 2`) are ordinary expressions
                        # of type boolean (wave-22)
                        element_lists.append(
                            [[self._parse_value_or_predicate()]]
                        )
                    if not self.t.accept(","):
                        break
                if any_multi:
                    from itertools import product as _iproduct

                    self._pending_grouping_sets = [
                        [e for part in combo for e in part]
                        for combo in _iproduct(*element_lists)
                    ]
                else:
                    group_by = tuple(
                        el[0][0].to_qal() for el in element_lists
                    )

        having = self._parse_predicate() if self.t.accept("having") else None

        # WINDOW name AS (spec), ... — named windows (ANSI; ref pglast
        # grammar WindowClause). Normalized away at parse time by inlining
        # each definition into its `OVER name` references, the same
        # normalize-at-the-door treatment as explicit-JOIN ON conditions.
        named: dict[str, _Expr] = {}
        if self.t.accept("window"):
            while True:
                wname = _ident(self.t.next())
                if wname in named:
                    raise ParserError(f"duplicate WINDOW name {wname!r}")
                self.t.expect("as")
                self.t.expect("(")
                # window INHERITANCE (ANSI; wave-5 probe find): `w2 AS
                # (w1 ORDER BY …)` copies the base window's spec and
                # appends the refinement — the base may not already carry
                # what the refinement adds (the ANSI restriction the
                # splice enforces by construction for ORDER BY)
                base: _Expr | None = None
                if (
                    self.t.at_ident()
                    and (self.t.peek() or "") in named
                    and (self.t.peek_kw(1) or ")")
                    in ("order", "rows", "range", ")")
                ):
                    base = named[_ident(self.t.next())]
                spec = self._parse_window_body()
                if getattr(self, "_last_frame_exclusion", None):
                    raise UnsupportedSqlError(
                        "frame EXCLUDE inside a named WINDOW clause is "
                        "not modeled — inline the OVER specification"
                    )
                if base is not None:
                    if "ORDER BY" in base.sql and "ORDER BY" in spec.sql:
                        raise ParserError(
                            f"window {wname!r} cannot re-specify ORDER BY "
                            "of its base window"
                        )
                    joined = f"{base.sql} {spec.sql}".strip()
                    spec = _Expr(joined, base.cols + spec.cols)
                named[wname] = spec
                self.t.expect(")")
                if not self.t.accept(","):
                    break
            projections = [_resolve_winrefs(p, named) for p in projections]
        self._last_named_windows = named
        for p in projections:
            if _WINREF_PREFIX in p.expr.sql:
                raise ParserError(
                    f"window {_winref_name(p.expr.sql)!r} is not defined"
                )

        # QUALIFY pred — the post-window filter (DuckDB/Snowflake/BigQuery;
        # Spark has no native clause). Desugared at parse time into the
        # textbook rewrite: project the predicate as a marker column next
        # to the windows, filter on it one level up, return the original
        # output columns.
        qualify: Q.AbstractPredicate | None = None
        if self.t.accept("qualify"):
            qualify = self._parse_predicate()

        # ORDER BY / LIMIT / OFFSET / FETCH are NOT consumed here: a
        # trailing clause after a set operand belongs to the WHOLE set
        # query (ANSI), so parse_query owns them at the top level —
        # consuming them per-select silently bound "a UNION b ORDER BY x"
        # to b alone.
        group_by = tuple(
            _resolve_ordinal(tuple(projections), e, "GROUP BY") for e in group_by
        )

        if self._star_expansions and any(
            p.expr.sql in self._star_expansions for p in projections
        ):
            projections = self._expand_star_markers(
                projections, tables, explicit_joins, lifted_ctes
            )
        q = Q.SqlQuery(
            select=tuple(projections),
            from_tables=tuple(tables),
            where=where,
            group_by=group_by,
            having=having,
            distinct=distinct,
            distinct_on=distinct_on,
            joins=tuple(explicit_joins),
            ctes=tuple(lifted_ctes),
        )
        groups_specs = self._groups_windows
        self._groups_windows = outer_groups
        if groups_specs:
            q = self._desugar_groups(q, groups_specs)
        if qualify is not None:
            q = self._desugar_qualify(q, qualify, named)
        return q

    def _desugar_orderby_windows(
        self,
        q: Q.SqlQuery,
        order_by: tuple[Q.OrderByExpression, ...],
    ) -> tuple[Q.SqlQuery, tuple[Q.OrderByExpression, ...]]:
        """See the call site: window-bearing ORDER BY keys become helper
        select items; the outer level orders by the helpers. Non-window
        keys carry verbatim (they must reference output columns — a
        dropped-column key fails loudly at analysis)."""
        tag = next(_QUALIFY_COUNTER)
        src = f"__ordwin_src{tag}"
        helpers: list[Q.BaseProjection] = []
        new_order: list[Q.OrderByExpression] = []
        for i, o in enumerate(order_by):
            if _has_window_call(o.expr.sql):
                hname = f"__ordwin{tag}_{i}"
                helpers.append(Q.BaseProjection(o.expr, hname))
                new_order.append(replace(o, expr=Q.SqlExpression(hname)))
            else:
                new_order.append(o)
        star_select = (
            len(q.select) == 1
            and q.select[0].alias is None
            and q.select[0].expr.sql == "*"
        )
        out_sel: list[Q.BaseProjection] = []
        if star_select:
            hnames = ", ".join(p.alias for p in helpers)
            out_sel.append(
                Q.BaseProjection(Q.SqlExpression(f"* EXCEPT ({hnames})"))
            )
        else:
            for p in q.select:
                name = p.alias
                if name is None:
                    m = re.fullmatch(
                        r"(?:[\w$]+\.)?([\w$]+)", p.expr.sql
                    )
                    if m is None:
                        raise UnsupportedSqlError(
                            "window functions in ORDER BY need every "
                            "computed select item to carry an alias "
                            "(output names feed the post-sort "
                            "projection)"
                        )
                    name = m.group(1)
                out_sel.append(
                    Q.BaseProjection(Q.SqlExpression(name))
                )
        inner = replace(q, select=tuple(q.select) + tuple(helpers))
        outer = Q.SqlQuery(
            select=tuple(out_sel),
            from_tables=(Q.TableReference(src, virtual=True),),
            ctes=(Q.CommonTableExpression(src, inner),),
        )
        return outer, tuple(new_order)

    def _desugar_groups(
        self, q: Q.SqlQuery, specs: dict[str, str]
    ) -> Q.SqlQuery:
        """Second half of the GROUPS-frame rewrite (see
        ``_rewrite_groups_frame``): wrap the select so the peer-index
        columns — ``dense_rank()`` over each GROUPS window's own
        PARTITION/ORDER spec — are computed ONE LEVEL BELOW the windows
        that frame over them (Spark cannot nest window functions in one
        expression). The wrapper CTE keeps the original FROM/WHERE (the
        index is a post-WHERE window like any other) and is re-aliased
        to the original table's identifier so qualified references in
        the select list survive unchanged; ORDER BY/LIMIT attach to the
        OUTER query at the parse_query level, preserving
        windows-before-LIMIT evaluation order."""
        if (
            q.group_by
            or q.having is not None
            or q.distinct
            or q.distinct_on
        ):
            raise UnsupportedSqlError(
                "GROUPS window frames over aggregated/DISTINCT queries "
                "are not modeled — wrap the aggregation in a subquery"
            )
        if len(q.from_tables) != 1 or q.joins:
            raise UnsupportedSqlError(
                "GROUPS window frames need a single FROM source "
                "(qualified references must survive the peer-index "
                "rewrite) — wrap the join in a subquery"
            )
        src_tab = q.from_tables[0]
        src = f"__groups_src{next(_GROUPS_COUNTER)}"
        gnames = list(specs.values())
        inner = replace(
            q,
            select=(Q.BaseProjection(Q.SqlExpression("*")),)
            + tuple(
                Q.BaseProjection(
                    Q.SqlExpression(f"dense_rank() OVER ({spec})"), gname
                )
                for spec, gname in specs.items()
            ),
        )
        out_sel: list[Q.BaseProjection] = []
        for p in q.select:
            if p.alias is None and p.expr.sql == "*":
                # drop only the synthetic peer indexes from a star
                out_sel.append(
                    Q.BaseProjection(
                        Q.SqlExpression(f"* EXCEPT ({', '.join(gnames)})")
                    )
                )
            elif p.alias is None and p.expr.sql.endswith(".*"):
                raise UnsupportedSqlError(
                    "alias.* together with GROUPS window frames is not "
                    "modeled — list the columns"
                )
            else:
                out_sel.append(p)
        return Q.SqlQuery(
            select=tuple(out_sel),
            from_tables=(
                Q.TableReference(src, alias=src_tab.identifier, virtual=True),
            ),
            ctes=(Q.CommonTableExpression(src, inner),),
        )

    def _desugar_qualify(
        self,
        q: Q.SqlQuery,
        pred: Q.AbstractPredicate,
        named: dict[str, "_Expr"],
    ) -> Q.SqlQuery:
        """QUALIFY → the textbook two-level rewrite: the inner query keeps
        the full select list plus the predicate as a boolean marker column
        (window functions evaluate there; a select-alias reference inside
        the predicate resolves as a lateral column alias), the outer level
        filters on the marker and projects the original output names.
        Requires derivable output names — plain/qualified columns or
        explicit aliases (star selects reject loudly)."""
        star_select = (
            len(q.select) == 1
            and q.select[0].alias is None
            and q.select[0].expr.sql == "*"
        )
        names: list[str] = []
        if not star_select:
            for p in q.select:
                text = p.expr.sql
                name = p.alias
                if name is None:
                    m = re.fullmatch(r"(?:[\w$]+\.)?([\w$]+)", text)
                    if m is None:
                        raise UnsupportedSqlError(
                            "QUALIFY requires every select item to be a "
                            "plain column or carry an alias (output names "
                            "feed the post-filter projection)"
                        )
                    name = m.group(1)
                names.append(name)
            if len(set(names)) != len(names):
                raise UnsupportedSqlError(
                    "QUALIFY with duplicate output column names is not "
                    "modeled"
                )
        pred_sql = pred.to_sql()
        for wname, spec in named.items():
            pred_sql = pred_sql.replace(
                f"OVER {_winref_marker(wname)}", f"OVER ({spec.sql})"
            )
        tag = next(_QUALIFY_COUNTER)
        marker = f"__qualify{tag}"
        src = f"__qualify_src{tag}"
        inner = replace(
            q,
            select=tuple(q.select)
            + (
                Q.BaseProjection(
                    Q.SqlExpression(pred_sql, tuple(pred.columns())), marker
                ),
            ),
        )
        return Q.SqlQuery(
            # a bare `SELECT *` outer level drops only the marker (wave-8
            # probe: QUALIFY over a star select) — Spark's `* EXCEPT`
            # projects everything else without needing the source schema
            select=(
                (Q.BaseProjection(Q.SqlExpression(f"* EXCEPT ({marker})")),)
                if star_select
                else tuple(
                    Q.BaseProjection(Q.SqlExpression(n)) for n in names
                )
            ),
            from_tables=(Q.TableReference(src, virtual=True),),
            where=Q.UnaryPredicate(
                Q.UnaryOperation.BARE, Q.SqlExpression(marker)
            ),
            ctes=(Q.CommonTableExpression(src, inner),),
        )

    def _parse_order_limit(
        self,
    ) -> tuple[
        tuple[Q.OrderByExpression, ...], int | None, int | None, str, bool
    ]:
        order_by: list[Q.OrderByExpression] = []
        if self.t.accept("order", "by"):
            if self.t.peek_kw() == "all":
                # ORDER BY ALL (DuckDB/Spark shorthand): sort by every
                # select item in list order; expanded at the parse_query
                # level where the (leftmost) select list is known
                self.t.next()
                ascending = not self.t.accept("desc")
                if ascending:
                    self.t.accept("asc")
                nf: bool | None = None
                if self.t.accept("nulls", "first"):
                    nf = True
                elif self.t.accept("nulls", "last"):
                    nf = False
                order_by.append(
                    Q.OrderByExpression(
                        Q.SqlExpression(_ORDER_ALL_MARKER), ascending, nf
                    )
                )
            else:
                while True:
                    expr = self._parse_value_or_predicate()
                    # a named-window marker here is legal when the query
                    # is a single SELECT (its WINDOW map is captured on
                    # self) — parse_query resolves or rejects once the
                    # operand shape is known
                    ascending = True
                    if self.t.accept("desc"):
                        ascending = False
                    else:
                        self.t.accept("asc")
                    nulls_first: bool | None = None
                    if self.t.accept("nulls", "first"):
                        nulls_first = True
                    elif self.t.accept("nulls", "last"):
                        nulls_first = False
                    order_by.append(
                        Q.OrderByExpression(
                            expr.to_qal(), ascending, nulls_first
                        )
                    )
                    if not self.t.accept(","):
                        break
        limit: int | None = None
        offset: int | None = None
        fetch_direction = "first"
        fetch_ties = False
        # OFFSET may precede or follow LIMIT/FETCH (ANSI allows OFFSET first)
        if self.t.accept("offset"):
            offset = int(self.t.next())
            self.t.accept("rows") or self.t.accept("row")
        if self.t.accept("limit"):
            limit_tok = self.t.next()
            if self.t.peek() == "%" or self.t.peek_kw() == "percent":
                # LIMIT 10% (DuckDB) needs the total row count before it
                # can cut — a second pass no single-plan compile has
                raise UnsupportedSqlError(
                    "percent LIMIT is not modeled — spell the fraction "
                    "with a window: QUALIFY row_number() OVER (ORDER BY "
                    "...) <= ceil(0.10 * count(*) OVER ())"
                )
            limit = int(limit_tok)
        elif self.t.accept("fetch"):
            # FETCH {FIRST|NEXT|PRIOR|LAST} n {ROW|ROWS} ONLY (ref Limit
            # :7552, FetchDirection :7548). FIRST/NEXT are both the
            # canonical forward direction; PRIOR/LAST select from the END
            # of the result order — the algebra layer compiles them via
            # the sort-inversion rewrite (requires ORDER BY)
            if self.t.accept("prior"):
                fetch_direction = "prior"
            elif self.t.accept("last"):
                fetch_direction = "last"
            elif not (self.t.accept("first") or self.t.accept("next")):
                raise UnsupportedSqlError(
                    "FETCH requires a direction: FIRST/NEXT/PRIOR/LAST"
                )
            # ANSI: the count may be omitted — FETCH FIRST ROW ONLY = 1
            if self.t.peek_kw() in ("row", "rows"):
                limit = 1
            else:
                limit = int(self.t.next())
            self.t.accept("rows") or self.t.accept("row")
            # WITH TIES (extension beyond the reference's Limit clause,
            # which models ONLY, qal/_qal.py:7552): also return rows tied
            # with the last in-window row under the ORDER BY. ANSI allows
            # it only for the forward direction.
            if self.t.accept("with"):
                self.t.expect("ties")
                if fetch_direction != "first":
                    raise UnsupportedSqlError(
                        "FETCH PRIOR/LAST ... WITH TIES is not modeled — "
                        "ANSI ties apply to FETCH FIRST/NEXT only"
                    )
                fetch_ties = True
            else:
                self.t.expect("only")
        if offset is None and self.t.accept("offset"):
            offset = int(self.t.next())
            self.t.accept("rows") or self.t.accept("row")
        return tuple(order_by), limit, offset, fetch_direction, fetch_ties

    # ---- FROM ------------------------------------------------------------

    def _parse_tablesample(
        self,
    ) -> tuple[float | None, int | None, int | None] | None:
        """``TABLESAMPLE [BERNOULLI] (p [PERCENT] | n ROWS)
        [REPEATABLE(seed)]`` — extension beyond the reference (which does
        not model sampling). Returns (percent, rows, seed) or None.
        SYSTEM is accepted as a synonym: Spark's ``df.sample`` is
        row-level Bernoulli, the right semantics at any partition count
        (block sampling is a storage-locality artifact)."""
        if self.t.peek_kw() != "tablesample":
            return None
        self.t.next()
        if self.t.peek_kw() in ("bernoulli", "system"):
            self.t.next()
        self.t.expect("(")
        value = self.t.next()
        pct: float | None = None
        rows: int | None = None
        if self.t.accept("rows") or self.t.accept("row"):
            rows = int(value)
        else:
            self.t.accept("percent")
            pct = float(value)
            if not 0 <= pct <= 100:
                raise ParserError(
                    f"TABLESAMPLE percentage {pct} outside [0, 100]"
                )
        self.t.expect(")")
        seed: int | None = None
        if self.t.accept("repeatable"):
            self.t.expect("(")
            seed = int(self.t.next())
            self.t.expect(")")
        return pct, rows, seed

    def _parse_using_sample(
        self,
    ) -> tuple[float | None, int | None, int | None] | None:
        """DuckDB's ``USING SAMPLE n [ROWS] | p% | p PERCENT`` source
        suffix (wave-28) — same fields as TABLESAMPLE. The bare-number
        form defaults to ROWS (DuckDB's reservoir sampling: an exact
        whole-relation row count). Method/seed parens reject loudly —
        their selection is engine-specific."""
        if not (
            self.t.peek_kw() == "using" and self.t.peek_kw(1) == "sample"
        ):
            return None
        self.t.next()
        self.t.next()
        value = self.t.next()
        pct: float | None = None
        rows: int | None = None
        if self.t.peek() == "%":
            self.t.next()
            pct = float(value)
        elif self.t.accept("percent"):
            pct = float(value)
        else:
            self.t.accept("rows") or self.t.accept("row")
            rows = int(value)
        if pct is not None and not 0 <= pct <= 100:
            raise ParserError(f"sample percentage {pct} outside [0, 100]")
        if self.t.peek() == "(":
            raise UnsupportedSqlError(
                "USING SAMPLE method/seed parentheses are not modeled — "
                "row selection is engine-specific; use TABLESAMPLE "
                "REPEATABLE for a seeded Bernoulli sample"
            )
        return pct, rows, None

    def _at_pivot_kw(self) -> bool:
        """True when the next tokens open a PIVOT/UNPIVOT clause (so the
        keyword must not be eaten as an implicit source alias)."""
        return self.t.peek_kw() in ("pivot", "unpivot") and (
            self.t.peek(1) == "(" or self.t.peek_kw(1) == "include"
        )

    def _at_asof_kw(self) -> bool:
        """True when the next tokens open an ASOF join (contextual
        keyword — `FROM t asof` as a bare alias stays an alias unless a
        join keyword follows)."""
        return self.t.peek_kw() == "asof" and self.t.peek_kw(1) in (
            "join",
            "left",
            "inner",
        )

    def _asof_spec(self, right, cond) -> "Q.AsofSpec":
        """ASOF [LEFT] JOIN (DuckDB dialect; the reference has no asof
        construct). For each probe row, pick the single right-side row
        closest in the ordering column among those matching the equality
        conditions: the ONE inequality conjunct names the ordering
        column (a plain qualified column of the right side), the rest
        must be equality match keys. The spec rides the JoinedTable into
        the algebra layer, which compiles the union–window composition
        (one shuffle on the match keys — never an inequality nested
        loop, never a within-key pairs blow-up)."""
        if not isinstance(right, Q.TableReference):
            raise UnsupportedSqlError(
                "ASOF JOIN's right side must be a base table or derived "
                "table"
            )
        ident = right.identifier
        leaves = list(cond.conjuncts())
        comparisons = (
            Q.LogicalOperator.LT,
            Q.LogicalOperator.LE,
            Q.LogicalOperator.GT,
            Q.LogicalOperator.GE,
        )
        ineq = [
            l
            for l in leaves
            if isinstance(l, Q.BinaryPredicate) and l.operation in comparisons
        ]
        if len(ineq) != 1:
            raise UnsupportedSqlError(
                "ASOF JOIN needs exactly ONE inequality condition (it "
                f"defines the as-of ordering); found {len(ineq)}"
            )
        leaf = ineq[0]

        def _plain_right_col(e) -> str | None:
            s = e.to_sql().strip()
            if not re.fullmatch(r"[A-Za-z_]\w*\.[A-Za-z_]\w*", s):
                return None
            if s.split(".")[0].lower() != ident.lower():
                return None
            return s

        rc = _plain_right_col(leaf.rhs)
        flipped = False
        if rc is None:
            rc = _plain_right_col(leaf.lhs)
            flipped = True
        if rc is None:
            raise UnsupportedSqlError(
                "the ASOF inequality must compare against a plain, "
                f"qualified column of the right side ({ident!r}) — e.g. "
                "probe.ts >= right.ts"
            )
        op = leaf.operation
        probe_expr = leaf.lhs if not flipped else leaf.rhs
        if flipped:
            op = {
                Q.LogicalOperator.GT: Q.LogicalOperator.LT,
                Q.LogicalOperator.GE: Q.LogicalOperator.LE,
                Q.LogicalOperator.LT: Q.LogicalOperator.GT,
                Q.LogicalOperator.LE: Q.LogicalOperator.GE,
            }[op]
        if probe_expr.columns and any(
            c.table is not None and c.table.identifier.lower() == ident.lower()
            for c in probe_expr.columns
        ):
            raise UnsupportedSqlError(
                "the probe side of the ASOF inequality must not "
                "reference the right table"
            )
        eqs: list[tuple[str, str]] = []
        for other in leaves:
            if other is leaf:
                continue
            if not (
                isinstance(other, Q.BinaryPredicate)
                and other.operation is Q.LogicalOperator.EQ
            ):
                raise UnsupportedSqlError(
                    "ASOF JOIN conditions besides the one inequality "
                    "must be equality match keys"
                )
            r_side = _plain_right_col(other.rhs)
            p_side = other.lhs
            if r_side is None:
                r_side = _plain_right_col(other.lhs)
                p_side = other.rhs
            if r_side is None:
                raise UnsupportedSqlError(
                    "each ASOF equality must compare a probe expression "
                    "to a plain qualified column of the right side"
                )
            if any(
                c.table is not None
                and c.table.identifier.lower() == ident.lower()
                for c in p_side.columns
            ):
                raise UnsupportedSqlError(
                    "the probe side of an ASOF equality must not "
                    "reference the right table"
                )
            eqs.append((p_side.to_sql(), r_side))
        # normalized `probe OP right.ord`: >= / > pick the LATEST right
        # row at-or-before the probe; <= / < the EARLIEST at-or-after
        forward = op in (Q.LogicalOperator.LE, Q.LogicalOperator.LT)
        strict = op in (Q.LogicalOperator.GT, Q.LogicalOperator.LT)
        return Q.AsofSpec(
            eqs=tuple(eqs),
            probe=probe_expr.to_sql(),
            right_ord=rc,
            strict=strict,
            forward=forward,
        )

    def _pivot_source_info(
        self, src, lifted
    ) -> tuple[str, list[str]]:
        """(source SQL text, column list) for a PIVOT/UNPIVOT subject.

        Base tables read their columns from the schema binding passed to
        ``parse_query`` (the implicit group-by-everything-else needs the
        full list — same requirement every engine satisfies from its
        catalog); derived tables read them from their select aliases;
        CTE sources resolve through the scope stack, and a bare-star
        derived table / CTE follows its single source (wave-30)."""
        if isinstance(src, Q.TableReference) and not src.virtual:
            if src.sample_percent is not None or src.sample_rows is not None:
                raise UnsupportedSqlError(
                    "PIVOT/UNPIVOT over TABLESAMPLE is not modeled"
                )
            text = (
                f"{src.full_name} AS {src.alias}"
                if src.alias
                else src.full_name
            )
            return text, self._table_columns(src.full_name, lifted)
        if isinstance(src, Q.TableReference) and src.virtual:
            for alias, sub in lifted:
                if alias != src.full_name:
                    continue
                return alias, self._derived_columns(sub, lifted)
            return src.full_name, self._table_columns(
                src.full_name, lifted
            )
        raise UnsupportedSqlError(
            "PIVOT/UNPIVOT applies to base tables and derived tables only"
        )

    def _table_columns(
        self, name: str, lifted, depth: int = 0
    ) -> list[str]:
        """Column list of a named source: the current select's lifted
        derived tables first, then enclosing CTE scopes (inner shadows
        outer), then the schema binding."""
        if depth > 8:
            raise UnsupportedSqlError(
                "source nesting too deep for column enumeration"
            )
        for alias, sub in lifted:
            if alias == name:
                return self._derived_columns(sub, lifted, depth + 1)
        for scope in reversed(self._cte_scopes):
            body = scope.get(name.lower())
            if body is not None:
                return self._derived_columns(body, lifted, depth + 1)
        cols = self._schema.get(name.lower())
        if cols is None:
            raise UnsupportedSqlError(
                f"PIVOT/UNPIVOT/star expansion over {name!r} needs a "
                "schema binding to enumerate its columns — pass schema= "
                "to parse_query"
            )
        return list(cols)

    def _derived_columns(self, sub, lifted, depth: int = 0) -> list[str]:
        """Output column names of a parsed subquery; a bare-star select
        over one source follows that source (wave-30)."""
        if depth > 8:
            raise UnsupportedSqlError(
                "source nesting too deep for column enumeration"
            )
        if not isinstance(sub, Q.SqlQuery):
            raise UnsupportedSqlError(
                "PIVOT/UNPIVOT over a set-operation derived table is "
                "not modeled"
            )
        if (
            len(sub.select) == 1
            and sub.select[0].alias is None
            and sub.select[0].expr.sql == "*"
            and len(sub.from_tables) == 1
            and not sub.joins
        ):
            return self._table_columns(
                sub.from_tables[0].full_name, lifted, depth + 1
            )
        cols = []
        for p in sub.select:
            if p.alias:
                cols.append(p.alias)
                continue
            s = p.expr.to_sql().strip()
            if not re.fullmatch(r"[A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*", s):
                raise UnsupportedSqlError(
                    "PIVOT/UNPIVOT over a derived table needs plain "
                    "column names or aliases in its select list "
                    f"(got {s!r})"
                )
            cols.append(s.split(".")[-1])
        return cols

    def _desugar_pivot(self, src, lifted):
        """FROM-postfix ``PIVOT (agg FOR key IN (...))`` / ``UNPIVOT
        [INCLUDE NULLS] (val FOR key IN (...))`` — the spelling Spark and
        DuckDB share (extension beyond the reference, which has no pivot
        construct; its users hand-write the CASE form this desugars to).

        PIVOT compiles to ONE hash aggregate over the remaining columns
        with a filtered-CASE aggregate per IN item (exactly the physical
        plan Spark's own PIVOT clause produces: map-side partials, no
        second value-discovery pass — the IN list is static). UNPIVOT
        compiles to a single-scan index explode + CASE pickers (never one
        re-scan per unpivoted column)."""
        kind = self.t.next().lower()
        include_nulls = False
        if kind == "unpivot" and self.t.peek_kw() == "include":
            self.t.next()
            self.t.expect("nulls")
            include_nulls = True
        self.t.expect("(")
        src_text, cols = self._pivot_source_info(src, lifted)

        def _item_name(lit_sql: str, explicit: str | None) -> str:
            if explicit:
                return explicit
            s = lit_sql.strip()
            if re.fullmatch(r"'[A-Za-z_]\w*'", s):
                return s[1:-1]
            raise UnsupportedSqlError(
                f"IN item {s} does not name a plain result column — "
                "add an AS alias (both engines derive column names "
                "from the item text; only identifier-shaped string "
                "literals map cleanly)"
            )

        if kind == "pivot":
            fn = _ident(self.t.next()).lower()
            self.t.expect("(")
            if self.t.accept("distinct"):
                raise UnsupportedSqlError(
                    "DISTINCT aggregates inside PIVOT are not modeled"
                )
            if self.t.peek() == "*":
                self.t.next()
                arg = None
                if fn != "count":
                    raise UnsupportedSqlError(f"{fn}(*) is not an aggregate")
            else:
                arg = self._parse_expression()
            self.t.expect(")")
            if self.t.peek_kw() != "for":
                raise UnsupportedSqlError(
                    "PIVOT supports a single unaliased aggregate "
                    "(multi-aggregate pivots are not modeled)"
                )
            self.t.expect("for")
            key = self._parse_expression()
            self.t.expect("in")
            self.t.expect("(")
            items: list[tuple[str, str]] = []
            while True:
                lit = self._parse_expression()
                explicit = None
                if self.t.accept("as"):
                    explicit = _ident(self.t.next())
                items.append((lit.sql, _item_name(lit.sql, explicit)))
                if not self.t.accept(","):
                    break
            self.t.expect(")")
            self.t.expect(")")
            consumed = {c.name.lower() for c in key.cols}
            if arg is not None:
                consumed |= {c.name.lower() for c in arg.cols}
            groups = [c for c in cols if c.lower() not in consumed]
            arg_sql = "1" if arg is None else arg.sql
            pivots = [
                f"{fn}(CASE WHEN {key.sql} = {lit} THEN {arg_sql} END) "
                f"AS {name}"
                for lit, name in items
            ]
            body = "SELECT " + ", ".join(groups + pivots)
            body += f" FROM {src_text}"
            if groups:
                body += " GROUP BY " + ", ".join(groups)
        else:
            val_name = _ident(self.t.next())
            self.t.expect("for")
            key_name = _ident(self.t.next())
            self.t.expect("in")
            self.t.expect("(")
            items = []
            while True:
                col = _ident(self.t.next())
                label = col
                if self.t.accept("as"):
                    label = _ident(self.t.next())
                items.append((col, label))
                if not self.t.accept(","):
                    break
            self.t.expect(")")
            self.t.expect(")")
            unpivoted = {c.lower() for c, _ in items}
            others = [c for c in cols if c.lower() not in unpivoted]
            idx = ", ".join(str(i + 1) for i in range(len(items)))
            key_case = (
                "CASE __pbs_unpivot_i "
                + " ".join(
                    f"WHEN {i + 1} THEN '{label}'"
                    for i, (_, label) in enumerate(items)
                )
                + " END"
            )
            val_case = (
                "CASE __pbs_unpivot_i "
                + " ".join(
                    f"WHEN {i + 1} THEN {col}"
                    for i, (col, _) in enumerate(items)
                )
                + " END"
            )
            sel = ", ".join(
                others + [f"{key_case} AS {key_name}", f"{val_case} AS {val_name}"]
            )
            body = (
                f"SELECT {sel} FROM (SELECT *, unnest(array[{idx}]) AS "
                f"__pbs_unpivot_i FROM {src_text}) __pbs_unpivot_s"
            )
            if not include_nulls:
                body += f" WHERE {val_case} IS NOT NULL"

        if self.t.accept("as"):
            alias = _ident(self.t.next())
        elif self.t.at_ident() and not self._at_pivot_kw():
            alias = _ident(self.t.next())
        else:
            self._cte_counter += 1
            alias = f"__pivot{self._cte_counter}"
        sub = _Parser(body, schema=self._schema).parse()
        lifted.append((alias, sub))
        return Q.TableReference(alias, virtual=True)

    def _parse_from(
        self,
    ) -> tuple[
        list[Q.TableReference],
        list[Q.AbstractPredicate],
        list[tuple[str, Q.SqlQuery | Q.SetQuery]],
        list[Q.JoinedTable],
    ]:
        tables: list[Q.TableReference] = []
        join_preds: list[Q.AbstractPredicate] = []
        lifted: list[tuple[str, Q.SqlQuery | Q.SetQuery]] = []
        explicit: list[Q.JoinedTable] = []

        def one_source() -> Q.TableReference:
            src = bare_source()
            # PIVOT/UNPIVOT postfix operators (ANSI-ish shared
            # Spark/DuckDB spelling); chainable — a pivoted source can
            # be unpivoted again
            while self.t.peek_kw() in ("pivot", "unpivot") and (
                self.t.peek(1) == "(" or self.t.peek_kw(1) == "include"
            ):
                src = self._desugar_pivot(src, lifted)
            return src

        def bare_source() -> Q.TableReference:
            if self.t.accept("lateral"):
                # correlated subquery in FROM (ref SubqueryTableSource
                # qal/_qal.py:6270, lateral flag) — modeled structurally;
                # the algebra converter decorrelates it into a join
                self.t.expect("(")
                sub = self.parse_query()
                self.t.expect(")")
                if not isinstance(sub, Q.SqlQuery):
                    raise UnsupportedSqlError(
                        "LATERAL over a set query is not modeled"
                    )
                alias, cols = self._parse_source_alias(default="lat")
                return Q.SubqueryTableSource(sub, alias, lateral=True, columns=cols)
            if self.t.accept("("):
                if self.t.peek_kw() == "values":
                    # inline VALUES relation (ref ValuesTableSource :6436)
                    src = self._parse_values()
                    self.t.expect(")")
                    alias, cols = self._parse_source_alias(default="v")
                    return Q.ValuesTableSource(src, alias, cols)
                # FROM-subquery → synthetic CTE (SubqueryTableSource analog,
                # ref qal/_qal.py:6270)
                sub = self.parse_query()
                self.t.expect(")")
                self.t.accept("as")
                if (
                    not self.t.at_ident()
                    or self._at_pivot_kw()
                    or self._at_asof_kw()
                ):
                    self._cte_counter += 1
                    alias = f"__subquery{self._cte_counter}"
                else:
                    alias = _ident(self.t.next())
                lifted.append((alias, sub))
                return Q.TableReference(alias, virtual=True)
            name = _ident(self.t.next())
            if self.t.peek() == "(":
                # table function (ref FunctionTableSource :6584); range()
                # is the portable spelling, generate_series is normalized
                # to it (inclusive upper bound → hi + 1)
                self.t.next()
                args = []
                if self.t.peek() != ")":
                    args.append(self._parse_expression())
                    while self.t.accept(","):
                        args.append(self._parse_expression())
                self.t.expect(")")
                alias, cols = self._parse_source_alias(default="t")
                exprs = [a.to_qal() for a in args]
                if name == "generate_series":
                    if len(exprs) not in (1, 2, 3):
                        raise UnsupportedSqlError(
                            "generate_series(lo, hi[, step]) expects 1-3 "
                            "arguments"
                        )
                    if len(exprs) == 3:
                        # stepped series (wave-19): DuckDB's bound is
                        # INCLUSIVE, Spark range()'s EXCLUSIVE — the
                        # adjustment direction needs the step's sign, so
                        # the step must be a literal integer
                        lo, hi, step = exprs
                        st = step.to_sql().strip()
                        if re.fullmatch(r"-\d+", st):
                            end = f"{hi.to_sql()} - 1"
                        elif re.fullmatch(r"\d+", st) and st != "0":
                            end = f"{hi.to_sql()} + 1"
                        else:
                            raise UnsupportedSqlError(
                                "generate_series step must be a nonzero "
                                "literal integer (the inclusive→exclusive "
                                "bound adjustment needs its sign)"
                            )
                        name = "range"
                        exprs = [
                            lo,
                            Q.SqlExpression(end, hi.columns),
                            step,
                        ]
                    else:
                        lo = exprs[0] if len(exprs) == 2 else Q.lit(0)
                        hi = exprs[-1]
                        name = "range"
                        exprs = [
                            lo,
                            Q.SqlExpression(f"{hi.to_sql()} + 1", hi.columns),
                        ]
                elif name == "unnest":
                    # set-returning array expansion (ref FunctionTableSource
                    # :6584); compiles to Spark's explode TVF
                    if len(exprs) != 1:
                        raise UnsupportedSqlError("unnest(array) expects 1 argument")
                elif name != "range":
                    raise UnsupportedSqlError(
                        f"table function {name!r} is not supported; use "
                        "range()/generate_series()/unnest() or the registry "
                        "SQL path"
                    )
                return Q.FunctionTableSource(name, tuple(exprs), alias, cols)
            alias = None
            sample = self._parse_tablesample()  # Spark order: before alias
            if self.t.accept("as"):
                alias = _ident(self.t.next())
            elif (
                self.t.at_ident()
                and not self._at_pivot_kw()
                and not self._at_asof_kw()
            ):
                alias = _ident(self.t.next())
            if sample is None:
                sample = self._parse_tablesample()  # Postgres order: after
            if sample is None:
                sample = self._parse_using_sample()  # DuckDB spelling
            if sample is not None:
                pct, rows, seed = sample
                return Q.TableReference(
                    name,
                    alias,
                    sample_percent=pct,
                    sample_rows=rows,
                    sample_seed=seed,
                )
            return Q.TableReference(name, alias)

        def join_type() -> Q.JoinType | None:
            """Consume a join-type prefix if one is next; None otherwise."""
            kw = self.t.peek_kw()
            if kw == "natural":
                self.t.next()
                direction = "NATURAL"
                if self.t.accept("left"):
                    direction = "NATURAL_LEFT"
                elif self.t.accept("right"):
                    direction = "NATURAL_RIGHT"
                elif self.t.accept("full"):
                    direction = "NATURAL_FULL"
                elif self.t.accept("inner"):
                    pass
                self.t.accept("outer")
                self.t.expect("join")
                return Q.JoinType[direction]
            if kw in ("left", "right", "full"):
                self.t.next()
                self.t.accept("outer")
                self.t.expect("join")
                return Q.JoinType[kw.upper()]
            if kw == "inner":
                self.t.next()
                self.t.expect("join")
                return Q.JoinType.INNER
            if kw == "cross":
                self.t.next()
                self.t.expect("join")
                return Q.JoinType.CROSS
            if kw == "join":
                self.t.next()
                return Q.JoinType.INNER
            return None

        first = one_source()
        tables.append(first)
        n_comma_items = 1
        # one entry per FROM comma item: join links attached to that item.
        # ``scope`` tracks the identifiers visible to an ON condition — the
        # item's own source plus every table already joined in ITS chain
        # (SQL scoping: joins bind tighter than the FROM comma, so
        # ``FROM a, b JOIN c ON p`` resolves p against {b, c} only).
        chain: list[
            tuple[Q.JoinType, object, Q.AbstractPredicate | None,
                  tuple[str, ...], "Q.AsofSpec | None"]
        ] = []
        scope: set[str] = {first.identifier}
        while True:
            if self.t.accept(","):
                src = one_source()
                tables.append(src)
                n_comma_items += 1
                scope = {src.identifier}  # comma starts a new join-chain group
                continue
            if self._at_asof_kw():
                self.t.next()
                left_join = bool(self.t.accept("left"))
                if left_join:
                    self.t.accept("outer")
                else:
                    self.t.accept("inner")
                self.t.expect("join")
                right = bare_source()
                self.t.expect("on")
                asof_cond = self._parse_predicate()
                out_of_scope = (
                    asof_cond.tables() - scope - {right.identifier}
                )
                if out_of_scope:
                    raise UnsupportedSqlError(
                        f"ASOF ON condition references tables outside "
                        f"its join-chain scope: {sorted(out_of_scope)}"
                    )
                spec = self._asof_spec(right, asof_cond)
                scope.add(right.identifier)
                chain.append(
                    (
                        Q.JoinType.LEFT if left_join else Q.JoinType.INNER,
                        right,
                        asof_cond,
                        (),
                        spec,
                    )
                )
                continue
            jt = join_type()
            if jt is None:
                break
            src = one_source()
            scope.add(src.identifier)
            cond: Q.AbstractPredicate | None = None
            using: tuple[str, ...] = ()
            if jt in (Q.JoinType.INNER, Q.JoinType.LEFT,
                      Q.JoinType.RIGHT, Q.JoinType.FULL):
                if self.t.accept("using"):
                    self.t.expect("(")
                    cols = [_ident(self.t.next())]
                    while self.t.accept(","):
                        cols.append(_ident(self.t.next()))
                    self.t.expect(")")
                    using = tuple(cols)
                else:
                    self.t.expect("on")
                    cond = self._parse_predicate()
                    out_of_scope = cond.tables() - scope
                    if out_of_scope:
                        # Postgres/DuckDB reject this (invalid reference in
                        # ON); accepting it would execute with a join
                        # association no engine has
                        raise UnsupportedSqlError(
                            f"ON condition references tables outside its "
                            f"join-chain scope: {sorted(out_of_scope)} "
                            f"(visible: {sorted(scope)})"
                        )
            chain.append((jt, src, cond, using, None))

        # Normalize INNER/CROSS chains into implicit form (the reference's
        # explicit_to_implicit rewrite, transform.py:172) ONLY when the
        # whole chain is inner and ON-based. As soon as any outer/natural/
        # USING link exists, every link stays explicit, for three confirmed
        # reasons:
        # - RIGHT/FULL links preserve their right side; a normalized
        #   ON-condition in WHERE null-evaluates on the null-extended rows
        #   and drops them (an ON condition keeps them);
        # - even before a LEFT link, normalization re-associates the FROM:
        #   a later ON referencing a non-adjacent normalized table renders
        #   as SQL whose ON scope no engine accepts
        #   ("FROM a, b LEFT JOIN c ON c.x = a.x" — a is out of scope);
        # - USING merges its key columns into ONE output column; a WHERE
        #   equality keeps both, changing the star projection and making
        #   unqualified key references ambiguous.
        all_inner = all(
            jt in (Q.JoinType.INNER, Q.JoinType.CROSS)
            and not using
            and spec is None
            for jt, _src, _cond, using, spec in chain
        )
        if chain and not all_inner and n_comma_items >= 2:
            # The IR stores explicit joins as ONE flat list applied after
            # every comma item, discarding which comma group each link
            # belongs to. For inner chains that is semantics-preserving
            # (they normalize to implicit form below); for outer/NATURAL/
            # USING links it re-associates the join — a RIGHT/FULL join's
            # preserved side would multiply by the unrelated comma items
            # ("FROM a, b RIGHT JOIN c ON p" would null-extend a too), and
            # the rendered SQL re-parses with a different association. The
            # reference models per-group joins via pglast; here the mixed
            # shape is rejected rather than silently mis-executed.
            raise UnsupportedSqlError(
                "comma-separated FROM items can only combine with explicit "
                "join chains that normalize to implicit form (inner ON "
                "joins); outer/NATURAL/USING chains next to comma items "
                "would re-associate — rewrite the FROM as a single chain"
            )
        for jt, src, cond, using, spec in chain:
            if all_inner:
                tables.append(src)
                if cond is not None:
                    join_preds.append(cond)
                continue
            explicit.append(Q.JoinedTable(jt, src, cond, using, spec))
        return tables, join_preds, lifted, explicit

    def _parse_values(self) -> tuple[tuple[Q.SqlExpression, ...], ...]:
        self.t.expect("values")
        rows: list[tuple[Q.SqlExpression, ...]] = []
        while True:
            self.t.expect("(")
            row = [self._parse_expression().to_qal()]
            while self.t.accept(","):
                row.append(self._parse_expression().to_qal())
            self.t.expect(")")
            rows.append(tuple(row))
            if not self.t.accept(","):
                break
        return tuple(rows)

    def _parse_source_alias(self, default: str) -> tuple[str, tuple[str, ...]]:
        """``[AS] alias[(col, ...)]`` after a VALUES / table-function /
        subquery source."""
        self.t.accept("as")
        alias = _ident(self.t.next()) if self.t.at_ident() else default
        cols: tuple[str, ...] = ()
        if self.t.peek() == "(":
            self.t.next()
            names = [_ident(self.t.next())]
            while self.t.accept(","):
                names.append(_ident(self.t.next()))
            self.t.expect(")")
            cols = tuple(names)
        return alias, cols

    def _parse_projection(self) -> Q.BaseProjection:
        if self.t.peek() == "*":
            self.t.next()
            # `* EXCLUDE (cols)` (DuckDB) / `* EXCEPT (cols)` (Spark) —
            # carried in Spark's spelling; EXCEPT-the-set-operator is
            # disambiguated by the parenthesized IDENTIFIER list
            if (
                self.t.peek_kw() in ("exclude", "except")
                and self.t.peek(1) == "("
                and (self.t.peek_kw(2) or "") not in ("select", "with")
            ):
                self.t.next()
                self.t.expect("(")
                cols = [_ident(self.t.next())]
                while self.t.accept(","):
                    cols.append(_ident(self.t.next()))
                self.t.expect(")")
                return Q.BaseProjection(
                    Q.SqlExpression("* EXCEPT (" + ", ".join(cols) + ")")
                )
            if self.t.peek_kw() == "replace" and self.t.peek(1) == "(":
                # `* REPLACE (expr AS col, ...)` (DuckDB, wave-28):
                # every column, with the named ones replaced IN PLACE.
                # Expansion needs the source's column list, known only
                # after FROM parses — a marker defers it to the end of
                # this _parse_select.
                self.t.next()
                self.t.expect("(")
                pairs: list[tuple[_Expr, str]] = []
                while True:
                    e = self._parse_value_or_predicate()
                    self.t.expect("as")
                    pairs.append((e, _ident(self.t.next())))
                    if not self.t.accept(","):
                        break
                self.t.expect(")")
                self._star_marker_n += 1
                marker = f"__star_replace_{self._star_marker_n}"
                self._star_expansions[marker] = ("replace", pairs)
                return Q.BaseProjection(Q.SqlExpression(marker))
            return Q.star()
        if (
            self.t.peek_kw() == "columns"
            and self.t.peek(1) == "("
            and (self.t.peek(2) or "").startswith("'")
            and self.t.peek(3) == ")"
        ):
            # COLUMNS('regex') (DuckDB, wave-28): the columns whose name
            # CONTAINS a regex match (partial search, verified), in
            # source order — same deferred-expansion mechanism
            self.t.next()
            self.t.next()
            pattern = self.t.next()[1:-1]
            self.t.expect(")")
            try:
                rx = re.compile(pattern)
            except re.error as exc:
                raise UnsupportedSqlError(
                    f"COLUMNS regex {pattern!r} does not compile: {exc}"
                )
            self._star_marker_n += 1
            marker = f"__star_columns_{self._star_marker_n}"
            self._star_expansions[marker] = ("columns", rx)
            return Q.BaseProjection(Q.SqlExpression(marker))
        # t.* projection
        if (
            self.t.at_ident()
            and self.t.peek(1) == "."
            and self.t.peek(2) == "*"
        ):
            tab = _ident(self.t.next())
            self.t.next()
            self.t.next()
            return Q.BaseProjection(Q.SqlExpression(f"{tab}.*"))
        # boolean-valued select items (ANSI: a predicate is an expression
        # of type boolean — `SELECT a > b`, `SELECT x IN (…)`,
        # `SELECT EXISTS (…)`): parse through the predicate grammar and
        # carry the rendered text; plain items keep the expression path
        if (
            self.t.peek_kw() == "exists" and self.t.peek(1) == "("
        ) or self.t.peek_kw() == "not":
            qal = self._projection_predicate(None)
        else:
            expr = self._parse_expression()
            tail_tok = self.t.peek()
            tail_kw = self.t.peek_kw()
            if tail_tok in (
                "=", "<>", "!=", "<", "<=", ">", ">=", "@>", "<@", "&&",
            ) or tail_kw in (
                "in", "between", "like", "ilike", "similar", "rlike", "is", "not",
            ):
                qal = self._projection_predicate(expr)
            else:
                qal = expr.to_qal()
        alias = None
        if self.t.accept("as"):
            alias = _ident(self.t.next())
        elif self.t.at_ident():
            alias = _ident(self.t.next())
        return Q.BaseProjection(qal, alias)

    def _projection_predicate(self, expr) -> Q.SqlExpression:
        """Finish a select item as a PREDICATE (boolean expression):
        ``expr``'s comparison/membership tail plus any AND/OR chain, or a
        leading EXISTS when ``expr`` is None. Returns the rendered
        boolean expression."""
        if expr is None:
            pred = self._parse_not()
        else:
            pred = self._parse_predicate_tail(expr)
        while True:
            if self.t.accept("and"):
                pred = Q.and_(pred, self._parse_not())
            elif self.t.accept("or"):
                rhs = self._parse_and()
                pred = Q.CompoundPredicate(
                    Q.CompoundOperator.OR, (pred, rhs)
                )
            else:
                break
        return Q.SqlExpression(pred.to_sql(), tuple(pred.columns()))

    # ---- predicates ------------------------------------------------------

    def _parse_predicate(self) -> Q.AbstractPredicate:
        return self._parse_or()

    def _parse_or(self) -> Q.AbstractPredicate:
        children = [self._parse_and()]
        while self.t.accept("or"):
            children.append(self._parse_and())
        if len(children) == 1:
            return children[0]
        return Q.CompoundPredicate(Q.CompoundOperator.OR, tuple(children))

    def _parse_and(self) -> Q.AbstractPredicate:
        children = [self._parse_not()]
        while self.t.accept("and"):
            children.append(self._parse_not())
        return children[0] if len(children) == 1 else Q.and_(*children)

    def _parse_not(self) -> Q.AbstractPredicate:
        if self.t.accept("not"):
            return Q.CompoundPredicate(
                Q.CompoundOperator.NOT, (self._parse_not(),)
            )
        return self._parse_atom()

    def _parse_atom(self) -> Q.AbstractPredicate:
        if self.t.accept("exists"):
            self.t.expect("(")
            sub = self.parse_query()
            self.t.expect(")")
            return Q.UnaryPredicate(Q.UnaryOperation.EXISTS, subquery=sub)
        if self.t.peek() == "(":
            # (predicate) or (expr) — try predicate first, backtrack if the
            # paren turns out to be an arithmetic/comparison operand
            mark = self.t.i
            self.t.next()
            try:
                inner = self._parse_or()
                self.t.expect(")")
            except ParserError:
                self.t.i = mark
            else:
                nxt = self.t.peek_kw()
                # (pred) IS [NOT] TRUE/FALSE/UNKNOWN — the ANSI boolean
                # test over a parenthesized predicate; only this IS form
                # keeps the predicate reading ((x) IS NULL needs the
                # expression re-parse below)
                if nxt == "is" and self.t.peek_kw(1) in (
                    "true", "false", "unknown",
                ) or (
                    nxt == "is"
                    and self.t.peek_kw(1) == "not"
                    and self.t.peek_kw(2) in ("true", "false", "unknown")
                ):
                    self.t.next()
                    is_not = self.t.accept("not")
                    word = self.t.next().lower()
                    op = Q.UnaryOperation[
                        f"IS_{'NOT_' if is_not else ''}{word.upper()}"
                    ]
                    wrapped = Q.SqlExpression(
                        f"({inner.to_sql()})",
                        tuple(
                            c
                            for leaf in inner.iterpredicates()
                            for c in leaf.columns()
                        ),
                    )
                    return Q.UnaryPredicate(op, wrapped)
                expr_ops = {
                    "=", "<>", "!=", "<", "<=", ">", ">=", "+", "-", "*",
                    "/", "%", "||", "::", "[", "between", "in", "like",
                    "ilike", "similar", "rlike", "is", "not", "@>", "<@", "&&",
                }
                if nxt not in expr_ops:
                    return inner
                self.t.i = mark  # e.g. "(a + b) > 5" — re-parse as expr
        expr = self._parse_expression()
        return self._parse_predicate_tail(expr)

    def _parse_predicate_tail(self, expr: _Expr) -> Q.AbstractPredicate:
        negated = self.t.accept("not")
        kw = self.t.peek_kw()

        if kw == "between":
            self.t.next()
            symmetric = False
            if self.t.peek_kw() == "symmetric":
                # ANSI BETWEEN SYMMETRIC: bounds sort themselves —
                # desugared via least/greatest at parse time (wave-11:
                # the bare spelling parsed SYMMETRIC as a column and
                # returned silently wrong rows). ASYMMETRIC is the
                # default and simply strips.
                self.t.next()
                symmetric = True
            elif self.t.peek_kw() == "asymmetric":
                self.t.next()
            lower = self._parse_expression()
            self.t.expect("and")
            upper = self._parse_expression()
            if symmetric:
                lo = f"least({lower.sql}, {upper.sql})"
                hi = f"greatest({lower.sql}, {upper.sql})"
                lower = _Expr(lo, lower.cols + upper.cols)
                upper = _Expr(hi, lower.cols)
            pred: Q.AbstractPredicate = Q.BetweenPredicate(
                expr.to_qal(), lower.to_qal(), upper.to_qal()
            )
            return self._negate(pred, negated)

        if kw == "in":
            self.t.next()
            self.t.expect("(")
            if self.t.peek_kw() in ("select", "with"):
                sub = self.parse_query()
                self.t.expect(")")
                if expr.row is not None:
                    # row-valued IN over a subquery (round-10, beyond the
                    # reference — its parser has no RowExpr handling):
                    # the algebra compiles a multi-column semi/anti join
                    return Q.InPredicate(
                        expr.to_qal(),
                        subquery=sub,
                        negated=negated,
                        row_elems=tuple(e.to_qal() for e in expr.row),
                    )
                return Q.InPredicate(
                    expr.to_qal(), subquery=sub, negated=negated
                )
            values = [self._parse_expression()]
            while self.t.accept(","):
                values.append(self._parse_expression())
            self.t.expect(")")
            if expr.row is not None:
                # `(a, b) IN ((1, 2), (3, 4))` — OR over the expanded
                # row equalities (ANSI row-membership semantics)
                alts = tuple(
                    self._row_compare(Q.LogicalOperator.EQ, expr, v)
                    for v in values
                )
                pred = (
                    alts[0]
                    if len(alts) == 1
                    else Q.CompoundPredicate(Q.CompoundOperator.OR, alts)
                )
                return self._negate(pred, negated)
            return Q.InPredicate(
                expr.to_qal(),
                values=tuple(v.to_qal() for v in values),
                negated=negated,
            )

        if kw in ("like", "ilike"):
            self.t.next()
            pattern = self._parse_expression()
            rhs = pattern.to_qal()
            if self.t.accept("escape"):
                # ESCAPE binds directly to the LIKE — carried on the rhs
                # fragment (ANSI text both Spark SQL and DuckDB accept)
                esc = self.t.next()
                rhs = Q.SqlExpression(f"{rhs.sql} ESCAPE {esc}", rhs.columns)
            ops = {
                (False, "like"): Q.LogicalOperator.LIKE,
                (True, "like"): Q.LogicalOperator.NOT_LIKE,
                (False, "ilike"): Q.LogicalOperator.ILIKE,
                (True, "ilike"): Q.LogicalOperator.NOT_ILIKE,
            }
            return Q.BinaryPredicate(
                ops[(negated, kw)], expr.to_qal(), rhs
            )

        if kw == "rlike":
            # Spark's RLIKE spelling — accepted so the engine's own
            # regexp_matches lowering re-parses (wave-20: the lifted
            # scalar-subquery path re-parses lowered spans); DuckDB has
            # no RLIKE, so user-facing oracle entries spell
            # regexp_matches and only internal round-trips hit this
            self.t.next()
            pattern = self._parse_expression()
            pred = Q.UnaryPredicate(
                Q.UnaryOperation.BARE,
                Q.SqlExpression(
                    f"({expr.sql} RLIKE {pattern.sql})",
                    expr.cols + pattern.cols,
                ),
            )
            return self._negate(pred, negated)

        if kw == "similar":
            # SIMILAR TO, DuckDB semantics (the oracle): the pattern is a
            # FULL-match-anchored POSIX regex taken VERBATIM — DuckDB does
            # NOT apply the Postgres `%`→`.*` / `_`→`.` wildcard dialect
            # (wave-9 probe: 'x' SIMILAR TO '%1%' is FALSE there). Pinned
            # to the oracle; the Postgres wildcard reading is a documented
            # divergence. Lowered to regexp_like with ^(…)$ anchors.
            self.t.next()
            self.t.expect("to")
            pattern = self.t.next()
            if not (pattern.startswith("'") and pattern.endswith("'")):
                raise UnsupportedSqlError(
                    "SIMILAR TO requires a literal pattern"
                )
            raw = pattern[1:-1]
            # the IR carries ANSI literals — the compiler doubles
            # backslashes for Spark once, so none are added here
            rx_lit = "'^(" + raw + ")$'"
            pred = Q.UnaryPredicate(
                Q.UnaryOperation.BARE,
                Q.SqlExpression(
                    f"regexp_like({expr.sql}, {rx_lit})", expr.cols
                ),
            )
            return self._negate(pred, negated)

        if negated:
            raise ParserError("dangling NOT before non-predicate tail")

        if kw == "is":
            self.t.next()
            is_not = self.t.accept("not")
            if self.t.accept("null"):
                op = (
                    Q.UnaryOperation.IS_NOT_NULL
                    if is_not
                    else Q.UnaryOperation.IS_NULL
                )
                return Q.UnaryPredicate(op, expr.to_qal())
            if self.t.accept("distinct"):
                self.t.expect("from")
                rhs = self._parse_expression()
                op = (
                    Q.LogicalOperator.IS_NOT_DISTINCT_FROM
                    if is_not
                    else Q.LogicalOperator.IS_DISTINCT_FROM
                )
                return Q.BinaryPredicate(op, expr.to_qal(), rhs.to_qal())
            for word in ("true", "false", "unknown"):
                if self.t.accept(word):
                    op = Q.UnaryOperation[
                        f"IS_{'NOT_' if is_not else ''}{word.upper()}"
                    ]
                    return Q.UnaryPredicate(op, expr.to_qal())
            raise ParserError(
                "expected NULL, DISTINCT FROM, TRUE, FALSE or UNKNOWN after IS"
            )

        comparison = {
            "=": Q.LogicalOperator.EQ,
            "<>": Q.LogicalOperator.NE,
            "!=": Q.LogicalOperator.NE,
            "<": Q.LogicalOperator.LT,
            "<=": Q.LogicalOperator.LE,
            ">": Q.LogicalOperator.GT,
            ">=": Q.LogicalOperator.GE,
            # Postgres array operators (ref qal/_qal.py:55-58) — modeled
            # as ordinary binary predicates; the IR's to_sql() lowers
            # them to Spark's array_except/arrays_overlap spellings
            "@>": Q.LogicalOperator.CONTAINS,
            "<@": Q.LogicalOperator.CONTAINED_BY,
            "&&": Q.LogicalOperator.OVERLAPS,
        }
        tok = self.t.peek()
        if tok in comparison:
            self.t.next()
            op = comparison[tok]
            # quantified comparison: op ANY/ALL (subquery)
            # (ref QuantifierExpression qal/_qal.py:1589)
            qkw = self.t.peek_kw()
            if qkw in ("any", "all", "some"):
                self.t.next()
                self.t.expect("(")
                sub = self.parse_query()
                self.t.expect(")")
                quant = "ANY" if qkw == "some" else qkw.upper()
                # the ANSI identities `= ANY (sub)` ≡ IN and `<> ALL
                # (sub)` ≡ NOT IN route through InPredicate so the
                # algebra's semi/anti-join machinery (incl. the
                # null-aware NOT IN) executes them; other op/quantifier
                # mixes keep the textual QuantifierExpression form
                row = (
                    tuple(e.to_qal() for e in expr.row)
                    if expr.row is not None
                    else ()
                )
                if op is Q.LogicalOperator.EQ and quant == "ANY":
                    return Q.InPredicate(
                        expr.to_qal(), subquery=sub, row_elems=row
                    )
                if op is Q.LogicalOperator.NE and quant == "ALL":
                    return Q.InPredicate(
                        expr.to_qal(), subquery=sub, negated=True,
                        row_elems=row,
                    )
                rhs_sql = f"{quant} ({_inline(sub)})"
                return Q.BinaryPredicate(
                    op, expr.to_qal(), Q.SqlExpression(rhs_sql)
                )
            # a scalar-subquery RHS parses through the ordinary expression
            # grammar (_parse_primary handles `(SELECT …)`), so arithmetic
            # tails — `x >= (SELECT min(y) FROM t) + 1` — compose naturally
            rhs = self._parse_expression()
            if expr.row is not None or rhs.row is not None:
                return self._row_compare(op, expr, rhs)
            return Q.BinaryPredicate(op, expr.to_qal(), rhs.to_qal())

        # bare boolean expression / UDF filter (ref tests/test_qal.py:475)
        return Q.UnaryPredicate(Q.UnaryOperation.BARE, expr.to_qal())

    @staticmethod
    def _row_compare(op, lhs: _Expr, rhs: _Expr) -> Q.AbstractPredicate:
        """Row-value comparison `(a, b) = (c, d)` — expanded to the AND of
        element equalities (ANSI: row equality is pairwise with UNKNOWN
        propagation, which the conjunction preserves); `<>` is its
        three-valued negation. Ordering comparisons expand to the ANSI
        LEXICOGRAPHIC recursion — `(a, rest) < (b, rest')` ≡
        `a < b OR (a = b AND rest < rest')` — whose OR/AND three-valued
        algebra reproduces the standard's UNKNOWN propagation exactly
        (round-10, beyond the reference: no RowExpr in its parser)."""
        if lhs.row is None or rhs.row is None or len(lhs.row) != len(rhs.row):
            raise UnsupportedSqlError(
                "row-value comparison needs row constructors of equal "
                "width on both sides"
            )
        ordering = {
            Q.LogicalOperator.LT: Q.LogicalOperator.LT,
            Q.LogicalOperator.LE: Q.LogicalOperator.LT,
            Q.LogicalOperator.GT: Q.LogicalOperator.GT,
            Q.LogicalOperator.GE: Q.LogicalOperator.GT,
        }
        if op in ordering:
            strict = ordering[op]

            def lex(pairs) -> Q.AbstractPredicate:
                (l, r), rest = pairs[0], pairs[1:]
                if not rest:
                    # the LAST element carries the original operator —
                    # this is what distinguishes <= from <
                    return Q.BinaryPredicate(op, l.to_qal(), r.to_qal())
                return Q.CompoundPredicate(
                    Q.CompoundOperator.OR,
                    (
                        Q.BinaryPredicate(strict, l.to_qal(), r.to_qal()),
                        Q.and_(
                            Q.BinaryPredicate(
                                Q.LogicalOperator.EQ, l.to_qal(), r.to_qal()
                            ),
                            lex(rest),
                        ),
                    ),
                )

            return lex(list(zip(lhs.row, rhs.row)))
        if op not in (Q.LogicalOperator.EQ, Q.LogicalOperator.NE):
            raise UnsupportedSqlError(
                f"row-value comparison with {op.value!r} is not modeled"
            )
        pairs = tuple(
            Q.BinaryPredicate(Q.LogicalOperator.EQ, l.to_qal(), r.to_qal())
            for l, r in zip(lhs.row, rhs.row)
        )
        conj: Q.AbstractPredicate = (
            pairs[0]
            if len(pairs) == 1
            else Q.CompoundPredicate(Q.CompoundOperator.AND, pairs)
        )
        if op is Q.LogicalOperator.EQ:
            return conj
        return Q.CompoundPredicate(Q.CompoundOperator.NOT, (conj,))

    @staticmethod
    def _negate(pred: Q.AbstractPredicate, negated: bool) -> Q.AbstractPredicate:
        if not negated:
            return pred
        return Q.CompoundPredicate(Q.CompoundOperator.NOT, (pred,))

    # ---- expressions -----------------------------------------------------

    def _parse_expression(self) -> _Expr:
        return self._parse_additive()

    def _parse_additive(self) -> _Expr:
        left = self._parse_multiplicative()
        while self.t.peek() in ("+", "-", "||"):
            op = self.t.next()
            if op == "-" and self.t.peek() == ">":
                # JSON arrows (wave-16): `j ->> 'k'` extracts TEXT —
                # exactly Spark's get_json_object. Bare `->` returns a
                # JSON-typed value whose STRING results keep their JSON
                # quotes on DuckDB ('"hi"') where Spark strips them —
                # a silent divergence with no Spark spelling, so it
                # rejects toward the text form.
                self.t.next()
                if not self.t.accept(">"):
                    raise UnsupportedSqlError(
                        "the JSON `->` operator returns JSON-quoted "
                        "strings on DuckDB/Postgres with no exact Spark "
                        "equivalent — use `->>` (text extraction) or a "
                        "full '$.a.b' path with json_extract_string"
                    )
                key = self._parse_unary()
                ktxt = key.sql.strip()
                if re.fullmatch(r"'[^']*'", ktxt):
                    path = f"'$.{ktxt[1:-1]}'"
                elif re.fullmatch(r"\d+", ktxt):
                    path = f"'$[{ktxt}]'"
                else:
                    raise UnsupportedSqlError(
                        "`->>` needs a literal string key or integer "
                        "index"
                    )
                left = _merge(
                    f"get_json_object({left.sql}, {path})", left, key
                )
                continue
            right = self._parse_multiplicative()
            # DATE literal ± INTERVAL yields TIMESTAMP on Postgres/DuckDB
            # where Spark keeps DATE (wave-8 probe find) — promote the
            # DATE side so the result type matches the oracle's
            if op in ("+", "-"):
                l_sql, r_sql = left.sql, right.sql
                if r_sql.upper().startswith("INTERVAL ") and re.match(
                    r"(?i)^DATE\s*'", l_sql
                ):
                    l_sql = f"CAST({l_sql} AS timestamp)"
                elif op == "+" and l_sql.upper().startswith(
                    "INTERVAL "
                ) and re.match(r"(?i)^DATE\s*'", r_sql):
                    r_sql = f"CAST({r_sql} AS timestamp)"
                left = _merge(f"{l_sql} {op} {r_sql}", left, right)
                continue
            left = _merge(f"{left.sql} {op} {right.sql}", left, right)
        return left

    def _parse_multiplicative(self) -> _Expr:
        left = self._parse_power()
        while self.t.peek() in ("*", "/", "%"):
            op = self.t.next()
            if op == "/" and self.t.peek() == "/":
                # DuckDB `//` = integer division truncating toward zero
                # (wave-13; Spark has no operator spelling and `div` is
                # not re-parsable). a - a%b is exactly divisible, so the
                # double division is exact up to 2^53; DuckDB types the
                # result INTEGER where this yields BIGINT (documented,
                # same class as sign()). DuckDB's `//` over DOUBLE
                # degenerates to plain division — integer-only parity.
                self.t.next()
                right = self._parse_power()
                rz = _zero_guard(right.sql)
                left = _merge(
                    f"CAST((({left.sql}) - (({left.sql}) % {rz}))"
                    f" / {rz} AS BIGINT)",
                    left,
                    right,
                )
                continue
            right = self._parse_power()
            if op == "%":
                # DuckDB reads NULL for a zero divisor (x % 0) where
                # Spark's ANSI mode raises — NULLIF(divisor, 0) is the
                # NULL-on-zero contract in a spelling BOTH engines parse
                # (wave-29); _zero_guard keeps the rewrite a fixpoint
                left = _merge(
                    f"{left.sql} % {_zero_guard(right.sql)}",
                    left,
                    right,
                )
                continue
            if op == "/":
                # DuckDB/Postgres `/` is ALWAYS float division (DOUBLE
                # result); Spark keeps DECIMAL when either operand's
                # chain carries a decimal-point literal (wave-8 found
                # the literal case; wave-21 the literal-through-`*`
                # chain, `100.0 * count(*) / total`). Promoting the LEFT
                # operand to DOUBLE makes the result DOUBLE for every
                # numeric input on both engines — identical values,
                # identical typing. INTERVAL division is the one
                # non-numeric `/` and stays verbatim.
                # NULLIF(divisor, 0) carries DuckDB's NULL-on-zero
                # contract (Spark's ANSI `/` raises — wave-29) in a
                # spelling both engines parse; INTERVAL division stays
                # verbatim
                if re.match(r"(?i)\s*INTERVAL\b", left.sql):
                    left = _merge(
                        f"{left.sql} / {right.sql}", left, right
                    )
                    continue
                rz = _zero_guard(right.sql)
                if _is_double_cast(left.sql):
                    # already-promoted operand (the parse→render→parse
                    # fixpoint) must not wrap again
                    left = _merge(f"{left.sql} / {rz}", left, right)
                    continue
                left = _merge(
                    f"CAST({left.sql} AS double) / {rz}",
                    left,
                    right,
                )
                continue
            left = _merge(f"{left.sql} {op} {right.sql}", left, right)
        return left

    def _parse_power(self) -> _Expr:
        # `^` is POWER on Postgres/DuckDB (Spark's `^` is bitwise XOR —
        # a silent-divergence trap, wave-9): left-assoc, binds tighter
        # than * / %, looser than unary minus — matching DuckDB's
        # -2 ^ 2 = 4 and 2 ^ 3 ^ 2 = 64
        left = self._parse_unary()
        while self.t.peek() == "^":
            self.t.next()
            right = self._parse_unary()
            left = _merge(f"power({left.sql}, {right.sql})", left, right)
        return left

    def _parse_unary(self) -> _Expr:
        if self.t.peek() == "-":
            self.t.next()
            inner = self._parse_unary()
            return _Expr(f"-{inner.sql}", inner.cols)
        if self.t.peek() == "+":
            self.t.next()
            return self._parse_unary()
        return self._parse_postfix()

    def _parse_postfix(self) -> _Expr:
        expr = self._parse_primary()
        while True:
            if self.t.peek() == "[":
                # array subscript / slice (ref ArrayAccessExpression :1099)
                self.t.next()
                lower = None
                if self.t.peek() != ":":
                    lower = self._parse_expression()
                # Spark's element/slice index parameters require INT —
                # an expression index over a BIGINT column fails
                # analysis (fuzzer v23 find), so non-literal indexes
                # route through CAST; DuckDB accepts any integral type
                def _idx(sql: str) -> str:
                    if re.fullmatch(r"-?\d+", sql.strip()):
                        return sql
                    return f"CAST({sql} AS INT)"

                if self.t.accept(":"):
                    upper = (
                        self._parse_expression() if self.t.peek() != "]" else None
                    )
                    self.t.expect("]")
                    # DuckDB/Postgres slices are 1-based INCLUSIVE both
                    # ends — Spark's slice(expr, start, length) spelling
                    # (wave-9: the raw [a:b] text is not Spark SQL at all)
                    if lower is not None and upper is not None:
                        body = (
                            f"slice({expr.sql}, {_idx(lower.sql)}, "
                            f"CAST(({upper.sql}) - ({lower.sql}) + 1 "
                            f"AS INT))"
                        )
                    elif upper is not None:
                        body = f"slice({expr.sql}, 1, {_idx(upper.sql)})"
                    elif lower is not None:
                        body = (
                            f"slice({expr.sql}, {_idx(lower.sql)}, "
                            f"size({expr.sql}))"
                        )
                    else:
                        body = expr.sql
                    expr = _merge(
                        body,
                        expr,
                        *(p for p in (lower, upper) if p),
                    )
                else:
                    self.t.expect("]")
                    # DuckDB/Postgres subscripts are 1-BASED with NULL
                    # out of bounds; Spark's raw [i] is 0-based (silent
                    # off-by-one — wave-9). try_element_at is 1-based,
                    # NULL OOB, negative-from-end — exactly DuckDB's
                    # list semantics (index 0 errors loudly on Spark
                    # where DuckDB reads NULL; documented residual).
                    expr = _merge(
                        f"try_element_at({expr.sql}, {_idx(lower.sql)})",
                        expr,
                        lower,
                    )
                continue
            if self.t.peek() == "." and (
                self.t.peek(1) is not None
                and re.match(r"[A-Za-z_\"]", self.t.peek(1) or "")
                and self.t.peek_kw(1) not in _KEYWORDS_STOP
            ):
                # struct FIELD access (wave-25): `(expr).f`, and the
                # third-and-deeper parts of a dotted name the identifier
                # parse stopped at (`t.s.k` = field k of column s).
                # Identical dot spelling on Spark and DuckDB. `.* `
                # (qualified star) never matches — the guard requires an
                # identifier after the dot.
                self.t.next()
                field = _ident(self.t.next())
                base = expr.sql
                if base.lstrip("(").lower().startswith("explode("):
                    # Spark generators are top-level-only select items —
                    # a field access ON the unnest cannot compile
                    raise UnsupportedSqlError(
                        "field access on a SELECT-position unnest is not "
                        "modeled — unnest into a derived table, then "
                        "access the field one level up"
                    )
                if not re.fullmatch(r"[A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*", base):
                    base = f"({base})"
                expr = _Expr(f"{base}.{field}", expr.cols)
                continue
            if self.t.peek() == "::":
                # Postgres cast shorthand → CAST (ref CastExpression :359)
                self.t.next()
                target = self._parse_type_name()
                expr = _Expr(
                    _int_cast(expr.sql, target, False), expr.cols
                )
                continue
            break
        return expr

    def _parse_type_name(self) -> str:
        parts = [_ident(self.t.next())]
        # no at_ident() gate: 'with'/'time' are stop-keywords that
        # at_ident() rejects, which would cut 'timestamp with time zone'
        # short at 'with' — the continuation whitelist below is the guard
        while self.t.peek_kw() in (
            "precision", "varying", "zone", "time", "without", "with",
        ):
            parts.append(_ident(self.t.next()))
        name = " ".join(parts)
        if self.t.accept("("):
            params = [self.t.next()]
            while self.t.accept(","):
                params.append(self.t.next())
            self.t.expect(")")
            name += "(" + ", ".join(params) + ")"
        while self.t.peek() == "[" and self.t.peek(1) == "]":
            self.t.next()
            self.t.next()
            name += "[]"
        return name

    def _parse_primary(self) -> _Expr:
        t = self.t.peek()
        if t is None:
            raise ParserError("unexpected end of expression")
        low = t.lower()

        if t.startswith("'") or re.match(r"\d|\.", t):
            self.t.next()
            return _Expr(t)
        if low in ("null", "true", "false"):
            self.t.next()
            return _Expr(low.upper())

        if low in ("timestamp", "date", "time", "interval") and (
            (self.t.peek(1) or "").startswith("'")
            or (
                low == "interval"
                and re.match(r"^\d", self.t.peek(1) or "")
            )
        ):
            # typed literal; INTERVAL may carry a trailing unit keyword,
            # and accepts the unquoted count spelling (INTERVAL 30 DAY —
            # Spark and DuckDB both take it; normalized to the quoted
            # form so the IR text stays engine-portable)
            self.t.next()
            value = self.t.next()
            if low == "interval" and not value.startswith("'"):
                value = f"'{value}'"
            body = f"{low.upper()} {value}"
            if low == "interval" and self.t.at_ident():
                unit = self.t.peek() or ""
                if unit.lower() in (
                    "year", "years", "month", "months", "day", "days",
                    "hour", "hours", "minute", "minutes", "second", "seconds",
                ):
                    body += f" {_ident(self.t.next()).upper()}"
            return _Expr(body)

        if low == "case":
            return self._parse_case()

        if low in ("cast", "try_cast"):
            self.t.next()
            self.t.expect("(")
            is_pred = False
            if (
                self.t.peek_kw() == "exists" and self.t.peek(1) == "("
            ) or self.t.peek_kw() == "not":
                # CAST over a leading-keyword predicate — `CAST(EXISTS (…)
                # AS INT)`, `CAST(NOT x AS INT)`
                bool_expr = self._projection_predicate(None)
                inner = _Expr(bool_expr.sql, bool_expr.columns)
                is_pred = True
            else:
                inner = self._parse_expression()
            if self.t.peek_kw() != "as":
                # CAST over a boolean-valued predicate — `CAST(x IN (…) AS
                # STRING)`: finish through the predicate grammar
                bool_expr = self._projection_predicate(inner)
                inner = _Expr(bool_expr.sql, bool_expr.columns)
                is_pred = True
            self.t.expect("as")
            target = self._parse_type_name()
            self.t.expect(")")
            if low == "try_cast":
                # TRY_CAST: NULL-on-failure on both engines; DuckDB also
                # ROUNDS to-int. Spark's round() THROWS on non-numeric
                # input, so the rounding rides through an inner
                # TRY_CAST-to-double (NULL flows through round; values
                # beyond 2^53 lose precision — documented edge)
                if not is_pred and target.lower() in _INT_CAST_TARGETS:
                    lowered = (
                        f"TRY_CAST(round(TRY_CAST({inner.sql} AS double)) "
                        f"AS {target})"
                    )
                else:
                    lowered = f"TRY_CAST({inner.sql} AS {target})"
                return _Expr(lowered, inner.cols)
            return _Expr(
                _int_cast(inner.sql, target, is_pred), inner.cols
            )

        if low == "extract":
            self.t.next()
            self.t.expect("(")
            fld = _ident(self.t.next())
            self.t.expect("from")
            src = self._parse_expression()
            self.t.expect(")")
            return _Expr(_extract_text(fld, src.sql), src.cols)

        if low == "array" and self.t.peek(1) == "[":
            self.t.next()
            self.t.next()
            elems = [self._parse_expression()]
            while self.t.accept(","):
                elems.append(self._parse_expression())
            self.t.expect("]")
            inner = ", ".join(e.sql for e in elems)
            return _merge(f"array[{inner}]", *elems)

        if t == "{":
            # DuckDB struct literal `{'key': value, ...}` (wave-25) →
            # Spark's named_struct. Keys must be plain-identifier string
            # literals — both engines surface them as result field
            # names. The postfix loop picks up field access afterwards.
            self.t.next()
            pairs: list[str] = []
            kids: list[_Expr] = []
            while True:
                key = self.t.next()
                if not re.fullmatch(r"'[A-Za-z_]\w*'", key):
                    raise UnsupportedSqlError(
                        f"struct literal key {key!r} must be a plain-"
                        "identifier string literal (field-name rules "
                        "diverge between engines otherwise)"
                    )
                self.t.expect(":")
                val = self._parse_value_or_predicate()
                pairs.append(f"{key}, {val.sql}")
                kids.append(val)
                if not self.t.accept(","):
                    break
            self.t.expect("}")
            return _merge(f"named_struct({', '.join(pairs)})", *kids)

        if low == "map" and self.t.peek(1) == "{":
            raise UnsupportedSqlError(
                "MAP literals are not modeled — DuckDB surfaces maps as "
                "{key: [...], value: [...]} rows and map[k] returns a "
                "LIST, with no Spark spelling that matches; use a struct "
                "literal or map_from_arrays via the registry SQL path"
            )

        if low == "struct_pack" and self.t.peek(1) == "(":
            # DuckDB struct_pack(a := 1, b := x) → named_struct (wave-25)
            self.t.next()
            self.t.next()
            pairs = []
            kids = []
            while True:
                name = _ident(self.t.next())
                self.t.expect(":")
                self.t.expect("=")
                val = self._parse_value_or_predicate()
                pairs.append(f"'{name}', {val.sql}")
                kids.append(val)
                if not self.t.accept(","):
                    break
            self.t.expect(")")
            return _merge(f"named_struct({', '.join(pairs)})", *kids)

        if t == "[":
            # DuckDB bracket list literal `[e1, e2, ...]` in operand
            # position (wave-23) — same constructor as ARRAY[...]; the
            # postfix loop picks up subscripts (`[1,2][2]`) afterwards.
            # Empty `[]` is allowed (DuckDB types it SQLNULL[]).
            self.t.next()
            elems = []
            if self.t.peek() != "]":
                elems.append(self._parse_expression())
                while self.t.accept(","):
                    elems.append(self._parse_expression())
            self.t.expect("]")
            inner = ", ".join(e.sql for e in elems)
            return _merge(f"array[{inner}]", *elems)

        if t == "(":
            self.t.next()
            if self.t.peek_kw() in ("select", "with"):
                sub = self.parse_query()
                self.t.expect(")")
                # scalar subquery (ref SubqueryExpression :1244)
                return _Expr(f"({_inline(sub)})")
            # value-or-predicate: a parenthesized BOOLEAN expression —
            # `(a AND b) AS f`, `(x IN (1,2)) IS NULL`, `(p IS DISTINCT
            # FROM q)` — is an ordinary expression of type boolean
            # (wave-22; the comparison/AND tail previously failed inside
            # the parens)
            inner = self._parse_value_or_predicate()
            if self.t.peek() == ",":
                # row-value constructor (ANSI): `(a, b[, ...])` — legal in
                # comparison and IN position, expanded structurally by the
                # predicate layer (portable: no engine-specific struct
                # spellings reach the IR)
                elems = [inner]
                while self.t.accept(","):
                    elems.append(self._parse_expression())
                self.t.expect(")")
                return _Expr(
                    "(" + ", ".join(e.sql for e in elems) + ")",
                    tuple(c for e in elems for c in e.cols),
                    row=tuple(elems),
                )
            self.t.expect(")")
            return _Expr(f"({inner.sql})", inner.cols)

        if self.t.at_ident() or low in ("any", "all", "some", "left", "right"):
            # identifiers; a few non-reserved keywords double as function
            # names (left(s, n), right(s, n))
            if self.t.peek(1) == "(":
                return self._parse_function_call()
            if not self.t.at_ident():
                raise ParserError(f"unexpected token {t!r} in expression")
            name = _ident(self.t.next())
            if self.t.peek() == "." and (
                self.t.peek(1) or ""
            ).lower() != "*" and self.t.peek(1) is not None:
                self.t.next()
                colname = _ident(self.t.next())
                ref = Q.ColumnReference(colname, Q.TableReference(name))
                return _Expr(ref.to_sql(), (ref,))
            ref = Q.ColumnReference(name)
            return _Expr(ref.to_sql(), (ref,))

        raise ParserError(f"unexpected token {t!r} in expression")

    def _parse_value_or_predicate(self) -> _Expr:
        """An expression that may be BOOLEAN-VALUED: a leading EXISTS/NOT,
        or a comparison/membership/AND-OR tail after the expression —
        shared by CASE result values and ORDER BY keys (ANSI: a predicate
        is just an expression of type boolean)."""
        if (
            self.t.peek_kw() == "exists" and self.t.peek(1) == "("
        ) or self.t.peek_kw() == "not":
            q = self._projection_predicate(None)
            return _Expr(q.sql, q.columns)
        expr = self._parse_expression()
        if self.t.peek() in (
            "=", "<>", "!=", "<", "<=", ">", ">=", "@>", "<@", "&&",
        ) or self.t.peek_kw() in (
            "in", "between", "like", "ilike", "rlike", "is", "not", "and", "or",
        ):
            q = self._projection_predicate(expr)
            return _Expr(q.sql, q.columns)
        return expr

    def _parse_case(self) -> _Expr:
        self.t.expect("case")
        parts = ["CASE"]
        cols: list[Q.ColumnReference] = []
        if self.t.peek_kw() != "when":
            # simple CASE (ref CaseExpression :1453 simple_expr)
            subject = self._parse_expression()
            parts.append(subject.sql)
            cols.extend(subject.cols)
        while self.t.accept("when"):
            cond = self._parse_predicate()
            for leaf in cond.iterpredicates():
                cols.extend(leaf.columns())
            cond_sql = cond.to_sql()
            if cond_sql.strip().upper() == "NULL":
                # a bare NULL condition is VOID-typed on Spark (analysis
                # error) where DuckDB reads an unknown BOOLEAN (wave-22)
                cond = Q.UnaryPredicate(
                    Q.UnaryOperation.BARE,
                    Q.SqlExpression("CAST(NULL AS BOOLEAN)"),
                )
            self.t.expect("then")
            val = self._parse_value_or_predicate()
            cols.extend(val.cols)
            parts.append(f"WHEN {cond.to_sql()} THEN {val.sql}")
        if self.t.accept("else"):
            alt = self._parse_value_or_predicate()
            cols.extend(alt.cols)
            parts.append(f"ELSE {alt.sql}")
        self.t.expect("end")
        parts.append("END")
        return _Expr(" ".join(parts), tuple(cols))

    def _parse_function_call(self) -> _Expr:
        name = _ident(self.t.next())
        self.t.expect("(")
        cols: list[Q.ColumnReference] = []
        star = False
        distinct = False
        gen_args: list[_Expr] | None = None
        special = self._parse_special_call_body(name)
        if special is not None:
            body, scols = special
            cols.extend(scols)
        elif self.t.peek() == "*":
            self.t.next()
            self.t.expect(")")
            body = f"{name}(*)"
            star = True
            gen_args = []
        else:
            distinct = self.t.accept("distinct")
            args: list[_Expr] = []
            if self.t.peek() != ")":
                if name.lower() in ("if", "iff"):
                    # if(cond, a, b) (DuckDB/Spark agree): the CONDITION
                    # is a predicate, which the plain expression grammar
                    # cannot parse (round-11 — the spelling failed loud)
                    cond = self._parse_predicate()
                    for leaf in cond.iterpredicates():
                        cols.extend(leaf.columns())
                    args.append(_Expr(cond.to_sql()))
                else:
                    # value-or-predicate: boolean-valued arguments
                    # (`bool_and(x > 2)`, `count(a = b OR c)`) are
                    # ordinary expressions of type boolean (wave-14 —
                    # the comparison tail previously failed at parse)
                    args.append(self._parse_value_or_predicate())
                while self.t.accept(","):
                    args.append(self._parse_value_or_predicate())
            # in-call aggregate ORDER BY — `string_agg(x, d ORDER BY k)`,
            # `array_agg(x ORDER BY k DESC)` (extension BEYOND the
            # reference: its parser handles agg_filter only, no aggOrder —
            # parser.py:1013-1069). Lowered right here to the portable
            # struct-sort spelling (Spark executes it; the fuzzer/oracles
            # run the ORIGINAL text on DuckDB).
            ordered_agg = False
            if args and self.t.peek_kw() == "order":
                self.t.next()
                self.t.expect("by")
                keys: list[tuple[_Expr, bool, bool | None]] = []
                while True:
                    k = self._parse_expression()
                    asc = True
                    if self.t.accept("desc"):
                        asc = False
                    else:
                        self.t.accept("asc")
                    nf: bool | None = None
                    if self.t.peek_kw() == "nulls":
                        self.t.next()
                        word = self.t.next().lower()
                        if word not in ("first", "last"):
                            raise UnsupportedSqlError(
                                f"expected FIRST/LAST after NULLS, "
                                f"got {word!r}"
                            )
                        nf = word == "first"
                    keys.append((k, asc, nf))
                    if not self.t.accept(","):
                        break
                for k, _a, _n in keys:
                    cols.extend(k.cols)
                body = self._lower_ordered_agg(name, distinct, args, keys)
                ordered_agg = True
            # IGNORE/RESPECT NULLS, in-paren spelling (DuckDB/Postgres:
            # `first_value(x IGNORE NULLS)`) — re-emitted in Spark's
            # post-paren position; RESPECT NULLS is the default and drops
            in_paren_ignore = False
            if (
                args
                and self.t.peek_kw() in ("ignore", "respect")
                and self.t.peek_kw(1) == "nulls"
            ):
                in_paren_ignore = self.t.next().lower() == "ignore"
                self.t.next()
            self.t.expect(")")
            for a in args:
                cols.extend(a.cols)
            if ordered_agg:
                if self.t.peek_kw() in ("filter", "over"):
                    raise UnsupportedSqlError(
                        "FILTER/OVER combined with an in-call aggregate "
                        "ORDER BY is not modeled — apply the filter in "
                        "WHERE or drop the in-call ordering"
                    )
                return _Expr(body, tuple(cols))
            low_name = name.lower()
            if (
                low_name in ("datediff", "date_diff")
                and len(args) == 3
                and not distinct
            ):
                # DuckDB/Postgres datediff('day', start, end) → Spark's
                # 2-arg datediff(end, start). Only the 'day' part maps
                # exactly (Spark's month/year deltas are fractional
                # months_between, not boundary counts) — others reject.
                part = args[0].sql
                if part.lower() not in ("'day'", "'days'"):
                    raise UnsupportedSqlError(
                        f"datediff part {part} is not modeled — engines "
                        "count month/year boundaries differently; only "
                        "'day' maps exactly"
                    )
                body = f"datediff({args[2].sql}, {args[1].sql})"
            elif (
                low_name in ("string_split", "str_split", "string_to_array")
                and len(args) == 2
                and not distinct
            ):
                # DuckDB/Postgres split on a LITERAL separator; Spark's
                # split takes a REGEX — quote via Java's \Q…\E (wave-9
                # parity family). The IR literal is ANSI; the compiler
                # doubles backslashes for Spark exactly once.
                sep = args[1].sql
                if sep.startswith("'") and sep.endswith("'"):
                    inner_sep = sep[1:-1]
                    if "\\E" in inner_sep:
                        raise UnsupportedSqlError(
                            "separator containing \\E cannot be "
                            "regex-quoted — use split() with an explicit "
                            "pattern"
                        )
                    body = f"split({args[0].sql}, '\\Q{inner_sep}\\E')"
                else:
                    body = (
                        f"split({args[0].sql}, "
                        f"concat('\\Q', {args[1].sql}, '\\E'))"
                    )
            elif (
                low_name in ("floor", "ceil", "ceiling")
                and len(args) == 1
                and not distinct
            ):
                # DuckDB floor/ceil return DOUBLE for int/double args
                # where Spark returns BIGINT (wave-10 type divergence;
                # DECIMAL-typed args diverge either way and the fixture
                # carries none)
                body = f"CAST({low_name}({args[0].sql}) AS DOUBLE)"
            elif low_name == "strpos" and len(args) == 2 and not distinct:
                body = f"instr({args[0].sql}, {args[1].sql})"
            elif (
                low_name in ("arg_max", "arg_min")
                and len(args) == 2
                and not distinct
            ):
                # DuckDB arg_max(arg, val) == Spark max_by(arg, val)
                # (wave-14; DuckDB itself aliases max_by/min_by)
                spark_fn = "max_by" if low_name == "arg_max" else "min_by"
                body = f"{spark_fn}({args[0].sql}, {args[1].sql})"
            elif (
                low_name == "quantile_cont"
                and len(args) == 2
                and not distinct
            ):
                # DuckDB quantile_cont(x, p) == Spark's exact
                # interpolated percentile(x, p) (wave-14)
                body = f"percentile({args[0].sql}, {args[1].sql})"
            elif (
                low_name == "quantile_disc"
                and len(args) == 2
                and not distinct
            ):
                # discrete quantile → the ANSI inverse-distribution
                # spelling Spark executes natively (wave-14)
                body = (
                    f"percentile_disc({args[1].sql}) "
                    f"WITHIN GROUP (ORDER BY {args[0].sql})"
                )
            elif (
                low_name == "string_agg" and len(args) == 1 and not distinct
            ):
                # 1-arg form: DuckDB/Postgres default the delimiter to
                # ',' where Spark's own default is '' (wave-14)
                body = f"string_agg({args[0].sql}, ',')"
            elif (
                low_name in ("greatest", "least")
                and not distinct
                and any(
                    re.fullmatch(r"-?\d*\.\d+", a.sql.strip()) for a in args
                )
            ):
                # a decimal-point LITERAL argument types the whole result
                # DECIMAL on Spark where DuckDB/Postgres read DOUBLE
                # (wave-18; same class as the `/` literal promotion) —
                # promote just the literals
                lowered_args = [
                    f"CAST({a.sql} AS double)"
                    if re.fullmatch(r"-?\d*\.\d+", a.sql.strip())
                    else a.sql
                    for a in args
                ]
                body = f"{low_name}({', '.join(lowered_args)})"
            elif (
                low_name in ("date_part", "datepart")
                and len(args) == 2
                and not distinct
                and args[0].sql.startswith("'")
                and args[0].sql.endswith("'")
            ):
                # date_part('field', x) is the function spelling of
                # EXTRACT — route through the SAME field-parity lowering
                # (wave-15: date_part('dow', …) silently skipped the
                # Sunday=0 correction extract received in wave 5)
                body = _extract_text(args[0].sql[1:-1], args[1].sql)
            elif low_name == "week" and len(args) == 1 and not distinct:
                # DuckDB week() is the ISO week — Spark's weekofyear
                body = f"weekofyear({args[0].sql})"
            elif (
                low_name in ("dayname", "monthname")
                and len(args) == 1
                and not distinct
            ):
                pat = "EEEE" if low_name == "dayname" else "MMMM"
                body = f"date_format({args[0].sql}, '{pat}')"
            elif low_name == "epoch_ms" and len(args) == 1 and not distinct:
                body = f"unix_millis(CAST({args[0].sql} AS TIMESTAMP))"
            elif (
                low_name in ("strftime", "strptime")
                and len(args) == 2
                and not distinct
            ):
                # DuckDB/Postgres %-format codes → Spark's Java datetime
                # patterns (wave-15); literal formats only — the
                # translation must see the whole string
                fmt = args[1].sql
                if not (fmt.startswith("'") and fmt.endswith("'")):
                    raise UnsupportedSqlError(
                        f"{low_name} needs a literal format string"
                    )
                java = _strf_to_java(fmt[1:-1]).replace("'", "''")
                if low_name == "strftime":
                    body = f"date_format({args[0].sql}, '{java}')"
                else:
                    body = f"to_timestamp({args[0].sql}, '{java}')"
            elif (
                low_name in ("json_extract_string", "json_value")
                and len(args) == 2
                and not distinct
            ):
                # DuckDB json_extract_string == Spark get_json_object
                # (both return unquoted TEXT; wave-16). Paths without
                # the '$' root get it prepended ('a.b' → '$.a.b').
                p = args[1].sql.strip()
                if re.fullmatch(r"'[^']*'", p) and not p[1:-1].startswith(
                    "$"
                ):
                    p = f"'$.{p[1:-1]}'"
                body = f"get_json_object({args[0].sql}, {p})"
            elif low_name == "json_extract" and not distinct:
                raise UnsupportedSqlError(
                    "json_extract returns JSON-quoted strings on DuckDB "
                    "('\"hi\"') where Spark's get_json_object strips the "
                    "quotes — use json_extract_string for text "
                    "extraction"
                )
            elif (
                low_name == "json_array_length"
                and len(args) == 2
                and not distinct
            ):
                # DuckDB's 2-arg form measures the array AT a path —
                # compose the extraction (wave-16)
                body = (
                    f"json_array_length(get_json_object({args[0].sql}, "
                    f"{args[1].sql}))"
                )
            elif (
                low_name in ("regexp_matches", "regexp_full_match")
                and len(args) in (2, 3)
                and not distinct
            ):
                # DuckDB regexp_matches = PARTIAL match (Spark RLIKE);
                # regexp_full_match anchors the whole string (wave-20).
                # A flags argument folds into the pattern for literal
                # patterns; only 'i' maps.
                s, p = args[0].sql, args[1].sql
                if len(args) == 3:
                    fl = args[2].sql.strip()
                    if fl != "'i'" or not (
                        p.startswith("'") and p.endswith("'")
                    ):
                        raise UnsupportedSqlError(
                            f"{low_name} flags other than a literal 'i' "
                            "over a literal pattern are not modeled"
                        )
                    p = f"'(?i){p[1:-1]}'"
                if low_name == "regexp_matches":
                    body = f"({s} RLIKE {p})"
                elif p.startswith("'") and p.endswith("'"):
                    body = f"({s} RLIKE '^(?:{p[1:-1]})$')"
                else:
                    body = f"({s} RLIKE concat('^(?:', {p}, ')$'))"
            elif low_name == "unnest" and len(args) == 1 and not distinct:
                # SELECT-position unnest (Postgres/DuckDB set-returning
                # expression) → Spark's explode generator in the select
                # list — identical single-generator semantics (wave-19);
                # FROM-position unnest routes through the TVF path
                body = f"explode({args[0].sql})"
            elif low_name == "json_keys" and len(args) == 1 and not distinct:
                body = f"json_object_keys({args[0].sql})"
            elif low_name == "product" and not distinct:
                raise UnsupportedSqlError(
                    "product() has no exact Spark lowering — the "
                    "log-domain form exp(sum(ln(abs(x)))) drifts in the "
                    "last ULP and lambda reductions are not re-parsable; "
                    "spell the log-domain form explicitly"
                )
            elif low_name == "concat" and args and not distinct:
                # DuckDB/Postgres concat() SKIPS NULL arguments; Spark's
                # propagates NULL (wave-13 silent divergence). concat_ws
                # with an empty separator is exactly the skip semantics
                # (all-NULL → '' on both). Spark's array-concat overload
                # of concat() is not preserved — DuckDB's concat is
                # string-only (list concatenation is list_concat).
                body = (
                    "concat_ws('', "
                    + ", ".join(a.sql for a in args)
                    + ")"
                )
            elif (
                low_name == "trunc" and len(args) == 1 and not distinct
            ):
                # numeric trunc(x): Spark's trunc is date-only (2-arg) —
                # truncate toward zero via floor/ceil (wave-13). DOUBLE
                # result like the floor/ceil lowering; DuckDB types
                # DECIMAL literals DECIMAL(p,0) (documented divergence).
                x = args[0].sql
                body = (
                    f"CAST(CASE WHEN ({x}) >= 0 THEN floor({x}) "
                    f"ELSE ceil({x}) END AS DOUBLE)"
                )
            elif (
                low_name in ("substr", "substring")
                and len(args) == 3
                and not distinct
                and not (
                    re.fullmatch(r"[1-9]\d*", args[1].sql.strip())
                    and re.fullmatch(r"\d+", args[2].sql.strip())
                )
            ):
                # 3-arg substr with START ZERO possible: DuckDB counts
                # the window from the virtual position 0 (one char
                # shorter), Spark snaps 0 to position 1 and keeps the
                # full length (wave-13: substr(s, 0, 3) read 3 chars, a
                # silent divergence). NEGATIVE starts are from-end and
                # IDENTICAL on both engines (probed incl. overshoot), so
                # only the zero case adjusts.
                s, st, ln = args[0].sql, args[1].sql, args[2].sql
                body = (
                    f"CASE WHEN ({st}) = 0 THEN "
                    f"substr({s}, 1, greatest(({ln}) - 1, 0)) "
                    f"ELSE substr({s}, {st}, {ln}) END"
                )
            elif (
                low_name in ("left", "right")
                and len(args) == 2
                and not distinct
                and not re.fullmatch(r"\d+", args[1].sql.strip())
            ):
                # negative counts: DuckDB/Postgres left(s,-n) = all but
                # the LAST n, right(s,-n) = all but the FIRST n; Spark
                # returns '' (wave-13 silent divergence). Literal
                # non-negative counts stay verbatim.
                s, n = args[0].sql, args[1].sql
                if low_name == "left":
                    body = (
                        f"substr({s}, 1, CASE WHEN ({n}) >= 0 THEN ({n}) "
                        f"ELSE greatest(length({s}) + ({n}), 0) END)"
                    )
                else:
                    body = (
                        f"CASE WHEN ({n}) >= 0 THEN right({s}, {n}) "
                        f"ELSE substr({s}, CAST(1 - ({n}) AS INT)) END"
                    )
            elif (
                low_name == "starts_with" and len(args) == 2 and not distinct
            ):
                body = f"startswith({args[0].sql}, {args[1].sql})"
            elif (
                low_name in ("list_contains", "array_contains")
                and len(args) == 2
                and not distinct
            ):
                # DuckDB list_contains([1,NULL], 3) is FALSE — a found
                # element wins and an absent one loses even when the
                # list holds NULLs; Spark's array_contains reads NULL
                # there (wave-23 silent divergence in the old plain
                # lowering). NULL list or NULL needle stay NULL.
                x, e = args[0].sql, args[1].sql
                body = (
                    f"CASE WHEN ({x}) IS NULL OR ({e}) IS NULL THEN NULL "
                    f"ELSE coalesce(array_contains({x}, {e}), false) END"
                )
            elif (
                low_name == "list_has_any"
                and len(args) == 2
                and not distinct
            ):
                # NULL elements never match on DuckDB (list_has_any
                # with only-NULL overlap is FALSE); arrays_overlap
                # reads NULL for that — coalesce to false (wave-23)
                x, y = args[0].sql, args[1].sql
                body = (
                    f"CASE WHEN ({x}) IS NULL OR ({y}) IS NULL THEN NULL "
                    f"ELSE coalesce(arrays_overlap({x}, {y}), false) END"
                )
            elif (
                low_name == "list_has_all"
                and len(args) == 2
                and not distinct
            ):
                # DuckDB ignores NULL needles (list_has_all([1,NULL],
                # [NULL]) is TRUE) — filter them before the containment
                # check (wave-23)
                x, y = args[0].sql, args[1].sql
                body = (
                    f"CASE WHEN ({x}) IS NULL OR ({y}) IS NULL THEN NULL "
                    f"ELSE size(array_except("
                    f"filter({y}, e -> e IS NOT NULL), {x})) = 0 END"
                )
            elif (
                low_name in ("list_position", "list_indexof")
                and len(args) == 2
                and not distinct
            ):
                # both 1-based, 0 when absent, NULL for NULL inputs —
                # exactly Spark's array_position (wave-23)
                body = f"array_position({args[0].sql}, {args[1].sql})"
            elif (
                low_name == "list_value" and not distinct
            ):
                body = "array(" + ", ".join(a.sql for a in args) + ")"
            elif (
                low_name in ("list_sort", "array_sort")
                and len(args) in (1, 2, 3)
                and not distinct
            ):
                # DuckDB defaults ASC NULLS LAST (its default_null_order)
                # — exactly Spark's array_sort. The direction / null-order
                # literals pick among the four lambda-free spellings:
                # DESC NULLS LAST = sort_array(x, false), ASC NULLS FIRST
                # = sort_array(x, true), DESC NULLS FIRST =
                # reverse(ASC NULLS LAST) (wave-23)
                x = args[0].sql

                def _flag(i: int) -> str:
                    if len(args) <= i:
                        return ""
                    f = args[i].sql.strip().upper().strip("'")
                    return f

                direction = _flag(1) or "ASC"
                nulls = _flag(2) or "NULLS LAST"
                if direction not in ("ASC", "DESC") or nulls not in (
                    "NULLS LAST",
                    "NULLS FIRST",
                ):
                    raise UnsupportedSqlError(
                        "list_sort flags must be literal "
                        "'ASC'/'DESC' and 'NULLS FIRST'/'NULLS LAST'"
                    )
                if direction == "ASC" and nulls == "NULLS LAST":
                    body = f"array_sort({x})"
                elif direction == "DESC" and nulls == "NULLS LAST":
                    body = f"sort_array({x}, false)"
                elif direction == "ASC" and nulls == "NULLS FIRST":
                    body = f"sort_array({x}, true)"
                else:
                    body = f"reverse(array_sort({x}))"
            elif (
                low_name == "list_reverse_sort"
                and len(args) == 1
                and not distinct
            ):
                # DESC NULLS LAST (wave-23)
                body = f"sort_array({args[0].sql}, false)"
            elif (
                low_name == "list_reverse" and len(args) == 1 and not distinct
            ):
                body = f"reverse({args[0].sql})"
            elif (
                low_name == "list_distinct"
                and len(args) == 1
                and not distinct
            ):
                # DuckDB drops NULL elements and leaves the order
                # UNSPECIFIED (hash-set based); this keeps stable
                # first-occurrence order — any order satisfies the
                # DuckDB contract (wave-23)
                body = (
                    f"array_distinct(filter({args[0].sql}, "
                    "e -> e IS NOT NULL))"
                )
            elif (
                low_name == "list_unique" and len(args) == 1 and not distinct
            ):
                # count of distinct non-NULL elements (wave-23); DuckDB
                # types it BIGINT where size() is INT (documented, same
                # class as sign())
                body = (
                    f"size(array_distinct(filter({args[0].sql}, "
                    "e -> e IS NOT NULL)))"
                )
            elif (
                low_name == "list_append" and len(args) == 2 and not distinct
            ):
                body = f"array_append({args[0].sql}, {args[1].sql})"
            elif (
                low_name == "list_prepend" and len(args) == 2 and not distinct
            ):
                # DuckDB spells (element, list); Spark (array, element)
                body = f"array_prepend({args[1].sql}, {args[0].sql})"
            elif (
                low_name in ("list_concat", "list_cat", "array_concat")
                and len(args) >= 2
                and not distinct
            ):
                # NULL operands propagate NULL on both engines
                body = "concat(" + ", ".join(a.sql for a in args) + ")"
            elif (
                low_name in ("list_min", "list_max")
                and len(args) == 1
                and not distinct
            ):
                # both engines skip NULL elements
                fn = "array_min" if low_name == "list_min" else "array_max"
                body = f"{fn}({args[0].sql})"
            elif (
                low_name == "list_sum" and len(args) == 1 and not distinct
            ):
                # NULL elements are skipped; an empty or all-NULL list
                # sums to NULL (NOT 0) on DuckDB — the NULL-seeded
                # coalescing fold reproduces that exactly (wave-23).
                # Integer elements only (BIGINT accumulator; DuckDB
                # types it HUGEINT — same magnitude class)
                x = args[0].sql
                body = (
                    f"aggregate(filter({x}, e -> e IS NOT NULL), "
                    "CAST(NULL AS BIGINT), "
                    "(acc, e) -> coalesce(acc, CAST(0 AS BIGINT)) + e)"
                )
            elif (
                low_name == "list_avg" and len(args) == 1 and not distinct
            ):
                # mean over non-NULL elements, NULL for empty (wave-23)
                x = args[0].sql
                nn = f"filter({x}, e -> e IS NOT NULL)"
                body = (
                    f"CASE WHEN size({nn}) = 0 THEN CAST(NULL AS DOUBLE) "
                    f"ELSE aggregate({nn}, CAST(0 AS DOUBLE), "
                    f"(acc, e) -> acc + e) / size({nn}) END"
                )
            elif (
                low_name == "array_slice"
                and len(args) == 3
                and not distinct
            ):
                # function spelling of the 1-based inclusive [a:b] slice
                # (wave-23); same lowering as the subscript form — the
                # length argument clamps past the end on both engines
                x, a, b = args[0].sql, args[1].sql, args[2].sql
                body = (
                    f"slice({x}, CAST({a} AS INT), "
                    f"CAST(({b}) - ({a}) + 1 AS INT))"
                )
            elif (
                low_name == "regexp_extract"
                and len(args) == 2
                and not distinct
            ):
                # DuckDB's 2-arg default is group 0 (the WHOLE match);
                # Spark's is group 1 — a silent wrong-results divergence
                # on any pattern with capture groups (wave-26)
                body = f"regexp_extract({args[0].sql}, {args[1].sql}, 0)"
            elif (
                low_name in ("ltrim", "rtrim")
                and len(args) == 2
                and not distinct
            ):
                # DuckDB/Postgres spell (string, chars); Spark's 2-arg
                # form is (trimStr, srcStr) — REVERSED, silently wrong
                # operands. The keyword TRIM form is unambiguous on both
                # engines AND re-parse idempotent (an argument swap
                # would flip on every roundtrip) (wave-26)
                side = "LEADING" if low_name == "ltrim" else "TRAILING"
                body = f"trim({side} {args[1].sql} FROM {args[0].sql})"
            elif (
                low_name == "ends_with" and len(args) == 2 and not distinct
            ):
                body = f"endswith({args[0].sql}, {args[1].sql})"
            elif (
                low_name == "unicode" and len(args) == 1 and not distinct
            ):
                # codepoint of the first character — Spark's ascii() is
                # full-unicode despite the name (wave-26)
                body = f"ascii({args[0].sql})"
            elif (
                low_name == "kurtosis_pop"
                and len(args) == 1
                and not distinct
            ):
                # DuckDB's kurtosis_pop = population excess kurtosis =
                # exactly Spark's kurtosis (wave-31; verified to 1e-13)
                body = f"kurtosis({args[0].sql})"
            elif low_name in ("kurtosis", "skewness") and not distinct:
                # DuckDB computes the SAMPLE (bias-corrected) statistic;
                # Spark the population one — silently different values
                # on any non-trivial data (wave-31: kurtosis 4.27 vs
                # 0.068 on a 5-row probe). No fixpoint-safe lowering
                # exists (the correction formula would re-lower itself)
                raise UnsupportedSqlError(
                    f"DuckDB's {low_name}() is the SAMPLE-corrected "
                    "statistic; Spark computes the population form — "
                    + (
                        "spell kurtosis_pop() (identical on both engines)"
                        if low_name == "kurtosis"
                        else "no shared spelling exists; compute the "
                        "correction explicitly from count()"
                    )
                )
            elif low_name in (
                "mad",
                "entropy",
                "favg",
                "fsum",
                "fprod",
            ) and not distinct:
                raise UnsupportedSqlError(
                    f"{low_name}() has no Spark equivalent — median/"
                    "abs-deviation and Kahan-summation forms need an "
                    "explicit rewrite (see percentile_cont / sum)"
                )
            elif low_name == "columns" and not distinct:
                raise UnsupportedSqlError(
                    "COLUMNS('regex') is only modeled as a bare select "
                    "item (its multi-column expansion has no expression "
                    "value); list the columns explicitly here"
                )
            elif low_name == "format" and not distinct:
                raise UnsupportedSqlError(
                    "format('{}', ...) is fmt-style with no Spark "
                    "equivalent — use printf('%s', ...) (printf runs "
                    "on both engines)"
                )
            elif low_name in (
                "jaro_similarity",
                "jaro_winkler_similarity",
                "jaccard",
                "hamming",
                "mismatches",
                "damerau_levenshtein",
                "strip_accents",
            ) and not distinct:
                raise UnsupportedSqlError(
                    f"{low_name}() has no Spark equivalent — "
                    "levenshtein() is the portable string-distance "
                    "function"
                )
            elif (
                low_name == "struct_extract"
                and len(args) == 2
                and not distinct
            ):
                # DuckDB struct_extract(s, 'k') → dot field access, the
                # spelling both engines share (wave-25)
                k = args[1].sql.strip()
                if not re.fullmatch(r"'[A-Za-z_]\w*'", k):
                    raise UnsupportedSqlError(
                        "struct_extract needs a plain-identifier string "
                        "literal key"
                    )
                base = args[0].sql
                if not re.fullmatch(
                    r"[A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*", base
                ):
                    base = f"({base})"
                body = f"{base}.{k[1:-1]}"
            elif (
                low_name == "len" and len(args) == 1 and not distinct
            ):
                # DuckDB len() is polymorphic over strings and lists;
                # Spark splits it size()/length(). Dispatch on the
                # argument's syntax: array-producing forms take size(),
                # everything else length() — a mis-dispatch fails at
                # Spark analysis (loud), never silently (wave-23)
                a = args[0].sql.strip().lower()
                arrayish = a.startswith(
                    (
                        "array",
                        "split(",
                        "sequence(",
                        "collect_list(",
                        "collect_set(",
                        "slice(",
                        "sort_array(",
                        "flatten(",
                        "reverse(array",
                        "filter(",
                        "concat(array",
                    )
                )
                body = (
                    f"size({args[0].sql})"
                    if arrayish
                    else f"length({args[0].sql})"
                )
            elif (
                low_name == "array_to_string"
                and len(args) == 2
                and not distinct
            ):
                body = f"array_join({args[0].sql}, {args[1].sql})"
            elif (
                low_name == "array_length" and len(args) == 1 and not distinct
            ):
                body = f"size({args[0].sql})"
            elif (
                low_name == "date_trunc"
                and len(args) == 2
                and not distinct
                and re.fullmatch(
                    r"'(day|week|month|quarter|year|isoyear|decade"
                    r"|century|millennium)'",
                    args[0].sql,
                    re.I,
                )
            ):
                # DuckDB/Postgres date_trunc returns DATE for day-or-
                # coarser fields where Spark keeps TIMESTAMP (wave-9
                # probe find) — cast to the oracle's type
                body = (
                    f"CAST(date_trunc({args[0].sql}, {args[1].sql}) "
                    f"AS DATE)"
                )
            elif low_name == "log" and len(args) == 1 and not distinct:
                # Postgres/DuckDB log(x) is BASE-10; Spark's log(x) is
                # natural log (silent-divergence trap, wave-9). The
                # 2-arg log(base, x) agrees on both engines; ln() too.
                # Out-of-domain arguments are a DOCUMENTED divergence
                # (wave-29): DuckDB/Postgres raise where Spark reads
                # NULL/NaN — a loud-vs-silent difference on invalid
                # inputs only, never a plausible wrong value; a guard
                # would break the parse→render→parse fixpoint.
                body = f"log10({args[0].sql})"
            elif low_name == "sha256" and len(args) == 1 and not distinct:
                # DuckDB/Postgres sha256(x) → Spark's sha2(x, 256)
                # (wave-6 parity find; identical hex on both engines)
                body = f"sha2({args[0].sql}, 256)"
            elif (
                low_name == "regexp_replace"
                and len(args) in (3, 4)
                and not distinct
            ):
                body = self._lower_regexp_replace(args)
            else:
                inner = ("DISTINCT " if distinct else "") + ", ".join(
                    a.sql for a in args
                )
                body = f"{name}({inner})"
            gen_args = args
            if not in_paren_ignore and (
                self.t.peek_kw() in ("ignore", "respect")
                and self.t.peek_kw(1) == "nulls"
            ):
                # Spark's own post-paren spelling — also accepted
                in_paren_ignore = self.t.next().lower() == "ignore"
                self.t.next()
            if in_paren_ignore:
                if ordered_agg:
                    raise UnsupportedSqlError(
                        "IGNORE NULLS combined with an in-call aggregate "
                        "ORDER BY is not modeled"
                    )
                body = f"{body} IGNORE NULLS"
        # ANSI ordered-set aggregates: `fn(args) WITHIN GROUP (ORDER BY
        # k [ASC|DESC])` — carried VERBATIM: Spark and DuckDB both
        # execute the spelling natively (percentile_cont/disc, mode()),
        # so no lowering is needed, only the grammar (round-10)
        if self.t.peek_kw() == "within":
            self.t.next()
            self.t.expect("group")
            self.t.expect("(")
            self.t.expect("order")
            self.t.expect("by")
            wk = self._parse_expression()
            cols.extend(wk.cols)
            ktxt = wk.sql
            if self.t.accept("desc"):
                ktxt += " DESC"
            else:
                self.t.accept("asc")
            if self.t.peek_kw() == "nulls":
                # NULLS FIRST/LAST is a semantic no-op here — the
                # ordered-set aggregates both engines run through this
                # clause (percentile_cont/disc, mode) EXCLUDE NULLs from
                # the computation — and Spark parses the spelling
                # natively, so carry it verbatim (round-11 closure)
                self.t.next()
                word = self.t.next().lower()
                if word not in ("first", "last"):
                    raise UnsupportedSqlError(
                        f"expected FIRST/LAST after NULLS, got {word!r}"
                    )
                ktxt += f" NULLS {word.upper()}"
            self.t.expect(")")
            body = f"{body} WITHIN GROUP (ORDER BY {ktxt})"
        # FILTER (WHERE pred) — ref FunctionExpression :814-817
        filter_sql: str | None = None
        if self.t.accept("filter"):
            self.t.expect("(")
            self.t.expect("where")
            cond = self._parse_predicate()
            self.t.expect(")")
            for leaf in cond.iterpredicates():
                cols.extend(leaf.columns())
            filter_sql = cond.to_sql()
        wrap: str | None = None
        if self.t.peek_kw() == "over" and (filter_sql is not None or distinct):
            # WINDOW position: Spark supports neither FILTER nor DISTINCT
            # on window aggregates — lower to NULL-skipping CASE arguments
            # (aggregates ignore NULLs) and the collect_set spelling
            body, wrap = self._lower_window_agg(
                name, star, distinct, gen_args, filter_sql
            )
        elif filter_sql is not None:
            body = f"{body} FILTER (WHERE {filter_sql})"
        # OVER (window) | OVER wname — ref WindowExpression :1308 (no frame
        # spec in the reference model; frames are accepted here as text for
        # execution). A bare identifier is a NAMED-window reference: it
        # renders as a NUL-delimited `OVER <marker>` (_winref_marker) that
        # _parse_select substitutes once the trailing WINDOW clause has
        # been parsed.
        if self.t.accept("over"):
            if self.t.accept("("):
                spec = self._parse_window_body()
                cols.extend(spec.cols)
                self.t.expect(")")
                excl = getattr(self, "_last_frame_exclusion", None)
                if excl in ("group", "ties"):
                    # EXCLUDE GROUP/TIES ≡ subtract the PEER GROUP's
                    # contribution (rows sharing the partition and every
                    # ORDER BY key value); TIES adds the current row
                    # back. Peer aggregates ride a second window keyed
                    # on partition+order texts — whole-partition frame,
                    # so it always covers the full peer group.
                    low_fn = name.lower()
                    if distinct or filter_sql is not None:
                        raise UnsupportedSqlError(
                            "EXCLUDE GROUP/TIES combined with DISTINCT/"
                            "FILTER window aggregates is not modeled"
                        )
                    pkeys, okeys = getattr(
                        self, "_last_window_keys", ([], [])
                    )
                    peer_keys = list(pkeys) + list(okeys)
                    pw = (
                        f"OVER (PARTITION BY {', '.join(peer_keys)})"
                        if peer_keys
                        else "OVER ()"
                    )
                    w = f"OVER ({spec.sql})"
                    ties = excl == "ties"
                    if low_fn == "count" and star:
                        body = f"(count(*) {w} - count(*) {pw}"
                        body += " + 1)" if ties else ")"
                    elif low_fn in ("count", "sum", "avg") and args and len(
                        args
                    ) == 1:
                        x = args[0].sql
                        xn = f"(CASE WHEN ({x}) IS NULL THEN 0 ELSE 1 END)"
                        n = f"(count({x}) {w} - count({x}) {pw}"
                        n += f" + {xn})" if ties else ")"
                        if low_fn == "count":
                            body = n
                        else:
                            sm = f"(sum({x}) {w} - coalesce(sum({x}) {pw}, 0)"
                            sm += f" + coalesce({x}, 0))" if ties else ")"
                            if low_fn == "sum":
                                body = (
                                    f"(CASE WHEN {n} = 0 THEN NULL "
                                    f"ELSE {sm} END)"
                                )
                            else:
                                body = (
                                    f"(CASE WHEN {n} = 0 THEN NULL ELSE "
                                    f"CAST({sm} AS DOUBLE) / {n} END)"
                                )
                    else:
                        raise UnsupportedSqlError(
                            f"EXCLUDE {excl.upper()} on {name}() is not "
                            "modeled — only count/sum/avg subtract "
                            "exactly"
                        )
                elif excl == "current row":
                    # EXCLUDE CURRENT ROW ≡ subtract the current row's
                    # contribution from the inclusive frame (the frame
                    # was verified to contain the current row). Exact
                    # for count/sum/avg; all-NULL-other frames read NULL
                    # through the count guard.
                    low_fn = name.lower()
                    if distinct or filter_sql is not None:
                        raise UnsupportedSqlError(
                            "EXCLUDE CURRENT ROW combined with DISTINCT/"
                            "FILTER window aggregates is not modeled"
                        )
                    w = f"OVER ({spec.sql})"
                    if low_fn == "count" and star:
                        body = f"(count(*) {w} - 1)"
                    elif low_fn == "count" and args and len(args) == 1:
                        x = args[0].sql
                        body = (
                            f"(count({x}) {w} - (CASE WHEN ({x}) IS NULL "
                            f"THEN 0 ELSE 1 END))"
                        )
                    elif low_fn in ("sum", "avg") and args and len(args) == 1:
                        x = args[0].sql
                        n = (
                            f"(count({x}) {w} - (CASE WHEN ({x}) IS NULL "
                            f"THEN 0 ELSE 1 END))"
                        )
                        sm = f"(sum({x}) {w} - coalesce({x}, 0))"
                        if low_fn == "sum":
                            body = (
                                f"(CASE WHEN {n} = 0 THEN NULL "
                                f"ELSE {sm} END)"
                            )
                        else:
                            body = (
                                f"(CASE WHEN {n} = 0 THEN NULL ELSE "
                                f"CAST({sm} AS DOUBLE) / {n} END)"
                            )
                    else:
                        raise UnsupportedSqlError(
                            f"EXCLUDE CURRENT ROW on {name}() is not "
                            "modeled — only count/sum/avg subtract "
                            "exactly"
                        )
                else:
                    body = f"{body} OVER ({spec.sql})"
            else:
                wname = _ident(self.t.next())
                self.emitted_winref = True
                body = f"{body} OVER {_winref_marker(wname)}"
            if wrap is not None:
                body = f"{wrap}({body})"
        return _Expr(body, tuple(cols))

    def _lower_window_agg(
        self,
        name: str,
        star: bool,
        distinct: bool,
        args: list["_Expr"] | None,
        filter_sql: str | None,
    ) -> tuple[str, str | None]:
        """FILTER / DISTINCT on an aggregate in WINDOW position, which
        Spark's WindowExec rejects outright — lowered to equivalents it
        executes: FILTER routes the argument through a CASE (window
        aggregates skip NULLs, so ``agg(CASE WHEN p THEN x END) OVER w``
        ≡ ``agg(x) FILTER (WHERE p) OVER w``; ``count(*)`` counts a
        CASE-guarded constant), and ``count(DISTINCT x)`` becomes
        ``size(collect_set(x) OVER w)`` (collect_set dedups and skips
        NULLs — exactly count-distinct semantics). Returns (call body,
        optional wrapper applied AROUND the attached OVER text)."""
        if args is None:
            raise UnsupportedSqlError(
                "FILTER/DISTINCT on a keyword-form call in window "
                "position is not modeled"
            )
        low = name.lower()
        if filter_sql is not None:
            if star:
                if low != "count":
                    raise UnsupportedSqlError(
                        f"FILTER on {name}(*) in window position is not "
                        "modeled"
                    )
                arg_sqls = [f"CASE WHEN {filter_sql} THEN 1 END"]
            elif len(args) == 1:
                arg_sqls = [f"CASE WHEN {filter_sql} THEN {args[0].sql} END"]
            else:
                raise UnsupportedSqlError(
                    "FILTER on a multi-argument window aggregate is not "
                    "modeled"
                )
        else:
            arg_sqls = ["*"] if star else [a.sql for a in args]
        if distinct:
            if low != "count" or star or len(arg_sqls) != 1:
                raise UnsupportedSqlError(
                    "only count(DISTINCT x) is modeled in window position "
                    "— spell sum/avg over a distinct set via "
                    "aggregate(collect_set(x) OVER w, ...)"
                )
            return f"collect_set({arg_sqls[0]})", "size"
        return f"{name}({', '.join(arg_sqls)})", None

    def _lower_ordered_agg(
        self,
        name: str,
        distinct: bool,
        args: list["_Expr"],
        keys: list[tuple["_Expr", bool, bool | None]],
    ) -> str:
        """Lower ``agg(x[, d] ORDER BY k…)`` to the struct-sort spelling:
        collect (key…, value) structs, sort them (struct comparison is
        lexicographic by field order — exactly the multi-key sort),
        project the value back out with ``transform``, and for
        string_agg join with the delimiter. All JVM-side builtin calls —
        one ordinary hash-aggregate plus per-GROUP array sorting, no
        extra shuffle and no Python. string_agg skips NULL values (ANSI)
        via a CASE that collect_list's null-dropping consumes; array_agg
        keeps them (Postgres/DuckDB semantics).

        Uniform-direction keys without an explicit NULLS spec ride
        ``sort_array`` (single codegen'd flag sort); mixed ASC/DESC or
        NULLS FIRST/LAST lower to an ``array_sort`` COMPARATOR lambda —
        per-key direction and null placement, still entirely JVM-side
        (round-11: both were loud rejections)."""
        low = name.lower()
        if low in ("first", "last"):
            # ordered first/last → min_by/max_by over a (null-marker,
            # key...) struct (wave-31). DuckDB's in-call default places
            # NULL keys LAST, so a NULL-keyed row LOSES for the
            # traversal-start picker and WINS for the traversal-end one;
            # the marker field encodes that before the key comparison
            # ever sees a NULL. Mixed directions / explicit NULLS specs
            # reject (the single marker can't express them).
            if distinct:
                raise UnsupportedSqlError(
                    f"DISTINCT {low}(... ORDER BY) is not modeled"
                )
            if len(args) != 1:
                raise UnsupportedSqlError(f"{low} takes a single argument")
            asc0 = keys[0][1]
            if any(a != asc0 for _k, a, _n in keys) or any(
                n is not None for _k, _a, n in keys
            ):
                raise UnsupportedSqlError(
                    f"{low}(... ORDER BY) with mixed directions or an "
                    "explicit NULLS spec is not modeled"
                )
            start = low == "first"
            # ASC: null-marker 1 sorts null keys HIGH (last);
            # DESC: marker -1 sorts them LOW (= last of the descending
            # traversal); the picker then reads min/max accordingly
            mval = "1" if asc0 else "-1"
            fields = []
            for k, _a, _n in keys:
                fields.append(
                    f"CASE WHEN ({k.sql}) IS NULL THEN {mval} ELSE 0 END"
                )
                fields.append(k.sql)
            s = "struct(" + ", ".join(fields) + ")"
            picker = (
                "min_by" if (start == asc0) else "max_by"
            )
            return f"{picker}({args[0].sql}, {s})"
        if low not in ("string_agg", "array_agg", "collect_list", "list"):
            raise UnsupportedSqlError(
                f"in-call ORDER BY on {name}() is not modeled "
                "(supported: string_agg, array_agg, first, last)"
            )
        asc = keys[0][1]
        uniform = all(a == asc for _k, a, _n in keys) and all(
            n is None for _k, _a, n in keys
        )
        if low == "string_agg":
            if len(args) == 1:
                # 1-arg form: DuckDB/Postgres default the delimiter to
                # ',' (wave-14; Spark's own default is '' — divergent)
                args = list(args) + [_Expr("','")]
            if len(args) != 2:
                raise UnsupportedSqlError(
                    "string_agg takes (expr, delimiter)"
                )
        elif len(args) != 1:
            raise UnsupportedSqlError(f"{name} takes a single argument")
        x = args[0].sql
        if distinct:
            # DISTINCT + in-call ORDER BY is only well-defined when the
            # sort key IS the aggregated expression (Postgres raises
            # otherwise); collect_set dedups, array_sort orders
            if len(keys) != 1 or keys[0][0].sql != x:
                raise UnsupportedSqlError(
                    "DISTINCT with in-call ORDER BY requires ordering by "
                    "the aggregated expression itself"
                )
            arr = f"array_sort(collect_set({x}))"
            if not asc:
                arr = f"reverse({arr})"
        elif uniform:
            # each key carries a null MARKER field ahead of it so the
            # struct sort places NULL keys LAST in either direction —
            # DuckDB's in-call default (Spark's struct comparison would
            # otherwise sort null fields first under ascending)
            marker = "1 ELSE 0" if asc else "0 ELSE 1"
            fields = ", ".join(
                f"'_n{i}', CASE WHEN ({k.sql}) IS NULL THEN {marker} END, "
                f"'_k{i}', {k.sql}"
                for i, (k, _a, _n) in enumerate(keys)
            )
            struct = f"named_struct({fields}, '_v', {x})"
            if low == "string_agg":
                # collect_list drops NULL elements — routing a NULL value
                # through the CASE implements string_agg's NULL skip
                struct = f"CASE WHEN ({x}) IS NULL THEN NULL ELSE {struct} END"
            flag = "true" if asc else "false"
            arr = (
                f"transform(sort_array(collect_list({struct}), {flag}), "
                f"s -> s._v)"
            )
        else:
            fields = ", ".join(
                f"'_k{i}', {k.sql}" for i, (k, _a, _n) in enumerate(keys)
            )
            struct = f"named_struct({fields}, '_v', {x})"
            if low == "string_agg":
                struct = f"CASE WHEN ({x}) IS NULL THEN NULL ELSE {struct} END"
            # innermost-out nested CASE comparator: per key — NULL ties
            # and value ties fall through to the NEXT key's comparison.
            # Default null placement stays NULLS LAST in either direction
            # (DuckDB's in-call default); explicit NULLS FIRST/LAST wins.
            # The tie branch duplicates the remaining comparator text
            # (2^n growth) — in-call key lists are 1-3 keys in practice.
            cmp = "0"
            for i in reversed(range(len(keys))):
                _k, a, nf = keys[i]
                nf = False if nf is None else nf
                lt, gt = ("-1", "1") if a else ("1", "-1")
                nul_l, nul_r = ("-1", "1") if nf else ("1", "-1")
                cmp = (
                    f"CASE WHEN l._k{i} IS NULL AND r._k{i} IS NULL "
                    f"THEN {cmp} "
                    f"WHEN l._k{i} IS NULL THEN {nul_l} "
                    f"WHEN r._k{i} IS NULL THEN {nul_r} "
                    f"WHEN l._k{i} < r._k{i} THEN {lt} "
                    f"WHEN l._k{i} > r._k{i} THEN {gt} ELSE {cmp} END"
                )
            arr = (
                f"transform(array_sort(collect_list({struct}), "
                f"(l, r) -> {cmp}), s -> s._v)"
            )
        if low == "string_agg":
            return f"array_join({arr}, {args[1].sql})"
        return arr

    def _lower_regexp_replace(self, args: list["_Expr"]) -> str:
        """Postgres/DuckDB ``regexp_replace`` parity (wave-6 finds):
        their 3-arg form replaces the FIRST match where Spark replaces
        ALL — inexpressible in Spark, so the flagless form rejects with
        the actionable spelling; the ``'g'`` flag form lowers to Spark's
        3-arg all-replace, ``'i'`` folds into an inline ``(?i)``; and
        ``\\1`` backreferences in a literal replacement become Spark's
        ``$1`` (Java replacement syntax treats ``\\1`` as an escaped
        literal, silently corrupting the output)."""
        x, pat, rep = args[0].sql, args[1].sql, args[2].sql
        if len(args) == 3:
            raise UnsupportedSqlError(
                "regexp_replace without flags replaces the FIRST match on "
                "Postgres/DuckDB but ALL matches on Spark — pass the 'g' "
                "flag explicitly to keep both engines aligned"
            )
        flags = args[3].sql
        m = re.fullmatch(r"'([gi]*)'", flags)
        if m is None:
            raise UnsupportedSqlError(
                "regexp_replace flags other than literal 'g'/'i' are not "
                "modeled"
            )
        if "g" not in m.group(1):
            raise UnsupportedSqlError(
                "first-match-only regexp_replace is not expressible in "
                "Spark — pass the 'g' flag"
            )
        if "i" in m.group(1):
            if not (pat.startswith("'") and pat.endswith("'")):
                raise UnsupportedSqlError(
                    "case-insensitive regexp_replace needs a literal "
                    "pattern (the (?i) fold-in)"
                )
            pat = "'(?i)" + pat[1:-1] + "'"
        if rep.startswith("'") and rep.endswith("'"):
            rep = re.sub(r"\\(\d)", r"$\1", rep)
        return f"regexp_replace({x}, {pat}, {rep})"

    def _parse_special_call_body(
        self, name: str
    ) -> tuple[str, tuple[Q.ColumnReference, ...]] | None:
        """ANSI keyword-argument call forms (ref pglast grammar; both
        Spark SQL and DuckDB execute these spellings verbatim, so the
        text is carried as written): ``POSITION(a IN b)``,
        ``substring(s FROM start [FOR len])``, and
        ``TRIM([BOTH|LEADING|TRAILING] chars FROM s)``. Returns None
        when the call is the ordinary comma form — the caller falls
        through to the generic argument list."""
        if name == "position":
            mark = self.t.i
            a = self._parse_expression()
            if not self.t.accept("in"):
                self.t.i = mark  # comma form position(a, b) — generic path
                return None
            b = self._parse_expression()
            self.t.expect(")")
            return f"position({a.sql} IN {b.sql})", a.cols + b.cols
        if name in ("substring", "substr"):
            mark = self.t.i
            s = self._parse_expression()
            if not self.t.accept("from"):
                self.t.i = mark  # comma form — generic path re-parses
                return None
            start = self._parse_expression()
            body = f"{name}({s.sql} FROM {start.sql}"
            cols = s.cols + start.cols
            if self.t.accept("for"):
                ln = self._parse_expression()
                body += f" FOR {ln.sql}"
                cols += ln.cols
            self.t.expect(")")
            return body + ")", cols
        if name == "trim":
            mode = ""
            if self.t.peek_kw() in ("both", "leading", "trailing"):
                mode = self.t.next().upper() + " "
                if self.t.accept("from"):
                    # TRIM(BOTH FROM s) — ANSI default trim-chars
                    # (Spark accepts this form; bare TRIM(FROM s) it
                    # does not, so that stays the generic-path error)
                    s = self._parse_expression()
                    self.t.expect(")")
                    return f"trim({mode}FROM {s.sql})", s.cols
            mark = self.t.i
            chars = self._parse_expression()
            if not self.t.accept("from"):
                if mode:
                    raise ParserError(
                        "expected FROM in TRIM(BOTH|LEADING|TRAILING ...)"
                    )
                self.t.i = mark  # plain trim(args...) — generic path
                return None
            s = self._parse_expression()
            self.t.expect(")")
            return (
                f"trim({mode}{chars.sql} FROM {s.sql})",
                chars.cols + s.cols,
            )
        return None

    def _parse_window_body(self) -> _Expr:
        """The inside of a window specification — shared by inline
        ``OVER (...)`` and the named ``WINDOW w AS (...)`` clause."""
        cols: list[Q.ColumnReference] = []
        wparts: list[str] = []
        self._last_window_keys = ([], [])
        if self.t.accept("partition", "by"):
            pexprs = [self._parse_expression()]
            while self.t.accept(","):
                pexprs.append(self._parse_expression())
            for p in pexprs:
                cols.extend(p.cols)
            self._last_window_keys = ([p.sql for p in pexprs], [])
            wparts.append(
                "PARTITION BY " + ", ".join(p.sql for p in pexprs)
            )
        if self.t.accept("order", "by"):
            oitems: list[str] = []
            while True:
                oexpr = self._parse_expression()
                cols.extend(oexpr.cols)
                self._last_window_keys[1].append(oexpr.sql)
                otxt = oexpr.sql
                desc = False
                if self.t.accept("desc"):
                    otxt += " DESC"
                    desc = True
                elif self.t.accept("asc"):
                    otxt += " ASC"
                if self.t.accept("nulls", "first"):
                    otxt += " NULLS FIRST"
                elif self.t.accept("nulls", "last"):
                    otxt += " NULLS LAST"
                else:
                    # make the DEFAULT explicit — NULLS LAST for both
                    # directions (DuckDB default_null_order): Spark's ASC
                    # default is NULLS FIRST, which silently re-ranks
                    # nullable keys on identical text (round-10 find)
                    otxt += " NULLS LAST"
                oitems.append(otxt)
                if not self.t.accept(","):
                    break
            wparts.append("ORDER BY " + ", ".join(oitems))
        self._last_frame_exclusion = None
        frame: list[str] = []
        if self.t.peek_kw() in ("rows", "range", "groups"):
            frame = [self.t.next().upper()]
            depth = 0
            while self.t.peek() is not None:
                nxt = self.t.peek()
                if nxt == "(":
                    depth += 1
                elif nxt == ")":
                    if depth == 0:
                        break
                    depth -= 1
                frame.append(self.t.next().upper())
        elif self.t.peek_kw() == "exclude":
            # EXCLUDE with the IMPLICIT frame (RANGE UNBOUNDED PRECEDING
            # .. CURRENT ROW when ORDER BY is present) — value-based, so
            # it contains the current row and whole peer groups
            frame = [self.t.next().upper()]
            while self.t.peek() is not None and self.t.peek() != ")":
                frame.append(self.t.next().upper())
        if frame and "EXCLUDE" in frame:
                # ANSI frame exclusion (wave-9 follow-up): Spark has no
                # EXCLUDE — NO OTHERS is the default (stripped), CURRENT
                # ROW desugars at the CALL site for subtractable
                # aggregates, GROUP/TIES keep a loud rejection
                i = frame.index("EXCLUDE")
                tail = " ".join(frame[i + 1:]).lower()
                frame = frame[:i]
                if tail == "no others":
                    pass
                elif tail == "current row":
                    self._last_frame_exclusion = "current row"
                    ftxt = " ".join(frame)
                    if re.search(
                        r"BETWEEN \d+ FOLLOWING|AND \d+ PRECEDING", ftxt
                    ):
                        raise UnsupportedSqlError(
                            "EXCLUDE CURRENT ROW over a frame that may "
                            "not contain the current row is not modeled"
                        )
                elif tail in ("group", "ties"):
                    # peer-group exclusions subtract the PEER window —
                    # only value-based (RANGE) frames are guaranteed to
                    # contain whole peer groups
                    if frame and frame[0] == "ROWS":
                        raise UnsupportedSqlError(
                            f"EXCLUDE {tail.upper()} over a ROWS frame "
                            "may split a peer group and is not modeled "
                            "— use a RANGE frame"
                        )
                    self._last_frame_exclusion = tail
                else:
                    raise UnsupportedSqlError(
                        f"window frame EXCLUDE {tail.upper()} is not "
                        "modeled — only EXCLUDE CURRENT ROW/GROUP/TIES "
                        "(on count/sum/avg) and EXCLUDE NO OTHERS lower"
                    )
        if frame and frame[0] == "GROUPS":
            frame, wparts = self._rewrite_groups_frame(frame, wparts)
        if frame:
            wparts.append(" ".join(frame))
        return _Expr(" ".join(wparts), tuple(cols))

    def _rewrite_groups_frame(
        self, frame: list[str], wparts: list[str]
    ) -> tuple[list[str], list[str]]:
        """GROUPS frames (SQL:2011 peer-group mode; DuckDB runs them
        natively, Spark has no GROUPS frame type) → an EXACT two-level
        rewrite: ``dense_rank()`` over the window's own PARTITION/ORDER
        numbers peer groups consecutively, so a RANGE frame over that
        integer with the SAME offsets covers exactly the requested peer
        groups (CURRENT ROW in RANGE mode already means the whole peer —
        all rows with the current peer index). This rewrites the frame
        and ORDER BY here; _desugar_groups wraps the query one level
        below to COMPUTE the recorded peer-index column."""
        ftxt = " ".join(frame)
        bound = r"UNBOUNDED PRECEDING|UNBOUNDED FOLLOWING|CURRENT ROW|\d+ PRECEDING|\d+ FOLLOWING"
        if not re.fullmatch(
            rf"GROUPS (?:BETWEEN (?:{bound}) AND (?:{bound})"
            rf"|UNBOUNDED PRECEDING|CURRENT ROW|\d+ PRECEDING)",
            ftxt,
        ):
            raise UnsupportedSqlError(
                f"GROUPS frame bounds must be integer literals, CURRENT "
                f"ROW, or UNBOUNDED (got {ftxt!r})"
            )
        order_idx = next(
            (i for i, p in enumerate(wparts) if p.startswith("ORDER BY ")),
            None,
        )
        if order_idx is None:
            raise UnsupportedSqlError(
                "GROUPS window frames require ORDER BY (peer groups are "
                "defined by the ordering keys)"
            )
        spec_text = " ".join(wparts)
        gname = self._groups_windows.get(spec_text)
        if gname is None:
            gname = f"__groups_g{next(_GROUPS_COUNTER)}"
            self._groups_windows[spec_text] = gname
        new_wparts = list(wparts)
        new_wparts[order_idx] = f"ORDER BY {gname} ASC NULLS LAST"
        return ["RANGE"] + frame[1:], new_wparts


def _zero_guard(sql: str) -> str:
    """Wrap a divisor as ``nullif((d), 0)`` unless it already is one —
    DuckDB's NULL-on-zero-divisor contract for ``/``, ``%`` and ``//``
    in a spelling both engines parse (wave-29); the already-wrapped
    check keeps the rewrite a parse→render→parse fixpoint. Literal
    nonzero divisors skip the wrap (nothing to guard, and the common
    ``x % 10`` stays pristine in plans and rendered SQL)."""
    t = sql.strip()
    if re.fullmatch(r"\d+(\.\d+)?", t) and float(t) != 0:
        return f"({t})" if "." in t else t
    if re.match(r"(?i)^nullif\(", t) and re.search(r",\s*0\)$", t):
        return t
    return f"nullif(({t}), 0)"


def _is_double_cast(sql: str) -> bool:
    """True when ``sql`` is exactly one ``CAST(... AS double)`` call —
    the `/` promotion's idempotence guard (the wrapped text re-parses
    through the same code path)."""
    t = sql.strip()
    if not re.match(r"(?i)^CAST\(", t) or not re.search(
        r"(?i)AS double\)$", t
    ):
        return False
    depth = 0
    for i, ch in enumerate(t):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i == len(t) - 1
    return False


def _has_window_call(text: str) -> bool:
    """True when ``text`` contains an inline window (``OVER (``) —
    string literals blanked so data can never false-positive."""
    blanked = re.sub(r"'(?:[^']|'')*'", "''", text)
    return re.search(r"\bover\s*\(", blanked, re.I) is not None


def _extract_text(fld: str, src_sql: str) -> str:
    """Postgres/DuckDB EXTRACT field parity (wave-5/15 probe finds),
    shared by ``extract(f FROM x)`` and ``date_part('f', x)``: Spark's
    DOW is Sunday=1 where Postgres counts Sunday=0; ISODOW, ISOYEAR, and
    EPOCH are missing from Spark's extract entirely. The session pins
    spark.sql.session.timeZone=UTC, so epoch-of-DATE matches DuckDB's
    UTC-midnight reading; DuckDB returns DOUBLE with FRACTIONAL seconds
    for epoch of any temporal type (advisor-found: unix_timestamp
    truncated sub-second precision), so it lowers through microseconds.
    ISOYEAR is the calendar year of the ISO week's THURSDAY."""
    f = fld.lower()
    if f == "dow":
        return f"(dayofweek({src_sql}) - 1)"
    if f == "isodow":
        return f"(weekday({src_sql}) + 1)"
    if f == "epoch":
        return (
            f"(CAST(unix_micros(CAST({src_sql} AS TIMESTAMP)) "
            f"AS DOUBLE) / 1000000.0D)"
        )
    if f == "isoyear":
        return (
            f"year(date_add(CAST({src_sql} AS DATE), "
            f"4 - (weekday({src_sql}) + 1)))"
        )
    return f"extract({fld} FROM {src_sql})"


#: strftime/strptime %-code → Java SimpleDateFormat pattern letters
_STRF_CODES = {
    "Y": "yyyy", "y": "yy", "m": "MM", "d": "dd", "H": "HH",
    "I": "hh", "M": "mm", "S": "ss", "f": "SSSSSS", "B": "MMMM",
    "b": "MMM", "A": "EEEE", "a": "EEE", "j": "DDD", "p": "a",
}


def _strf_to_java(fmt: str) -> str:
    """Translate a DuckDB/Postgres strftime %-format into Spark's Java
    datetime pattern (wave-15). Literal text runs containing letters are
    single-quoted so Java cannot reinterpret them; unmapped %-codes
    reject loudly rather than silently emitting the raw letters."""
    out: list[str] = []
    lit = ""

    def flush():
        nonlocal lit
        if lit:
            if re.search(r"[A-Za-z']", lit):
                out.append("'" + lit.replace("'", "''") + "'")
            else:
                out.append(lit)
            lit = ""

    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            code = fmt[i + 1]
            if code == "%":
                lit += "%"
                i += 2
                continue
            if code not in _STRF_CODES:
                raise UnsupportedSqlError(
                    f"strftime/strptime code %{code} has no Spark "
                    "datetime-pattern mapping"
                )
            flush()
            out.append(_STRF_CODES[code])
            i += 2
        else:
            lit += fmt[i]
            i += 1
    flush()
    return "".join(out)


_INT_CAST_TARGETS = ("int", "integer", "bigint", "smallint", "tinyint")


def _int_cast(inner_sql: str, target: str, is_pred: bool) -> str:
    """CAST to an integer type ROUNDS half-away-from-zero on
    DuckDB/Postgres where Spark TRUNCATES (wave-10 probe find: CAST(1.5
    AS INT) read 1, a silent value divergence) — route numeric casts
    through round(), whose HALF_UP matches the oracle exactly. Boolean
    predicates skip the wrapper (round(boolean) is an error; bool→int is
    already identical 0/1 on both engines)."""
    if not is_pred and target.lower() in _INT_CAST_TARGETS:
        t = inner_sql.strip()
        if t.lower().startswith("round(") and t.endswith(")"):
            # already rounded (incl. our own lowering re-parsed — the
            # parse→to_sql→parse fixpoint): don't wrap again
            depth = 0
            balanced_at_end = False
            for i, ch in enumerate(t):
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        balanced_at_end = i == len(t) - 1
                        break
            if balanced_at_end:
                return f"CAST({inner_sql} AS {target})"
        return f"CAST(round({inner_sql}) AS {target})"
    return f"CAST({inner_sql} AS {target})"


def _inline(q: Q.SqlQuery | Q.SetQuery) -> str:
    return " ".join(q.to_sql().split())


# ---------------------------------------------------------------------------
# binding (ref QueryNamespace parser.py:204; live binding :2272-2280)
# ---------------------------------------------------------------------------


def _bind(
    query: Q.SqlQuery,
    schema: dict[str, list[str]] | None = None,
    *,
    outer_columns: dict[str, list[Q.TableReference]] | None = None,
    outer_namespace: dict[str, Q.TableReference] | None = None,
) -> Q.SqlQuery:
    """Resolve column references against the FROM namespace (always) and an
    optional ``{table: [columns]}`` schema (the live-binding analog).

    ``outer_columns``/``outer_namespace`` carry the ENCLOSING scope into
    subquery binding (ANSI scoping: a name resolves against the
    subquery's own FROM first, then the outer query's) — this is what
    lets ``WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey =
    c_custkey)`` classify ``c_custkey`` as a correlated reference without
    an explicit qualifier (found by the differential execution fuzzer)."""
    namespace: dict[str, Q.TableReference] = {}
    cte_names = {name for name, _sub in query.ctes}
    for name in cte_names:
        namespace[name] = Q.TableReference(name, virtual=True)
    # a FROM entry that names a CTE is a virtual relation (ref
    # TableReference.virtual, _core.py:643-647)
    from_tables = tuple(
        replace(t, virtual=True)
        if t.full_name in cte_names and not t.virtual
        else t
        for t in query.from_tables
    )
    query = replace(query, from_tables=from_tables)
    for tab in query.from_tables:
        namespace[tab.identifier] = tab
        namespace.setdefault(tab.full_name, tab)
    for j in query.joins:
        namespace[j.source.identifier] = j.source
        if isinstance(j.source, Q.TableReference):
            namespace.setdefault(j.source.full_name, j.source)

    by_column: dict[str, list[Q.TableReference]] = {}
    if schema:
        sources = list(query.from_tables) + [
            j.source for j in query.joins
            if isinstance(j.source, Q.TableReference)
        ]
        for tab in sources:
            for c in schema.get(tab.full_name, []):
                by_column.setdefault(c.lower(), []).append(tab)

    def rebind_col(ref: Q.ColumnReference) -> Q.ColumnReference:
        if ref.table is not None:
            resolved = namespace.get(ref.table.identifier)
            if resolved is None and outer_namespace:
                resolved = outer_namespace.get(ref.table.identifier)
            return Q.ColumnReference(ref.name, resolved) if resolved else ref
        owners = by_column.get(ref.name, [])
        if len(owners) == 1:
            return Q.ColumnReference(ref.name, owners[0])
        if not owners and outer_columns:
            outer_owners = outer_columns.get(ref.name, [])
            if len(outer_owners) == 1:
                return Q.ColumnReference(ref.name, outer_owners[0])
        return ref

    def bind_subquery(sub):
        if not isinstance(sub, Q.SqlQuery):
            return sub
        # inner scope shadows outer on collision (ANSI); merge so deeper
        # nesting keeps seeing every enclosing level
        merged_cols = {**(outer_columns or {}), **by_column}
        merged_ns = {**(outer_namespace or {}), **namespace}
        return _bind(
            sub, schema, outer_columns=merged_cols, outer_namespace=merged_ns
        )

    def rebind_expr(e: Q.SqlExpression) -> Q.SqlExpression:
        return Q.SqlExpression(e.sql, tuple(rebind_col(c) for c in e.columns))

    def rebind_pred(p: Q.AbstractPredicate | None):
        if p is None:
            return None
        if isinstance(p, Q.CompoundPredicate):
            return Q.CompoundPredicate(
                p.operation, tuple(rebind_pred(c) for c in p.children)
            )
        if isinstance(p, Q.BinaryPredicate):
            return Q.BinaryPredicate(
                p.operation, rebind_expr(p.lhs), rebind_expr(p.rhs)
            )
        if isinstance(p, Q.BetweenPredicate):
            return Q.BetweenPredicate(
                rebind_expr(p.expr), rebind_expr(p.lower), rebind_expr(p.upper)
            )
        if isinstance(p, Q.InPredicate):
            return Q.InPredicate(
                rebind_expr(p.expr),
                tuple(rebind_expr(v) for v in p.values),
                bind_subquery(p.subquery),
                p.negated,
                row_elems=tuple(rebind_expr(e) for e in p.row_elems),
            )
        if isinstance(p, Q.UnaryPredicate):
            expr = rebind_expr(p.expr) if p.expr is not None else None
            return Q.UnaryPredicate(p.operation, expr, bind_subquery(p.subquery))
        return p

    return replace(
        query,
        select=tuple(
            Q.BaseProjection(rebind_expr(s.expr), s.alias) for s in query.select
        ),
        where=rebind_pred(query.where),
        group_by=tuple(rebind_expr(e) for e in query.group_by),
        having=rebind_pred(query.having),
        order_by=tuple(
            Q.OrderByExpression(rebind_expr(o.expr), o.ascending, o.nulls_first)
            for o in query.order_by
        ),
        distinct_on=tuple(rebind_expr(e) for e in query.distinct_on),
        joins=tuple(
            Q.JoinedTable(
                j.join_type, j.source, rebind_pred(j.condition), j.using,
                j.asof,
            )
            for j in query.joins
        ),
    )


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


_HINT_RE = re.compile(r"/\*\+\s*(.*?)\s*\*/", re.S)


def parse_query(
    text: str,
    *,
    schema: dict[str, list[str]] | None = None,
    include_hints: bool = True,
) -> Q.SqlQuery | Q.SetQuery:
    """Parse SQL text into the qal IR (ref ``parse_query`` parser.py:2240).

    ``schema`` maps table name → column names and enables binding of
    unqualified columns, like the reference's optional ``DatabaseSchema``
    binding (``bind_columns`` parser.py:2272). Alias binding is always on.
    ``include_hints`` extracts a leading ``/*+ ... */`` hint block into
    ``SqlQuery.hint`` (ref ``include_hints`` parser.py:2269) — Spark's SQL
    parser interprets the re-rendered block, so parsed hints stay live."""
    hint = None
    if include_hints:
        m = _HINT_RE.search(text)
        # a hint-shaped substring inside a string literal is data, not a
        # hint — extracting it would inject a live Spark hint the input
        # never asked for; real hint blocks precede any literal
        if m and "'" not in text[: m.start()]:
            hint = m.group(1).strip()
    parser = _Parser(text, schema=schema)
    result = parser.parse()
    # catch-all for named-window markers that escaped every resolving
    # scope (e.g. `OVER w` inside WHERE/GROUP BY/HAVING, where window
    # functions are illegal anyway) — the NUL-delimited marker must
    # never leak into rendered SQL. Gated on the parser having emitted a
    # marker at all, so marker-free queries skip the render entirely.
    if parser.emitted_winref:
        rendered = result.to_sql()
        if _WINREF_PREFIX in rendered:
            raise ParserError(
                f"window {_winref_name(rendered)!r} is not defined (named-"
                "window references resolve in the SELECT list of the query "
                "level that declares the WINDOW clause)"
            )
    if hint and isinstance(result, Q.SqlQuery):
        result = replace(result, hint=hint)
    if isinstance(result, Q.SqlQuery) and schema:
        result = _bind(result, schema)
    return result


def to_query_spec(query: Q.SqlQuery):
    """Project a parsed query onto the optimizer stages' QuerySpec: table
    set + equi-join edges (the join-graph the ordering algorithms consume,
    ref ``opt/_joingraph.py:360``)."""
    from postbound_spark.optimizer.joingraph import JoinEdge
    from postbound_spark.optimizer.stages import QuerySpec

    if not isinstance(query, Q.SqlQuery):
        raise UnsupportedSqlError(
            "a set-operation query has no single join graph — extract a "
            "QuerySpec per SELECT operand instead (the reference optimizes "
            "per SELECT block too)"
        )
    edges = []
    for pred in query.predicates().joins():
        if not (
            isinstance(pred, Q.BinaryPredicate)
            and pred.operation is Q.LogicalOperator.EQ
            and len(pred.lhs.columns) == 1
            and len(pred.rhs.columns) == 1
        ):
            continue
        lcol, rcol = pred.lhs.columns[0], pred.rhs.columns[0]
        if lcol.table is None or rcol.table is None:
            continue
        edges.append(
            JoinEdge(
                lcol.table.identifier, lcol.name, rcol.table.identifier, rcol.name
            )
        )
    return QuerySpec(
        tables=tuple(t.identifier for t in query.from_tables),
        edges=tuple(edges),
    )
