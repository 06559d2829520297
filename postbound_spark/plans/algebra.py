"""qal IR → relational algebra: the engine's ``parse_relalg``.

Re-expresses the reference's SQL→algebra conversion
(rbergm/PostBOUND ``postbound/relalg.py``: ``parse_relalg`` :4266,
``_ImplicitRelalgParser`` :3288, subquery detection ``_SubqueryDetector``
:2866, expression-phase placement ``EvaluationPhase`` :2813-3287) for this
engine's compact IR. Combined with :mod:`postbound_spark.plans.parser` and
:mod:`postbound_spark.operators.compiler`, it completes the fully native
pipeline::

    SQL text --parse_query--> qal IR --parse_relalg--> RelNode tree
             --compile_plan--> DataFrame --Catalyst--> execution

i.e. a query runs through the engine without ever calling ``spark.sql`` on
the original text; Catalyst still performs expression analysis and physical
planning (Spark-first: the algebra is *logical* structure, never a
hand-scheduled physical plan).

Placement rules mirror the reference's phase machinery:

- single-table conjuncts → ``Selection`` directly above the base relation
  (BaseTable phase — the placement that lets Catalyst push filters into the
  parquet scan before any join);
- two-table conjuncts → ``ThetaJoin`` conditions, folded left-deep in FROM
  order (or a caller-provided join order — the enforcement hook the
  optimizer stages use);
- remaining conjuncts → post-join ``Selection`` (Join/PostJoin phase);
- ``IN (subquery)`` / ``EXISTS`` conjuncts → ``SemiJoin``; negated forms →
  ``AntiJoin``, with NOT IN phrased null-aware (``(l = r) OR isnull(l = r)``
  — Catalyst plans this as a null-aware anti join);
- group keys are pre-computed by a ``Map`` when they are expressions
  (the reference inserts Map before Grouping the same way,
  relalg.py:2719-2812); aggregate calls inside SELECT/HAVING/ORDER BY are
  computed in ``Grouping`` under synthetic names and the consuming texts
  rewritten (PostAggregation phase).

Scope: implicit-FROM SELECT queries (the research-workload shape the
reference's relalg layer itself supports — inner semantics only,
relalg.py:1550). Set queries compile via ``Union``/``Intersection``/
``Difference`` over their operand trees.
"""

from __future__ import annotations

import re

from postbound_spark.plans import qal as Q
from postbound_spark.plans import relalg as ra
from postbound_spark.plans.parser import UnsupportedSqlError

__all__ = ["parse_relalg", "AGGREGATE_FUNCTIONS"]

# The reference's recognized aggregate set (AggregateFunctions,
# qal/_qal.py:770-792) plus the Spark spellings the engine maps them to.
AGGREGATE_FUNCTIONS = frozenset({
    "count", "sum", "min", "max", "avg", "every", "corr", "stddev",
    "any_value", "array_agg", "collect_list", "collect_set", "bit_and",
    "bit_or", "bit_xor", "bool_and", "bool_or", "string_agg", "json_agg",
    "stddev_pop", "stddev_samp", "var_pop", "var_samp", "variance",
    "approx_count_distinct", "first", "last", "mean", "median", "mode",
    "percentile", "percentile_approx", "kurtosis", "skewness",
})

_AGG_CALL_RE = re.compile(
    r"\b(" + "|".join(sorted(AGGREGATE_FUNCTIONS)) + r")\s*\(", re.I
)


def _find_agg_calls(text: str) -> list[str]:
    """Outermost aggregate-call substrings of ``text`` (balanced-paren
    spans), skipping window invocations (``... OVER (...)``)."""
    calls: list[str] = []
    spans: list[tuple[int, int]] = []
    for m in _AGG_CALL_RE.finditer(text):
        start = m.start()
        if any(s <= start < e for s, e in spans):
            continue  # nested inside an already-captured call
        depth = 0
        end = None
        for i in range(m.end() - 1, len(text)):
            ch = text[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    end = i + 1
                    break
        if end is None:
            continue
        # window function, not a grouping aggregate
        if re.match(r"\s*over\s*\(", text[end:], re.I):
            continue
        calls.append(text[start:end])
        spans.append((start, end))
    return calls


_SIMPLE_COL_RE = re.compile(r"^[a-z_][\w$]*$")
_QUALIFIED_COL_RE = re.compile(r"^([a-z_][\w$]*)\.([a-z_][\w$]*)$")


def _output_name(text: str) -> str | None:
    """Column name an expression would surface under, if derivable."""
    if _SIMPLE_COL_RE.match(text):
        return text
    m = _QUALIFIED_COL_RE.match(text)
    return m.group(2) if m else None


# ---------------------------------------------------------------------------
# conversion
# ---------------------------------------------------------------------------


def parse_relalg(
    query: Q.SqlQuery | Q.SetQuery,
    *,
    join_order: list[str] | None = None,
) -> ra.RelNode:
    """Convert a qal query to a relational-algebra tree (ref ``parse_relalg``
    relalg.py:4266). ``join_order`` optionally overrides FROM order with a
    table-identifier sequence — the hook the optimizer's JoinTree enforcement
    uses."""
    if isinstance(query, Q.SetQuery):
        left = parse_relalg(query.left)
        right = parse_relalg(query.right)
        node: ra.RelNode
        if query.operator is Q.SetOperator.UNION:
            node = ra.Union(left, right, distinct=True)
        elif query.operator is Q.SetOperator.UNION_ALL:
            node = ra.Union(left, right, distinct=False)
        elif query.operator is Q.SetOperator.INTERSECT:
            node = ra.Intersection(left, right)
        else:
            node = ra.Difference(left, right)
        if query.order_by:
            node = ra.Sort(
                node,
                tuple(
                    ra.SortKey(o.expr.sql, o.ascending, o.nulls_first)
                    for o in query.order_by
                ),
            )
        if query.limit is not None:
            node = ra.Limit(node, limit=query.limit)
        return node
    return _Converter(query, join_order).convert()


class _Converter:
    def __init__(self, query: Q.SqlQuery, join_order: list[str] | None):
        self.q = query
        self.join_order = join_order
        self.counter = 0
        self.ctes = {name: sub for name, sub in query.ctes}

    def _gensym(self, prefix: str) -> str:
        self.counter += 1
        return f"__{prefix}{self.counter}"

    # -- leaves -------------------------------------------------------------

    def _leaf(self, tab) -> ra.RelNode:
        if isinstance(tab, Q.ValuesTableSource):
            return ra.Values(
                rows=tuple(
                    tuple(v.to_sql() for v in row) for row in tab.rows
                ),
                columns=tab.columns,
                alias=tab.alias,
            )
        if isinstance(tab, Q.FunctionTableSource):
            column = tab.columns[0] if tab.columns else "id"
            return ra.TableFunction(
                function=tab.function,
                args=tuple(a.to_sql() for a in tab.args),
                column=column,
                alias=tab.alias,
            )
        if tab.full_name in self.ctes:
            sub = parse_relalg(self.ctes[tab.full_name])
            return ra.Relation(subquery=sub, alias=tab.identifier)
        return ra.Relation(table=tab.full_name, alias=tab.identifier)

    # -- WHERE conjunct classification ---------------------------------------

    def _conjuncts(self) -> list[Q.AbstractPredicate]:
        if self.q.where is None:
            return []
        w = self.q.where
        if isinstance(w, Q.CompoundPredicate) and w.operation is Q.CompoundOperator.AND:
            return list(w.children)
        return [w]

    def convert(self) -> ra.RelNode:
        own_ids = {t.identifier for t in self.q.from_tables}
        filters: dict[str, list[Q.AbstractPredicate]] = {}
        joins: list[Q.AbstractPredicate] = []
        residual: list[Q.AbstractPredicate] = []
        subquery_preds: list[tuple[str, Q.AbstractPredicate]] = []

        for conj in self._conjuncts():
            kind = self._subquery_kind(conj)
            if kind is not None:
                subquery_preds.append((kind, conj))
                continue
            if "(select " in conj.to_sql().lower():
                # scalar/quantified subquery in expression position —
                # F.expr cannot evaluate it; the SQL path (spark.sql) can
                raise UnsupportedSqlError(
                    "scalar subqueries in predicates are not compilable by "
                    "the algebra path; execute via spark.sql / the registry "
                    "SQL path (e.g. expr_scalar_subquery)"
                )
            tabs = conj.tables() & own_ids
            if len(tabs) == 1:
                filters.setdefault(next(iter(tabs)), []).append(conj)
            elif len(tabs) == 2:
                joins.append(conj)
            else:
                residual.append(conj)

        # base relations with their filters (BaseTable phase)
        bases: dict[str, ra.RelNode] = {}
        for tab in self.q.from_tables:
            node: ra.RelNode = self._leaf(tab)
            preds = filters.get(tab.identifier)
            if preds:
                node = ra.Selection(node, Q.and_(*preds).to_sql())
            bases[tab.identifier] = node

        # left-deep fold in FROM (or forced) order
        order = self.join_order or [t.identifier for t in self.q.from_tables]
        if set(order) != set(bases):
            raise UnsupportedSqlError(
                f"join order {order} does not cover FROM tables {sorted(bases)}"
            )
        tree: ra.RelNode | None = None
        joined: set[str] = set()
        pending = list(joins)
        for ident in order:
            if tree is None:
                tree = bases[ident]
                joined.add(ident)
                continue
            applicable = [
                p
                for p in pending
                if p.tables() & {ident} and (p.tables() & own_ids) <= (joined | {ident})
            ]
            for p in applicable:
                pending.remove(p)
            if applicable:
                tree = ra.ThetaJoin(
                    tree, bases[ident], Q.and_(*applicable).to_sql()
                )
            else:
                tree = ra.CrossProduct(tree, bases[ident])
            joined.add(ident)
        if tree is None:
            tree = ra.SingleRow()  # FROM-less scalar SELECT

        # residual predicates (PostJoin phase)
        leftovers = pending + residual
        if leftovers:
            tree = ra.Selection(tree, Q.and_(*leftovers).to_sql())

        # IN/EXISTS subqueries → semi/anti joins
        for kind, pred in subquery_preds:
            tree = self._apply_subquery(tree, kind, pred, own_ids)

        return self._finish(tree)

    # -- subquery predicates -------------------------------------------------

    @staticmethod
    def _subquery_kind(pred: Q.AbstractPredicate) -> str | None:
        if isinstance(pred, Q.InPredicate) and pred.subquery is not None:
            return "not_in" if pred.negated else "in"
        if isinstance(pred, Q.UnaryPredicate) and pred.operation in (
            Q.UnaryOperation.EXISTS,
            Q.UnaryOperation.NOT_EXISTS,
        ):
            return (
                "not_exists"
                if pred.operation is Q.UnaryOperation.NOT_EXISTS
                else "exists"
            )
        if (
            isinstance(pred, Q.CompoundPredicate)
            and pred.operation is Q.CompoundOperator.NOT
            and len(pred.children) == 1
        ):
            inner = _Converter._subquery_kind(pred.children[0])
            if inner in ("exists", "in"):
                return "not_" + inner
            if inner in ("not_exists", "not_in"):
                return inner[4:]
        return None

    @staticmethod
    def _unwrap_not(pred: Q.AbstractPredicate) -> Q.AbstractPredicate:
        while (
            isinstance(pred, Q.CompoundPredicate)
            and pred.operation is Q.CompoundOperator.NOT
        ):
            pred = pred.children[0]
        return pred

    def _apply_subquery(
        self,
        tree: ra.RelNode,
        kind: str,
        pred: Q.AbstractPredicate,
        outer_ids: set[str],
    ) -> ra.RelNode:
        pred = self._unwrap_not(pred)
        if isinstance(pred, Q.InPredicate):
            sub = pred.subquery
            if not isinstance(sub, Q.SqlQuery):
                raise UnsupportedSqlError("set-query inside IN is not supported")
            self._check_alias_collisions(sub, outer_ids)
            if len(sub.select) != 1:
                raise UnsupportedSqlError("IN subquery must project one column")
            sub_tree = parse_relalg(sub)
            alias = self._gensym("insub")
            sub_tree = ra.SubqueryScan(sub_tree, alias=alias)
            out_col = sub.select[0].alias or _output_name(sub.select[0].expr.sql)
            if out_col is None:
                raise UnsupportedSqlError(
                    "IN subquery projection needs a derivable column name"
                )
            lhs = pred.expr.sql
            rhs = f"{alias}.{out_col}"
            if kind == "in":
                return ra.SemiJoin(tree, sub_tree, f"{lhs} = {rhs}")
            # null-aware NOT IN (Catalyst: null-aware anti join)
            return ra.AntiJoin(
                tree, sub_tree, f"({lhs} = {rhs}) OR isnull({lhs} = {rhs})"
            )

        assert isinstance(pred, Q.UnaryPredicate)
        sub = pred.subquery
        if not isinstance(sub, Q.SqlQuery):
            raise UnsupportedSqlError("set-query inside EXISTS is not supported")
        if sub.group_by or sub.limit is not None or sub.having is not None:
            raise UnsupportedSqlError(
                "EXISTS subquery with grouping/limit is not modeled"
            )
        self._check_alias_collisions(sub, outer_ids)
        inner_ids = {t.identifier for t in sub.from_tables}
        inner_conv = _Converter(sub, None)
        correlated: list[Q.AbstractPredicate] = []
        local: list[Q.AbstractPredicate] = []
        for conj in inner_conv._conjuncts():
            if conj.tables() - inner_ids:
                correlated.append(conj)
            else:
                local.append(conj)
        stripped = sub.with_clause(
            where=Q.and_(*local) if local else None, select=(Q.star(),)
        )
        sub_tree = parse_relalg(stripped)
        if not correlated:
            raise UnsupportedSqlError(
                "uncorrelated EXISTS needs no join — phrase as LIMIT/COUNT check"
            )
        cond = Q.and_(*correlated).to_sql()
        if kind == "exists":
            return ra.SemiJoin(tree, sub_tree, cond)
        return ra.AntiJoin(tree, sub_tree, cond)

    def _check_alias_collisions(self, sub: Q.SqlQuery, outer_ids: set[str]):
        inner_ids = {t.identifier for t in sub.from_tables}
        clash = inner_ids & outer_ids
        if clash:
            raise UnsupportedSqlError(
                f"subquery reuses outer table identifiers {sorted(clash)}; "
                "alias the subquery tables distinctly"
            )

    # -- grouping / projection / sort / limit --------------------------------

    def _finish(self, tree: ra.RelNode) -> ra.RelNode:
        q = self.q
        group_texts = [g.sql for g in q.group_by]
        select_texts = [p.expr.sql for p in q.select]
        has_aggs = any(_find_agg_calls(t) for t in select_texts) or bool(
            q.having is not None and _find_agg_calls(q.having.to_sql())
        )

        if not group_texts and not has_aggs:
            return self._finish_plain(tree)

        # ---- Map: pre-compute expression group keys (ref relalg.py:2719) --
        key_names: dict[str, str] = {}
        map_exprs: list[tuple[str, str]] = []
        for g in group_texts:
            name = _output_name(g)
            if name is None:
                name = self._gensym("key")
                map_exprs.append((name, g))
            elif "." in g:
                map_exprs.append((name, g))
            key_names[g] = name
        if map_exprs:
            tree = ra.Map(tree, tuple(map_exprs))

        # ---- collect aggregate calls from SELECT / HAVING / ORDER BY ------
        agg_names: dict[str, str] = {}

        def register_calls(text: str):
            for call in _find_agg_calls(text):
                if call not in agg_names:
                    agg_names[call] = self._gensym("agg")

        for p in q.select:
            if p.expr.sql not in key_names:
                register_calls(p.expr.sql)
        if q.having is not None:
            register_calls(q.having.to_sql())
        for o in q.order_by:
            register_calls(o.expr.sql)

        def rewrite(text: str) -> str:
            for call, name in sorted(
                agg_names.items(), key=lambda kv: -len(kv[0])
            ):
                text = text.replace(call, name)
            return text

        tree = ra.Grouping(
            tree,
            keys=tuple(key_names[g] for g in group_texts),
            aggregates=tuple((name, call) for call, name in agg_names.items()),
        )

        if q.having is not None:
            tree = ra.Selection(tree, rewrite(q.having.to_sql()))

        # ---- final projection (PostAggregation phase) ---------------------
        out_cols: list[str] = []
        out_names: dict[str, str] = {}  # select text -> output column name
        for p in q.select:
            text = p.expr.sql
            if text in key_names:
                base = key_names[text]
            else:
                base = rewrite(text)
            name = p.alias or _output_name(text) or _output_name(base)
            if name is None:
                name = self._gensym("col")
            out_cols.append(f"{base} AS {name}" if base != name else base)
            out_names[text] = name
        tree = ra.Projection(tree, tuple(out_cols))

        if q.distinct:
            tree = ra.DuplicateElimination(tree)

        if q.order_by:
            keys = []
            for o in q.order_by:
                text = o.expr.sql
                resolved = (
                    out_names.get(text)
                    or (text if text in out_names.values() else None)
                    or (rewrite(text) if text in agg_names else None)
                )
                if resolved is None:
                    resolved = rewrite(text)
                keys.append(ra.SortKey(resolved, o.ascending, o.nulls_first))
            tree = ra.Sort(tree, tuple(keys))

        return self._limit(tree)

    def _finish_plain(self, tree: ra.RelNode) -> ra.RelNode:
        q = self.q
        aliases = {p.alias for p in q.select if p.alias}
        sort_uses_alias = any(
            o.expr.sql in aliases for o in q.order_by
        )
        is_star = len(q.select) == 1 and q.select[0].expr.sql == "*"

        def project(node: ra.RelNode) -> ra.RelNode:
            if is_star:
                return node
            cols = tuple(
                f"{p.expr.sql} AS {p.alias}" if p.alias else p.expr.sql
                for p in q.select
            )
            return ra.Projection(node, cols)

        def sort(node: ra.RelNode) -> ra.RelNode:
            if not q.order_by:
                return node
            return ra.Sort(
                node,
                tuple(
                    ra.SortKey(o.expr.sql, o.ascending, o.nulls_first)
                    for o in q.order_by
                ),
            )

        if sort_uses_alias:
            tree = sort(project(tree))
        else:
            tree = project(sort(tree))
        if q.distinct:
            tree = ra.DuplicateElimination(tree)
        return self._limit(tree)

    def _limit(self, tree: ra.RelNode) -> ra.RelNode:
        if self.q.limit is not None or self.q.offset is not None:
            tree = ra.Limit(tree, limit=self.q.limit, offset=self.q.offset)
        return tree
