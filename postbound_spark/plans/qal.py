"""Query abstraction layer (IR): tables, columns, expressions, predicates,
clauses, queries.

Re-expresses the reference's qal (rbergm/PostBOUND ``postbound/qal/_qal.py``:
``TableReference`` ``_core.py:624``, ``ColumnReference`` ``:923``,
predicates ``:2506-3383``, clauses ``:5867-7867``, ``SqlQuery:8390``) as a
compact immutable Python IR. Deliberately *not* a class-for-class port: the
reference needs a rich expression tree because it must re-print hints and
analyze arbitrary SQL; here Catalyst is the analyzer, so expressions bottom
out in SQL text fragments early, while the *structural* layers the optimizer
instrumentation needs — predicate classification (join vs filter), the
predicate index, clause composition, query rewriting — are first-class.

Everything renders to ANSI SQL via ``to_sql()``; the same text runs on
``spark.sql`` and on the DuckDB oracle, which is how IR-built queries enter
the correctness gate.

Conventions copied from the reference (SURVEY.md §1.3): immutability with
value semantics (frozen dataclasses), lowercase identifier normalization,
mutation via ``replace``-style helpers returning new trees.
"""

from __future__ import annotations

import enum
import re
from dataclasses import dataclass, field, replace
from typing import Iterator


def _norm(name: str) -> str:
    return name.strip().lower()


# ---------------------------------------------------------------------------
# references
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TableReference:
    """ref ``_core.py:624``: named reference, not the data; ``virtual`` marks
    subquery/CTE aliases. The ``sample_*`` fields carry a TABLESAMPLE
    suffix (extension — the reference does not model sampling): either a
    Bernoulli percentage (+ optional REPEATABLE seed) or an n-ROWS cut."""

    full_name: str
    alias: str | None = None
    virtual: bool = False
    sample_percent: float | None = None
    sample_rows: int | None = None
    sample_seed: int | None = None

    def __post_init__(self):
        object.__setattr__(self, "full_name", _norm(self.full_name))
        if self.alias is not None:
            object.__setattr__(self, "alias", _norm(self.alias))

    @property
    def identifier(self) -> str:
        return self.alias or self.full_name

    def to_sql(self) -> str:
        out = f"{self.full_name} {self.alias}" if self.alias else self.full_name
        if self.sample_percent is not None:
            out += f" TABLESAMPLE ({self.sample_percent:g} PERCENT)"
            if self.sample_seed is not None:
                out += f" REPEATABLE({self.sample_seed})"
        elif self.sample_rows is not None:
            out += f" TABLESAMPLE ({self.sample_rows} ROWS)"
        return out


@dataclass(frozen=True)
class ColumnReference:
    """ref ``_core.py:923``: column optionally bound to a table."""

    name: str
    table: TableReference | None = None

    def __post_init__(self):
        object.__setattr__(self, "name", _norm(self.name))

    def to_sql(self) -> str:
        return f"{self.table.identifier}.{self.name}" if self.table else self.name


@dataclass(frozen=True)
class ValuesTableSource:
    """Inline VALUES relation in FROM (ref ``ValuesTableSource``
    qal/_qal.py:6436). Quacks like :class:`TableReference` (identifier /
    full_name / virtual) so it slots into ``SqlQuery.from_tables``."""

    rows: tuple[tuple["SqlExpression", ...], ...]
    alias: str = "v"
    columns: tuple[str, ...] = ()

    @property
    def full_name(self) -> str:
        return self.alias

    @property
    def identifier(self) -> str:
        return self.alias

    @property
    def virtual(self) -> bool:
        return True

    def to_sql(self) -> str:
        rendered = ", ".join(
            "(" + ", ".join(v.to_sql() for v in row) + ")" for row in self.rows
        )
        cols = f"({', '.join(self.columns)})" if self.columns else ""
        return f"(VALUES {rendered}) AS {self.alias}{cols}"


@dataclass(frozen=True)
class FunctionTableSource:
    """Table function in FROM (ref ``FunctionTableSource``
    qal/_qal.py:6584; tested with generate_series, tests/test_qal.py:580).
    ``range(lo, hi)`` is the portable spelling (Spark and DuckDB agree on
    half-open semantics and column aliasing)."""

    function: str
    args: tuple["SqlExpression", ...]
    alias: str = "t"
    columns: tuple[str, ...] = ()

    @property
    def full_name(self) -> str:
        return self.alias

    @property
    def identifier(self) -> str:
        return self.alias

    @property
    def virtual(self) -> bool:
        return True

    def to_sql(self) -> str:
        inner = ", ".join(a.to_sql() for a in self.args)
        cols = f"({', '.join(self.columns)})" if self.columns else ""
        return f"{self.function}({inner}) AS {self.alias}{cols}"


@dataclass(frozen=True)
class SubqueryTableSource:
    """Subquery in FROM (ref ``SubqueryTableSource`` qal/_qal.py:6270,
    incl. the LATERAL flag). Non-lateral FROM-subqueries are normally lifted
    into synthetic CTEs by the parser; this source models the correlated
    LATERAL case, which the algebra converter decorrelates into a join
    (the Spark-first equivalent of Catalyst's own DecorrelateInnerQuery)."""

    query: "SqlQuery"
    alias: str
    lateral: bool = False
    columns: tuple[str, ...] = ()
    #: synthetic source from a lifted correlated SCALAR subquery with
    #: ORDER BY … LIMIT 1 (the as-of/top-1 shape): joins LEFT so a
    #: match-less outer row reads NULL, per scalar-subquery semantics
    #: (a user-written comma-LATERAL stays an inner join)
    scalar_left: bool = False

    @property
    def full_name(self) -> str:
        return self.alias

    @property
    def identifier(self) -> str:
        return self.alias

    @property
    def virtual(self) -> bool:
        return True

    def to_sql(self) -> str:
        prefix = "LATERAL " if self.lateral else ""
        cols = f"({', '.join(self.columns)})" if self.columns else ""
        inner = " ".join(self.query.to_sql().split())
        return f"{prefix}({inner}) AS {self.alias}{cols}"


class JoinType(enum.Enum):
    """ref ``JoinType`` qal/_qal.py:6672 — the explicit-FROM join vocabulary.
    INNER/CROSS normally normalize to implicit form (ref ``explicit_to_implicit``
    transform.py:172); they appear here only after an outer join in the chain,
    where the normalization would change semantics."""

    INNER = "JOIN"
    LEFT = "LEFT OUTER JOIN"
    RIGHT = "RIGHT OUTER JOIN"
    FULL = "FULL OUTER JOIN"
    CROSS = "CROSS JOIN"
    NATURAL = "NATURAL JOIN"
    NATURAL_LEFT = "NATURAL LEFT OUTER JOIN"
    NATURAL_RIGHT = "NATURAL RIGHT OUTER JOIN"
    NATURAL_FULL = "NATURAL FULL OUTER JOIN"

    @property
    def natural(self) -> bool:
        return self.name.startswith("NATURAL")

    @property
    def spark_how(self) -> str:
        """The DataFrame ``how=`` string for this join type."""
        return {
            "INNER": "inner", "CROSS": "cross", "NATURAL": "inner",
            "LEFT": "left", "NATURAL_LEFT": "left",
            "RIGHT": "right", "NATURAL_RIGHT": "right",
            "FULL": "full", "NATURAL_FULL": "full",
        }[self.name]


@dataclass(frozen=True)
class JoinedTable:
    """One link of an explicit FROM join chain (ref ``JoinTableSource``
    qal/_qal.py:6710): join type + source + ON condition (None for
    NATURAL/CROSS) or a USING column list (ref JoinTableSource's
    using-clause handling via pglast in the reference's parser.py)."""

    join_type: "JoinType"
    source: "TableReference | ValuesTableSource | FunctionTableSource | SubqueryTableSource"
    condition: "AbstractPredicate | None" = None
    using: tuple[str, ...] = ()
    #: ASOF join marker (DuckDB dialect, beyond the reference): when set,
    #: the link picks ONE closest-in-ordering right row per left row
    #: instead of all matches. See :class:`AsofSpec`.
    asof: "AsofSpec | None" = None

    def to_sql(self) -> str:
        if self.asof is not None:
            kw = "LEFT JOIN" if self.join_type is JoinType.LEFT else "JOIN"
            return (
                f"ASOF {kw} {self.source.to_sql()} "
                f"ON {self.condition.to_sql()}"
            )
        out = f"{self.join_type.value} {self.source.to_sql()}"
        if self.condition is not None:
            out += f" ON {self.condition.to_sql()}"
        elif self.using:
            out += f" USING ({', '.join(self.using)})"
        return out


@dataclass(frozen=True)
class AsofSpec:
    """Parsed ASOF ordering: equality match keys + the one inequality.

    ``eqs`` holds (probe-side sql, right-side sql) pairs; ``probe`` and
    ``right_ord`` are the two sides of the inequality normalized to
    ``probe OP right_ord``; ``forward`` means the probe picks the
    EARLIEST right row at-or-after it (OP is <= / <) instead of the
    latest at-or-before; ``strict`` excludes the exactly-equal row."""

    eqs: tuple[tuple[str, str], ...]
    probe: str
    right_ord: str
    strict: bool
    forward: bool


# ---------------------------------------------------------------------------
# expressions — SQL-fragment-backed (Catalyst is the analyzer)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SqlExpression:
    """An expression = SQL text + the column references it mentions.

    The reference keeps a full class tree (MathExpression, CaseExpression,
    …, qal/_qal.py §2.3) because it re-analyzes expressions; our engine
    delegates analysis to Catalyst, so the IR only tracks what the
    optimizer layers consume: referenced columns/tables.
    """

    sql: str
    columns: tuple[ColumnReference, ...] = ()

    def tables(self) -> frozenset[str]:
        return frozenset(c.table.identifier for c in self.columns if c.table)

    def to_sql(self) -> str:
        return self.sql


def col(name: str, table: TableReference | None = None) -> SqlExpression:
    ref = ColumnReference(name, table)
    return SqlExpression(ref.to_sql(), (ref,))


def lit(value: object) -> SqlExpression:
    if value is None:
        return SqlExpression("NULL")
    if isinstance(value, bool):
        return SqlExpression("TRUE" if value else "FALSE")
    if isinstance(value, str):
        escaped = value.replace("'", "''")
        return SqlExpression(f"'{escaped}'")
    return SqlExpression(str(value))


def func(name: str, *args: SqlExpression, distinct: bool = False) -> SqlExpression:
    """ref ``FunctionExpression`` qal/_qal.py:796 — name passes through
    uninterpreted (the engine inherits Spark's whole function library)."""
    inner = ", ".join(a.to_sql() for a in args)
    prefix = "DISTINCT " if distinct else ""
    cols = tuple(c for a in args for c in a.columns)
    return SqlExpression(f"{name.lower()}({prefix}{inner})", cols)


# ---------------------------------------------------------------------------
# predicates
# ---------------------------------------------------------------------------


class LogicalOperator(enum.Enum):
    """ref ``LogicalOperator`` qal/_qal.py:34-58 (core comparison set)."""

    EQ = "="
    NE = "<>"
    LT = "<"
    LE = "<="
    GT = ">"
    GE = ">="
    LIKE = "LIKE"
    NOT_LIKE = "NOT LIKE"
    ILIKE = "ILIKE"
    NOT_ILIKE = "NOT ILIKE"
    IS_DISTINCT_FROM = "IS DISTINCT FROM"
    IS_NOT_DISTINCT_FROM = "IS NOT DISTINCT FROM"
    # Postgres-style array operators (ref qal/_qal.py:55-58: Contains,
    # ContainedBy, Overlaps) — first-class binary predicates in the IR;
    # to_sql() renders their Spark lowering since Spark's dialect has no
    # operator spelling (SURVEY §2.5, pred_array_operators)
    CONTAINS = "@>"
    CONTAINED_BY = "<@"
    OVERLAPS = "&&"


class CompoundOperator(enum.Enum):
    AND = "AND"
    OR = "OR"
    NOT = "NOT"


@dataclass(frozen=True)
class AbstractPredicate:
    """ref ``AbstractPredicate`` qal/_qal.py:2078. The central
    classification: a predicate *is a join* iff it references columns of
    ≥ 2 distinct relations."""

    def columns(self) -> tuple[ColumnReference, ...]:
        raise NotImplementedError

    def tables(self) -> frozenset[str]:
        return frozenset(c.table.identifier for c in self.columns() if c.table)

    def is_join(self) -> bool:
        return len(self.tables()) >= 2

    def is_filter(self) -> bool:
        return not self.is_join()

    def iterpredicates(self) -> Iterator["AbstractPredicate"]:
        """ALL leaf predicates of this tree, descending through AND, OR and
        NOT alike — for column/table introspection only. Never use this to
        DECOMPOSE a predicate: an OR branch is not a conjunct (see
        :meth:`conjuncts`)."""
        yield self

    def conjuncts(self) -> Iterator["AbstractPredicate"]:
        """Top-level AND decomposition: the units that can be moved,
        removed, or pushed independently. An OR or NOT subtree is ONE
        conjunct — splitting it would corrupt query semantics (removing
        one OR branch inverts results; the transform layer and the
        predicate index both rely on this)."""
        yield self

    def accept_visitor(self, visitor: "PredicateVisitor"):
        """Double dispatch (ref ``PredicateVisitor`` qal/_qal.py:3383)."""
        method = {
            "BinaryPredicate": "visit_binary",
            "BetweenPredicate": "visit_between",
            "InPredicate": "visit_in",
            "UnaryPredicate": "visit_unary",
            "CompoundPredicate": "visit_compound",
        }.get(type(self).__name__)
        if method is None:
            return visitor.generic_visit(self)
        return getattr(visitor, method)(self)

    def to_sql(self) -> str:
        raise NotImplementedError


@dataclass(frozen=True)
class BinaryPredicate(AbstractPredicate):
    """ref ``:2506``."""

    operation: LogicalOperator
    lhs: SqlExpression
    rhs: SqlExpression

    def columns(self):
        return self.lhs.columns + self.rhs.columns

    def to_sql(self) -> str:
        # The Postgres array operators have no Spark spelling — render
        # the lambda-free lowering (Spark-parsable, and re-parsable by
        # the native parser): containment via array_except emptiness,
        # overlap via arrays_overlap. The IR keeps the operator; only
        # the execution-facing text lowers. Duplicate elements are
        # irrelevant to containment, so array_except's dedup is exact.
        lhs, rhs = self.lhs.to_sql(), self.rhs.to_sql()
        if self.operation is LogicalOperator.CONTAINS:
            return f"size(array_except(({rhs}), ({lhs}))) = 0"
        if self.operation is LogicalOperator.CONTAINED_BY:
            return f"size(array_except(({lhs}), ({rhs}))) = 0"
        if self.operation is LogicalOperator.OVERLAPS:
            return f"arrays_overlap(({lhs}), ({rhs}))"
        return f"{lhs} {self.operation.value} {rhs}"


@dataclass(frozen=True)
class BetweenPredicate(AbstractPredicate):
    """ref ``:2632``."""

    expr: SqlExpression
    lower: SqlExpression
    upper: SqlExpression

    def columns(self):
        return self.expr.columns + self.lower.columns + self.upper.columns

    def to_sql(self) -> str:
        return f"{self.expr.to_sql()} BETWEEN {self.lower.to_sql()} AND {self.upper.to_sql()}"


@dataclass(frozen=True)
class InPredicate(AbstractPredicate):
    """ref ``:2795`` — value lists; subquery form renders a nested query."""

    expr: SqlExpression
    values: tuple[SqlExpression, ...] = ()
    subquery: "SqlQuery | None" = None
    negated: bool = False
    #: row-constructor membership `(a, b) IN (subquery)` — the element
    #: expressions, so the algebra can build the multi-column semi/anti
    #: join (extension beyond the reference: no RowExpr in its parser)
    row_elems: tuple[SqlExpression, ...] = ()

    def columns(self):
        return self.expr.columns + tuple(c for v in self.values for c in v.columns)

    def to_sql(self) -> str:
        neg = "NOT " if self.negated else ""
        if self.subquery is not None:
            return f"{self.expr.to_sql()} {neg}IN ({self.subquery.to_sql()})"
        inner = ", ".join(v.to_sql() for v in self.values)
        return f"{self.expr.to_sql()} {neg}IN ({inner})"


class UnaryOperation(enum.Enum):
    IS_NULL = "IS NULL"
    IS_NOT_NULL = "IS NOT NULL"
    EXISTS = "EXISTS"
    NOT_EXISTS = "NOT EXISTS"
    BARE = ""  # bare boolean expression / UDF filter (tests/test_qal.py:475)
    # ANSI boolean tests (pg BooleanTest; Spark SQL and DuckDB both
    # execute the postfix spelling verbatim)
    IS_TRUE = "IS TRUE"
    IS_NOT_TRUE = "IS NOT TRUE"
    IS_FALSE = "IS FALSE"
    IS_NOT_FALSE = "IS NOT FALSE"
    IS_UNKNOWN = "IS UNKNOWN"
    IS_NOT_UNKNOWN = "IS NOT UNKNOWN"


@dataclass(frozen=True)
class UnaryPredicate(AbstractPredicate):
    """ref ``:2971``."""

    operation: UnaryOperation
    expr: SqlExpression | None = None
    subquery: "SqlQuery | None" = None

    def columns(self):
        return self.expr.columns if self.expr is not None else ()

    def to_sql(self) -> str:
        if self.operation in (UnaryOperation.EXISTS, UnaryOperation.NOT_EXISTS):
            return f"{self.operation.value} ({self.subquery.to_sql()})"
        if self.operation is UnaryOperation.BARE:
            return self.expr.to_sql()
        return f"{self.expr.to_sql()} {self.operation.value}"


@dataclass(frozen=True)
class CompoundPredicate(AbstractPredicate):
    """ref ``:3098`` — AND/OR/NOT trees."""

    operation: CompoundOperator
    children: tuple[AbstractPredicate, ...]

    def columns(self):
        return tuple(c for child in self.children for c in child.columns())

    def iterpredicates(self):
        for child in self.children:
            yield from child.iterpredicates()

    def conjuncts(self):
        if self.operation is CompoundOperator.AND:
            for child in self.children:
                yield from child.conjuncts()
        else:
            # OR / NOT: indivisible — the whole subtree is one conjunct
            yield self

    def to_sql(self) -> str:
        if self.operation is CompoundOperator.NOT:
            return f"NOT ({self.children[0].to_sql()})"
        joiner = f" {self.operation.value} "
        return joiner.join(f"({c.to_sql()})" for c in self.children)


def and_(*predicates: AbstractPredicate) -> AbstractPredicate:
    flat: list[AbstractPredicate] = []
    for p in predicates:  # AND-flattening built in (ref transform.py:125)
        if isinstance(p, CompoundPredicate) and p.operation is CompoundOperator.AND:
            flat.extend(p.children)
        else:
            flat.append(p)
    return flat[0] if len(flat) == 1 else CompoundPredicate(CompoundOperator.AND, tuple(flat))


def eq(lhs: SqlExpression, rhs: SqlExpression) -> BinaryPredicate:
    return BinaryPredicate(LogicalOperator.EQ, lhs, rhs)


# ---------------------------------------------------------------------------
# predicate visitor (ref PredicateVisitor qal/_qal.py:3383; the same pattern
# backs SqlExpressionVisitor :1680 and ClauseVisitor :7966)
# ---------------------------------------------------------------------------


class PredicateVisitor:
    """Double-dispatch over the predicate classes. Subclass and override the
    ``visit_*`` methods; unhandled types fall through to
    :meth:`generic_visit` (raises by default, so incomplete visitors fail
    loudly instead of silently skipping predicates)."""

    def generic_visit(self, predicate: "AbstractPredicate"):
        raise NotImplementedError(type(predicate).__name__)

    def visit_binary(self, predicate: "BinaryPredicate"):
        return self.generic_visit(predicate)

    def visit_between(self, predicate: "BetweenPredicate"):
        return self.generic_visit(predicate)

    def visit_in(self, predicate: "InPredicate"):
        return self.generic_visit(predicate)

    def visit_unary(self, predicate: "UnaryPredicate"):
        return self.generic_visit(predicate)

    def visit_compound(self, predicate: "CompoundPredicate"):
        return self.generic_visit(predicate)


# ---------------------------------------------------------------------------
# simplified predicate views (ref SimpleFilter qal/_qal.py:3718,
# SimpleJoin :3944 — the convenience layer stage authors use constantly)
# ---------------------------------------------------------------------------

_CAST_RE_SRC = r"^CAST\((?P<inner>.+) AS [\w ()]+\)$"


def _strip_cast(sql: str) -> str:
    """Casts are tolerated and dropped by the views (ref :3727-3728) —
    including the parser's own int-cast lowering ``CAST(round(x) AS
    int)`` (round-11: DuckDB/Postgres cast-rounding parity), whose
    round() wrapper is part of the cast, not a value modification the
    author wrote."""
    import re as _re

    m = _re.match(_CAST_RE_SRC, sql.strip(), _re.I)
    inner = m.group("inner").strip() if m else sql.strip()
    rm = _re.match(r"^round\((?P<x>.+)\)$", inner, _re.I)
    if m and rm:
        inner = rm.group("x").strip()
    return inner


def _as_plain_column(expr: SqlExpression) -> ColumnReference | None:
    """The expression iff it is a bare (possibly cast) column reference —
    anything value-modifying (function call, arithmetic) disqualifies."""
    if len(expr.columns) != 1:
        return None
    col_ref = expr.columns[0]
    return col_ref if _strip_cast(expr.sql) == col_ref.to_sql() else None


def _is_static(expr: SqlExpression) -> bool:
    return not expr.columns


@dataclass(frozen=True)
class SimpleFilter:
    """Read-only ``<column> <op> <static values>`` view of a filter
    predicate (ref ``SimpleFilter`` qal/_qal.py:3718). Derivable from
    binary, BETWEEN and IN-list predicates whose column side is a bare
    column and whose value side is static; everything else is rejected by
    :meth:`wrap` / skipped by :meth:`wrap_all`."""

    predicate: AbstractPredicate
    column: ColumnReference
    operation: str  # LogicalOperator value, "BETWEEN", or "IN"
    values: tuple[SqlExpression, ...]

    @staticmethod
    def can_wrap(predicate: AbstractPredicate) -> bool:
        try:
            SimpleFilter.wrap(predicate)
            return True
        except ValueError:
            return False

    @staticmethod
    def wrap(predicate: AbstractPredicate) -> "SimpleFilter":
        if predicate.is_join():
            raise ValueError(f"not a filter: {predicate.to_sql()}")
        if isinstance(predicate, BinaryPredicate):
            col = _as_plain_column(predicate.lhs)
            val = predicate.rhs
            op = predicate.operation
            if col is None and (c2 := _as_plain_column(predicate.rhs)):
                # the view always reads `<column> <op> <value>`, so a
                # literal-on-the-left comparison must mirror its operator
                # (`100 > t.x` is `t.x < 100`, not `t.x > 100`)
                mirror = {
                    LogicalOperator.LT: LogicalOperator.GT,
                    LogicalOperator.LE: LogicalOperator.GE,
                    LogicalOperator.GT: LogicalOperator.LT,
                    LogicalOperator.GE: LogicalOperator.LE,
                    LogicalOperator.EQ: LogicalOperator.EQ,
                    LogicalOperator.NE: LogicalOperator.NE,
                    LogicalOperator.IS_DISTINCT_FROM: LogicalOperator.IS_DISTINCT_FROM,
                    LogicalOperator.IS_NOT_DISTINCT_FROM: LogicalOperator.IS_NOT_DISTINCT_FROM,
                }
                if op not in mirror:
                    # LIKE-family patterns are positional; a column used as
                    # the pattern is not a simple filter
                    raise ValueError(f"cannot simplify {predicate.to_sql()}")
                col, val, op = c2, predicate.lhs, mirror[op]
            if col is None or not _is_static(val):
                raise ValueError(f"cannot simplify {predicate.to_sql()}")
            return SimpleFilter(predicate, col, op.value, (val,))
        if isinstance(predicate, BetweenPredicate):
            col = _as_plain_column(predicate.expr)
            if col is None or not (
                _is_static(predicate.lower) and _is_static(predicate.upper)
            ):
                raise ValueError(f"cannot simplify {predicate.to_sql()}")
            return SimpleFilter(
                predicate, col, "BETWEEN", (predicate.lower, predicate.upper)
            )
        if isinstance(predicate, InPredicate):
            col = _as_plain_column(predicate.expr)
            if (
                col is None
                or predicate.subquery is not None
                or predicate.negated
                or not all(_is_static(v) for v in predicate.values)
            ):
                raise ValueError(f"cannot simplify {predicate.to_sql()}")
            return SimpleFilter(predicate, col, "IN", predicate.values)
        raise ValueError(f"cannot simplify {predicate.to_sql()}")

    @staticmethod
    def wrap_all(predicates: "QueryPredicates | list[AbstractPredicate]") -> list["SimpleFilter"]:
        """Lossy bulk conversion: joins and complex filters drop (ref
        docstring :3750-3755)."""
        pool = (
            predicates.filters()
            if isinstance(predicates, QueryPredicates)
            else predicates
        )
        out = []
        for p in pool:
            try:
                out.append(SimpleFilter.wrap(p))
            except ValueError:
                continue
        return out

    def to_sql(self) -> str:
        return self.predicate.to_sql()


@dataclass(frozen=True)
class SimpleJoin:
    """Read-only ``<first col> = <second col>`` view of an equi-join
    predicate (ref ``SimpleJoin`` qal/_qal.py:3944)."""

    predicate: AbstractPredicate
    lhs: ColumnReference
    rhs: ColumnReference

    @staticmethod
    def can_wrap(predicate: AbstractPredicate) -> bool:
        try:
            SimpleJoin.wrap(predicate)
            return True
        except ValueError:
            return False

    @staticmethod
    def wrap(predicate: AbstractPredicate) -> "SimpleJoin":
        if not (
            isinstance(predicate, BinaryPredicate)
            and predicate.operation is LogicalOperator.EQ
            and predicate.is_join()
        ):
            raise ValueError(f"not an equi-join: {predicate.to_sql()}")
        lhs = _as_plain_column(predicate.lhs)
        rhs = _as_plain_column(predicate.rhs)
        if lhs is None or rhs is None:
            raise ValueError(f"cannot simplify {predicate.to_sql()}")
        return SimpleJoin(predicate, lhs, rhs)

    @staticmethod
    def wrap_all(predicates: "QueryPredicates | list[AbstractPredicate]") -> list["SimpleJoin"]:
        pool = (
            predicates.joins()
            if isinstance(predicates, QueryPredicates)
            else predicates
        )
        out = []
        for p in pool:
            try:
                out.append(SimpleJoin.wrap(p))
            except ValueError:
                continue
        return out

    def tables(self) -> frozenset[str]:
        return self.predicate.tables()

    def to_sql(self) -> str:
        return self.predicate.to_sql()


# ---------------------------------------------------------------------------
# predicate index
# ---------------------------------------------------------------------------


class QueryPredicates:
    """ref ``QueryPredicates`` qal/_qal.py:4304 — the index every ordering
    algorithm queries: joins(), filters(), joins_between, filters_for, and
    the equivalence-class closure (``determine_join_equivalence_classes``
    ``:3557`` / ``generate_predicates_for_equivalence_classes`` ``:3599``)."""

    def __init__(self, root: AbstractPredicate | None):
        self.root = root
        # index over CONJUNCTS, not leaves: an OR of two single-table
        # filters must not surface as two independently-movable predicates
        self._leaves = list(root.conjuncts()) if root is not None else []

    def joins(self) -> list[AbstractPredicate]:
        return [p for p in self._leaves if p.is_join()]

    def filters(self) -> list[AbstractPredicate]:
        return [p for p in self._leaves if p.is_filter()]

    def joins_between(self, t1: str, t2: str) -> list[AbstractPredicate]:
        want = {_norm(t1), _norm(t2)}
        return [p for p in self.joins() if p.tables() == want]

    def filters_for(self, table: str) -> list[AbstractPredicate]:
        return [p for p in self.filters() if p.tables() == {_norm(table)}]

    def simplify(self) -> "list[SimpleFilter | SimpleJoin]":
        """Every leaf predicate as its simplified view where one exists
        (ref ``QueryPredicates.simplify()`` mentioned at qal/_qal.py:3754);
        unrepresentable predicates are dropped, like the reference's lossy
        bulk conversion."""
        return SimpleJoin.wrap_all(self) + SimpleFilter.wrap_all(self)

    def join_equivalence_classes(self) -> list[set[ColumnReference]]:
        """Transitive closure of equi-join columns (ref ``:3557``).

        Only PLAIN column = column predicates enter a class: for
        ``a.x + a.z = b.y`` equality is a fact about the *expression*, not
        its member columns — classing all three would let
        ``equivalence_class_predicates`` invent ``a.x = b.y``-style
        predicates no engine may add, silently dropping rows when
        injected by ``transform.add_ec_predicates``."""
        classes: list[set[ColumnReference]] = []
        for p in self.joins():
            if not (
                isinstance(p, BinaryPredicate) and p.operation is LogicalOperator.EQ
            ):
                continue
            lhs, rhs = _as_plain_column(p.lhs), _as_plain_column(p.rhs)
            if lhs is None or rhs is None:
                continue
            members = {lhs, rhs}
            merged = [c for c in classes if c & members]
            for c in merged:
                members |= c
                classes.remove(c)
            classes.append(members)
        return classes

    def equivalence_class_predicates(self) -> list[BinaryPredicate]:
        """All pairwise equi-joins implied by the closure (ref ``:3599``) —
        feeds join-graph densification so ordering algorithms see every
        join opportunity, not just the written ones."""
        out: list[BinaryPredicate] = []
        seen: set[tuple[str, str]] = set()
        for cls in self.join_equivalence_classes():
            cols = sorted(cls, key=lambda c: c.to_sql())
            for i, a in enumerate(cols):
                for b in cols[i + 1 :]:
                    key = (a.to_sql(), b.to_sql())
                    if key not in seen:
                        seen.add(key)
                        out.append(
                            eq(
                                SqlExpression(a.to_sql(), (a,)),
                                SqlExpression(b.to_sql(), (b,)),
                            )
                        )
        return out


# ---------------------------------------------------------------------------
# clauses + query
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class BaseProjection:
    """ref ``BaseProjection`` qal/_qal.py:5725: expression + optional alias."""

    expr: SqlExpression
    alias: str | None = None

    def to_sql(self) -> str:
        return f"{self.expr.to_sql()} AS {self.alias}" if self.alias else self.expr.to_sql()


def star() -> BaseProjection:
    return BaseProjection(SqlExpression("*"))


class CommonTableExpression(tuple):
    """A ``WITH`` entry: a ``(name, query)`` pair plus the MATERIALIZED
    flag (ref ``CommonTableExpression`` qal/_qal.py:5605 — target-column
    lists are desugared into the body's projection aliases at parse time,
    ref ``WithQuery`` :5304, so only the flag needs carrying).

    Subclasses ``tuple`` so every existing ``for name, sub in q.ctes``
    consumer keeps working unchanged; equality/hash stay value-based on
    the pair (MATERIALIZED does not change the relation's content, only
    its execution — ``df.cache()`` on the Spark side)."""

    __slots__ = ()

    def __new__(cls, name: str, query):
        return super().__new__(cls, (name, query))

    # the flag is encoded by the SUBCLASS (MaterializedCte) — a __slots__
    # tuple subclass cannot hold instance attributes, and keeping the pair
    # hash/eq-identical to a plain (name, query) tuple is the compatibility
    # contract
    @property
    def name(self) -> str:
        return self[0]

    @property
    def query(self):
        return self[1]

    @property
    def materialized(self) -> bool:
        return False


class MaterializedCte(CommonTableExpression):
    """``WITH name AS MATERIALIZED (…)`` — the engine compiles the CTE
    subtree once and ``.cache()``\\ s it so every reference shares the
    materialized result (the survey's mapping of the reference's
    MATERIALIZED flag onto Spark)."""

    __slots__ = ()

    @property
    def materialized(self) -> bool:
        return True


def references_table(query, name: str) -> bool:
    """True when ``name`` appears as a FULL table name in the query's FROM
    surface (implicit list or explicit join chain), descending through set
    operations, FROM-subqueries, and nested CTE bodies. ``tables()`` is
    unsuitable here: it returns identifiers, so an aliased self-reference
    (``FROM reach r``) would hide. Used for WITH RECURSIVE self-reference
    detection (DuckDB/Postgres accept nested recursive refs in derived
    tables, so the detection must see through them)."""
    if isinstance(query, SetQuery):
        return references_table(query.left, name) or references_table(
            query.right, name
        )
    # local CTEs first, in declaration order: one named `name` SHADOWS the
    # outer relation for this query's FROM (and later siblings) — a scope
    # where the name is rebound cannot recurse; bodies declared BEFORE the
    # shadowing entry still see the outer name
    for cte in query.ctes:
        if cte[0] == name:
            return False
        if references_table(cte[1], name):
            return True
    sources = list(query.from_tables) + [j.source for j in query.joins]
    for src in sources:
        if getattr(src, "full_name", None) == name and not isinstance(
            src, SubqueryTableSource
        ):
            return True
        sub = getattr(src, "query", None)
        if sub is not None and references_table(sub, name):
            return True
    return False


_QAL_STRING_LIT_RE = re.compile(r"'(?:[^']|'')*'")


def _expr_texts(query) -> Iterator[str]:
    """Raw SQL texts of a query's expressions and predicates (select items,
    WHERE/HAVING rendered, group/order keys) — the places a scalar
    subquery can hide as uninterpreted text."""
    for p in query.select:
        yield p.expr.sql
    for e in query.group_by:
        yield e.sql
    for o in query.order_by:
        yield o.expr.sql
    if query.where is not None:
        yield query.where.to_sql()
    if query.having is not None:
        yield query.having.to_sql()


def _iter_structural_subqueries(pred) -> Iterator["SqlQuery"]:
    """IN-/EXISTS-carried subqueries of a predicate tree."""
    if pred is None:
        return
    if isinstance(pred, CompoundPredicate):
        for c in pred.children:
            yield from _iter_structural_subqueries(c)
        return
    sub = getattr(pred, "subquery", None)
    if sub is not None:
        yield sub


def references_table_deep(query, name: str) -> bool:
    """:func:`references_table` extended BELOW the FROM surface: descends
    into the structural predicate subqueries (IN / EXISTS bodies in WHERE
    and HAVING) and text-scans expression-embedded scalar subqueries for a
    ``FROM``/``JOIN`` mention of ``name``. Purpose: a WITH RECURSIVE
    self-reference hiding inside a subquery of the step must be REJECTED
    loudly (Postgres does too — "recursive reference to query must not
    appear within a subquery") instead of silently resolving the name
    against the catalog (advisor finding, round 10). Heuristic on the
    raw-text side by design: a miss falls back to the resolver's
    unknown-table error, never to silent data."""
    if references_table(query, name):
        return True
    if isinstance(query, SetQuery):
        return references_table_deep(query.left, name) or references_table_deep(
            query.right, name
        )
    for cte in query.ctes:
        if cte[0] == name:
            return False  # rebound: this scope cannot recurse on `name`
        if references_table_deep(cte[1], name):
            return True

    token_re = re.compile(
        rf"(?i)\b(?:from|join)\s+((?:[\w$]+\.)?[\w$]+"
        rf"(?:\s+(?:as\s+)?[\w$]+)?(?:\s*,\s*(?:[\w$]+\.)?[\w$]+"
        rf"(?:\s+(?:as\s+)?[\w$]+)?)*)"
    )

    def text_hit(sql_text: str) -> bool:
        blanked = _QAL_STRING_LIT_RE.sub("''", sql_text)
        if "(select" not in blanked.lower().replace("( ", "("):
            return False  # no embedded subquery → nothing below the surface
        for m in token_re.finditer(blanked):
            for item in m.group(1).split(","):
                t = re.match(r"\s*((?:[\w$]+\.)?[\w$]+)", item)
                if t and t.group(1).split(".")[-1].lower() == name.lower():
                    return True
        return False

    for pred in (query.where, query.having):
        for sub in _iter_structural_subqueries(pred):
            if references_table_deep(sub, name) or references_table(sub, name):
                return True
    for src in list(query.from_tables) + [j.source for j in query.joins]:
        sub = getattr(src, "query", None)
        if sub is not None and references_table_deep(sub, name):
            return True
    return any(text_hit(t) for t in _expr_texts(query))


class RecursiveCte(CommonTableExpression):
    """``WITH RECURSIVE name AS (base UNION [ALL] step)`` — extension
    beyond the reference, which excludes recursion outright
    (qal/_qal.py:8436). The body is a SetQuery whose right operand
    references ``name``; the algebra converts it to a RecursiveUnion
    fixpoint and the compiler iterates with ANSI working-table semantics
    (each step sees only the previous iteration's rows; UNION dedups
    globally and is cycle-safe)."""

    __slots__ = ()

    @property
    def recursive(self) -> bool:
        return True


@dataclass(frozen=True)
class OrderByExpression:
    """ref ``:7342`` — per-key direction + NULLS FIRST/LAST."""

    expr: SqlExpression
    ascending: bool = True
    nulls_first: bool | None = None

    def to_sql(self) -> str:
        out = f"{self.expr.to_sql()} {'ASC' if self.ascending else 'DESC'}"
        if self.nulls_first is not None:
            out += " NULLS FIRST" if self.nulls_first else " NULLS LAST"
        return out


@dataclass(frozen=True)
class Explain:
    """EXPLAIN clause (ref ``Explain`` qal/_qal.py:5161, parsed by
    ``_pglast_parse_explain`` parser.py:1996): ANALYZE flag + output
    format. Execution maps to Spark's plan introspection — the facade
    returns the formatted plan text as the statement's result."""

    analyze: bool = False
    format: str = "TEXT"

    def to_sql(self) -> str:
        opts = []
        if self.analyze:
            opts.append("ANALYZE")
        if self.format.upper() != "TEXT":
            opts.append(f"FORMAT {self.format}")
        if self.format.upper() != "TEXT":
            return f"EXPLAIN ({', '.join(opts)})"
        return "EXPLAIN ANALYZE" if self.analyze else "EXPLAIN"


@dataclass(frozen=True)
class SqlQuery:
    """Clause-structured immutable SELECT (ref ``SqlQuery`` qal/_qal.py:8390;
    no DDL/DML, no recursive CTEs — same scope limits, ``:8433-8437``)."""

    select: tuple[BaseProjection, ...]
    from_tables: tuple[TableReference, ...]
    where: AbstractPredicate | None = None
    group_by: tuple[SqlExpression, ...] = ()
    having: AbstractPredicate | None = None
    order_by: tuple[OrderByExpression, ...] = ()
    limit: int | None = None
    offset: int | None = None
    # FETCH direction (ref FetchDirection qal/_qal.py:7548): "first" is the
    # LIMIT-equivalent default; "prior"/"last" select from the END of the
    # result order (compiled via the sort-inversion rewrite, SURVEY §2.4)
    fetch_direction: str = "first"
    # FETCH FIRST n ROWS WITH TIES (extension beyond the reference's Limit
    # clause, which models ONLY): the result also includes every row tied
    # with the last in-window row under the ORDER BY; compiled to a
    # rank()-window filter (SURVEY §2.4)
    fetch_ties: bool = False
    distinct: bool = False
    # DISTINCT ON (exprs) — Postgres extension the reference models in the
    # Select ctor (ref qal/_qal.py:5867); rendered natively (DuckDB supports
    # it) and compiled to a row_number window filter for Spark
    distinct_on: tuple[SqlExpression, ...] = ()
    # explicit join chain appended after the implicit FROM list (ref
    # ExplicitFromClause :7074); inner joins normalize into WHERE instead,
    # so entries here are outer/natural/cross links that must keep their
    # join semantics
    joins: tuple[JoinedTable, ...] = ()
    ctes: tuple[tuple[str, "SqlQuery"], ...] = ()
    # hint block carried with the query (ref ``Hint`` qal/_qal.py:5061);
    # rendered as a SQL hint comment — Spark's parser interprets it
    # (/*+ BROADCAST(t) */ etc.), DuckDB treats it as a comment, so hinted
    # renderings stay oracle-safe
    hint: str | None = None
    # EXPLAIN clause (ref explain_clause qal/_qal.py:8420) — the facade
    # executes the inner query's PLAN introspection instead of its rows
    explain: "Explain | None" = None

    # -- introspection ------------------------------------------------------

    def tables(self) -> frozenset[str]:
        return frozenset(t.identifier for t in self.from_tables) | frozenset(
            j.source.identifier for j in self.joins
        )

    def predicates(self) -> QueryPredicates:
        return QueryPredicates(self.where)

    # -- rendering ----------------------------------------------------------

    def to_sql(self) -> str:
        parts: list[str] = []
        if self.explain is not None:
            parts.append(self.explain.to_sql())
        if self.ctes:
            rendered = ", ".join(
                f"{cte[0]} AS "
                f"{'MATERIALIZED ' if getattr(cte, 'materialized', False) else ''}"
                f"({cte[1].to_sql()})"
                for cte in self.ctes
            )
            kw = (
                "WITH RECURSIVE"
                if any(getattr(c, "recursive", False) for c in self.ctes)
                else "WITH"
            )
            parts.append(f"{kw} {rendered}")
        if self.distinct_on:
            on = ", ".join(e.to_sql() for e in self.distinct_on)
            distinct = f"DISTINCT ON ({on}) "
        else:
            distinct = "DISTINCT " if self.distinct else ""
        hint = f"/*+ {self.hint} */ " if self.hint else ""
        parts.append(
            "SELECT " + hint + distinct + ", ".join(p.to_sql() for p in self.select)
        )
        if self.from_tables:  # FROM-less scalar SELECT is legal
            from_sql = "FROM " + ", ".join(t.to_sql() for t in self.from_tables)
            for j in self.joins:
                from_sql += f" {j.to_sql()}"
            parts.append(from_sql)
        if self.where is not None:
            parts.append("WHERE " + self.where.to_sql())
        if self.group_by:
            parts.append("GROUP BY " + ", ".join(e.to_sql() for e in self.group_by))
        if self.having is not None:
            parts.append("HAVING " + self.having.to_sql())
        if self.order_by:
            parts.append("ORDER BY " + ", ".join(o.to_sql() for o in self.order_by))
        if self.limit is not None:
            if self.fetch_direction != "first":
                # deliberate IR spelling (mirrors the reference's
                # FetchDirection model, qal/_qal.py:7548): PRIOR/LAST are
                # cursor-style directions no execution engine accepts in
                # query position — only THIS parser round-trips the text.
                # Engine execution goes through the algebra path's
                # sort-inversion rewrite, never through this rendering.
                parts.append(
                    f"FETCH {self.fetch_direction.upper()} {self.limit} ROWS ONLY"
                )
            elif self.fetch_ties:
                parts.append(f"FETCH FIRST {self.limit} ROWS WITH TIES")
            else:
                parts.append(f"LIMIT {self.limit}")
        if self.offset is not None:
            parts.append(f"OFFSET {self.offset}")
        return "\n".join(parts)

    # -- mutation helpers (immutable; ref mutate() convention §1.3) ---------

    def with_clause(self, **changes) -> "SqlQuery":
        return replace(self, **changes)


class SetOperator(enum.Enum):
    """ref ``SetOperator`` qal/_qal.py:79-86. The ALL bag-semantics
    variants of INTERSECT/EXCEPT are an extension beyond the reference
    (its enum stops at UNION ALL); Spark executes them natively via
    ``intersectAll``/``exceptAll``."""

    UNION = "UNION"
    UNION_ALL = "UNION ALL"
    INTERSECT = "INTERSECT"
    INTERSECT_ALL = "INTERSECT ALL"
    EXCEPT = "EXCEPT"
    EXCEPT_ALL = "EXCEPT ALL"


@dataclass(frozen=True)
class SetQuery:
    """Set-operation query (ref ``SetQuery`` qal/_qal.py:9396): two operand
    queries combined by UNION [ALL] / INTERSECT / EXCEPT, with optional
    outer ORDER BY / LIMIT / OFFSET and a WITH clause applying to the
    combined result (the reference's SetQuery carries a full
    ``limit_clause`` incl. offset, :9425/:9449, and a ``cte_clause``)."""

    left: "SqlQuery | SetQuery"
    operator: SetOperator
    right: "SqlQuery | SetQuery"
    order_by: tuple[OrderByExpression, ...] = ()
    limit: int | None = None
    offset: int | None = None
    # FETCH FIRST n ROWS WITH TIES on the combined result (extension — see
    # SqlQuery.fetch_ties); ANSI allows ties on set queries too
    fetch_ties: bool = False
    ctes: tuple[tuple[str, "SqlQuery"], ...] = ()
    # EXPLAIN clause (ref SetQuery explain_clause qal/_qal.py:9434)
    explain: "Explain | None" = None

    def tables(self) -> frozenset[str]:
        return self.left.tables() | self.right.tables()

    def to_sql(self) -> str:
        parts: list[str] = []
        if self.explain is not None:
            parts.append(self.explain.to_sql())
        if self.ctes:
            rendered = ", ".join(
                f"{cte[0]} AS "
                f"{'MATERIALIZED ' if getattr(cte, 'materialized', False) else ''}"
                f"({cte[1].to_sql()})"
                for cte in self.ctes
            )
            kw = (
                "WITH RECURSIVE"
                if any(getattr(c, "recursive", False) for c in self.ctes)
                else "WITH"
            )
            parts.append(f"{kw} {rendered}")
        parts += [
            f"({self.left.to_sql()})",
            self.operator.value,
            f"({self.right.to_sql()})",
        ]
        if self.order_by:
            parts.append("ORDER BY " + ", ".join(o.to_sql() for o in self.order_by))
        if self.limit is not None:
            if self.fetch_ties:
                parts.append(f"FETCH FIRST {self.limit} ROWS WITH TIES")
            else:
                parts.append(f"LIMIT {self.limit}")
        if self.offset is not None:
            parts.append(f"OFFSET {self.offset}")
        return "\n".join(parts)

    # -- mutation helper (immutable; mirrors SqlQuery.with_clause) ----------

    def with_clause(self, **changes) -> "SetQuery":
        return replace(self, **changes)
