"""Relational-algebra logical operators — the engine's logical plan language.

Re-expresses the reference's 16-node relational algebra
(/root/reference/postbound/relalg.py: RelNode :87, Selection :449,
CrossProduct :559, Union :669, Intersection :780, Difference :892,
Relation :1004, ThetaJoin :1139, Projection :1268, Grouping :1376,
Rename :1535, Sort :1654, Map :1781, DuplicateElimination :1926,
SemiJoin :2001, AntiJoin :2158, SubqueryScan :2316) as immutable Python
dataclasses. This is NOT a port of the reference's tree machinery: nodes here
are thin declarations compiled directly to Spark DataFrames
(:mod:`postbound_spark.operators.compiler`), so Catalyst — not this layer —
performs expression analysis, predicate placement, and physical planning.

Scalar expressions and predicates are Spark-SQL strings (parsed by Catalyst
via ``F.expr``). The reference models expressions as a parallel class tree
(qal/_qal.py); delegating to Catalyst's parser is the Spark-first equivalent
and keeps the whole expression surface (CASE, CAST, windows, arrays,
quantifiers, lambdas) available without re-implementation.

Extensions relative to the reference's 16-node set: a ``Limit`` node (the
reference keeps LIMIT/OFFSET at the clause level only — relalg.py:24
mentions it but no node exists, SURVEY.md §2.1), ``Values`` /
``TableFunction`` / ``SingleRow`` leaves for the FROM-source vocabulary,
outer-join semantics on ``ThetaJoin`` (``how``) plus a ``NaturalJoin`` node
(the reference's algebra is inner-only, relalg.py:1550 — the qal layer's
JoinType needed a sub-clause representation here).
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields


@dataclass(frozen=True)
class RelNode:
    """Base class for all logical operators. Immutable; children are held in
    declared dataclass fields (ref pattern: relalg.py:87 ``RelNode`` with
    precomputed hashes — Python ``frozen`` dataclasses give us the same)."""

    def children(self) -> tuple["RelNode", ...]:
        out = []
        for f in fields(self):
            value = getattr(self, f.name)
            if isinstance(value, RelNode):
                out.append(value)
            elif isinstance(value, tuple):
                out.extend(v for v in value if isinstance(v, RelNode))
        return tuple(out)

    def accept(self, visitor: "RelNodeVisitor"):
        method = "visit_" + type(self).__name__.lower()
        return getattr(visitor, method)(self)

    def mutate(self, **changes) -> "RelNode":
        """Return a copy with the given fields replaced (ref:
        relalg.py:2547 tree-mutation utilities — trivially expressible with
        frozen dataclasses)."""
        import dataclasses

        return dataclasses.replace(self, **changes)

    def walk(self):
        yield self
        for child in self.children():
            yield from child.walk()

    def tables(self) -> set[str]:
        """All base-relation names in this subtree."""
        return {n.table for n in self.walk() if isinstance(n, Relation) and n.table}


@dataclass(frozen=True)
class Relation(RelNode):
    """Leaf: a base table (by catalog name) or a subquery-backed relation
    (ref: relalg.py:1004)."""

    table: str | None = None
    subquery: RelNode | None = None
    alias: str | None = None

    def __post_init__(self):
        if (self.table is None) == (self.subquery is None):
            raise ValueError("Relation needs exactly one of table / subquery")


@dataclass(frozen=True)
class Selection(RelNode):
    """σ_θ — filter by an arbitrary predicate (ref: relalg.py:449)."""

    child: RelNode = None  # type: ignore[assignment]
    predicate: str = ""


@dataclass(frozen=True)
class Projection(RelNode):
    """π — keep listed expressions; bag semantics, no dedup
    (ref: relalg.py:1268-1273)."""

    child: RelNode = None  # type: ignore[assignment]
    columns: tuple[str, ...] = ()


@dataclass(frozen=True)
class Map(RelNode):
    """χ — compute new expressions from existing columns
    (ref: relalg.py:1781). ``expressions`` maps target name → SQL expression;
    existing columns pass through."""

    child: RelNode = None  # type: ignore[assignment]
    expressions: tuple[tuple[str, str], ...] = ()


@dataclass(frozen=True)
class Rename(RelNode):
    """ρ — rename columns (ref: relalg.py:1535; unused there because natural
    joins are unsupported — we implement it anyway, it is one Spark call)."""

    child: RelNode = None  # type: ignore[assignment]
    mapping: tuple[tuple[str, str], ...] = ()  # (old, new)


@dataclass(frozen=True)
class ThetaJoin(RelNode):
    """⋈_θ — join on an arbitrary predicate (ref: relalg.py:1139).
    Catalyst picks hash/sort-merge for equi-conditions and falls back to
    broadcast-nested-loop for pure theta conditions. ``hint`` optionally pins
    the algorithm on the RIGHT side (broadcast / merge / shuffle_hash;
    broadcast also covers BNLJ on non-equi conditions) — the enforcement
    surface of SURVEY.md §4.3.

    ``how`` extends the reference's inner-only algebra (relalg.py:1550) with
    outer semantics (``left``/``right``/``full``) so the qal layer's
    ``JoinType`` (ref qal/_qal.py:6672) is representable below the clause
    level; the compiler passes it straight to ``DataFrame.join(how=...)``."""

    left: RelNode = None  # type: ignore[assignment]
    right: RelNode = None  # type: ignore[assignment]
    predicate: str = ""
    hint: str | None = None
    how: str = "inner"
    #: which child receives ``hint`` — "right" (default: build side of a
    #: left-deep fold) or "left"; Spark builds on the hinted side
    #: (BuildLeft/BuildRight), so this is the relalg surface of the
    #: DirectionalJoinAssignment artifact (ref _hints.py:1119)
    hint_side: str = "right"


@dataclass(frozen=True)
class AsofJoin(RelNode):
    """ASOF [LEFT] JOIN — for each left row, the single right row closest
    in the ordering column among key-matched rows (DuckDB dialect;
    extension beyond the reference, which has no asof construct).

    Compiled via the union–window composition (operators/temporal.py's
    algorithm): tag both sides, one shuffle on the match keys, per-key
    sort, ``last(payload, ignorenulls)`` — never an inequality
    BroadcastNestedLoop and never a within-key pairs blow-up. The output
    carries each side as ONE STRUCT column named by its alias, so every
    downstream qualified reference (``probe.col``, ``right.col``) and
    qualified star (``probe.*``) resolves as Spark struct-field access;
    a bare ``SELECT *`` is rejected at conversion (it would surface the
    structs themselves, diverging from SQL's flattened star)."""

    left: RelNode = None  # type: ignore[assignment]
    right: RelNode = None  # type: ignore[assignment]
    left_alias: str = ""
    right_alias: str = ""
    #: (probe-side sql, right-side sql) equality pairs
    eqs: tuple[tuple[str, str], ...] = ()
    #: the inequality, normalized to ``probe OP right_ord``
    probe: str = ""
    right_ord: str = ""
    strict: bool = False
    forward: bool = False
    how: str = "inner"


@dataclass(frozen=True)
class NaturalJoin(RelNode):
    """NATURAL [LEFT|RIGHT|FULL] JOIN — equi-join over the common column
    names of both inputs, common columns appearing once in the output (ref
    ``JoinType.Natural*`` qal/_qal.py:6672; the reference's relalg layer
    deliberately omits it, relalg.py:1550-1551 — here Spark's
    ``join(on=[cols])`` coalesces the shared keys natively).

    ``using`` restricts the key set to an explicit column list — SQL's
    ``JOIN ... USING (col, ...)``, which shares NATURAL's output-column
    rules but names its keys."""

    left: RelNode = None  # type: ignore[assignment]
    right: RelNode = None  # type: ignore[assignment]
    how: str = "inner"
    using: tuple[str, ...] = ()


@dataclass(frozen=True)
class Drop(RelNode):
    """Remove named columns (no SQL-surface counterpart — internal).
    Used by LATERAL decorrelation to hide its synthetic ``__latkey`` join
    keys from the final schema: without it a ``SELECT *`` over a plain
    LATERAL leaks the keys, and a second LATERAL's identically-named keys
    become ambiguous."""

    child: RelNode = None  # type: ignore[assignment]
    columns: tuple[str, ...] = ()


@dataclass(frozen=True)
class CrossProduct(RelNode):
    """× — Cartesian product (ref: relalg.py:559)."""

    left: RelNode = None  # type: ignore[assignment]
    right: RelNode = None  # type: ignore[assignment]


@dataclass(frozen=True)
class SemiJoin(RelNode):
    """⋉ — rows of left with ≥1 match on the right; models IN/EXISTS
    subqueries (ref: relalg.py:2001-2021)."""

    left: RelNode = None  # type: ignore[assignment]
    right: RelNode = None  # type: ignore[assignment]
    predicate: str = ""


@dataclass(frozen=True)
class AntiJoin(RelNode):
    """▷ — rows of left with NO match on the right; models NOT IN/NOT EXISTS
    (ref: relalg.py:2158-2178). Null-aware NOT IN must be phrased through the
    SQL path (Catalyst's null-aware anti join); this node is the NOT EXISTS
    flavor."""

    left: RelNode = None  # type: ignore[assignment]
    right: RelNode = None  # type: ignore[assignment]
    predicate: str = ""


@dataclass(frozen=True)
class Grouping(RelNode):
    """γ — group by ``keys`` and compute ``aggregates`` (target name → SQL
    aggregate expression). Empty keys = global aggregate; empty aggregates =
    grouping-based dedup (ref: relalg.py:1376-1389)."""

    child: RelNode = None  # type: ignore[assignment]
    keys: tuple[str, ...] = ()
    aggregates: tuple[tuple[str, str], ...] = ()


@dataclass(frozen=True)
class DuplicateElimination(RelNode):
    """δ — SELECT DISTINCT (ref: relalg.py:1926)."""

    child: RelNode = None  # type: ignore[assignment]


@dataclass(frozen=True)
class SortKey:
    expression: str = ""
    ascending: bool = True
    nulls_first: bool | None = None  # None → Spark default for the direction


@dataclass(frozen=True)
class Sort(RelNode):
    """τ — multi-key sort (ref: relalg.py:1654; the reference omits NULLS
    FIRST/LAST at the algebra level, relalg.py:1675 — we carry it because the
    clause layer has it, qal OrderByExpression)."""

    child: RelNode = None  # type: ignore[assignment]
    keys: tuple[SortKey, ...] = ()


@dataclass(frozen=True)
class Union(RelNode):
    """∪ — set union when ``distinct`` (ref: relalg.py:669), else UNION ALL
    (the SQL layer's distinction, qal SetOperator)."""

    left: RelNode = None  # type: ignore[assignment]
    right: RelNode = None  # type: ignore[assignment]
    distinct: bool = True


@dataclass(frozen=True)
class Intersection(RelNode):
    """∩ (ref: relalg.py:780). ``distinct=False`` is the bag-semantics
    INTERSECT ALL extension (beyond the reference's node set)."""

    left: RelNode = None  # type: ignore[assignment]
    right: RelNode = None  # type: ignore[assignment]
    distinct: bool = True


@dataclass(frozen=True)
class Difference(RelNode):
    """− (ref: relalg.py:892). ``distinct=False`` is the bag-semantics
    EXCEPT ALL extension (beyond the reference's node set)."""

    left: RelNode = None  # type: ignore[assignment]
    right: RelNode = None  # type: ignore[assignment]
    distinct: bool = True


@dataclass(frozen=True)
class Sample(RelNode):
    """TABLESAMPLE over a base relation (extension — the reference does
    not model sampling). ``percent`` → Bernoulli row sampling
    (``df.sample``; deterministic for a fixed seed and input layout),
    ``rows`` → an n-row cut (Spark's TABLESAMPLE(n ROWS) semantics).
    Map-side only: sampling evaluates inside the scan stage, before any
    shuffle, so a 1% sample of 100 TB reads all splits but exchanges
    only the sampled rows."""

    child: RelNode = None  # type: ignore[assignment]
    percent: float | None = None
    rows: int | None = None
    seed: int | None = None


@dataclass(frozen=True)
class RecursiveRef(RelNode):
    """Leaf standing for a recursive CTE's WORKING TABLE inside the step
    term of a :class:`RecursiveUnion` — the compiler substitutes the
    previous iteration's rows on every pass. Extension node (the
    reference excludes recursion, qal/_qal.py:8436)."""

    name: str = ""
    alias: str | None = None


@dataclass(frozen=True)
class RecursiveUnion(RelNode):
    """WITH RECURSIVE fixpoint (extension — see :class:`RecursiveRef`).
    ``base`` seeds the working table; ``step`` is re-evaluated each
    iteration against ONLY the previous iteration's rows (ANSI
    working-table semantics). ``distinct=True`` (UNION) dedups each step
    against everything seen so far — cycle-safe, terminates when a step
    adds nothing new; UNION ALL terminates when a step yields zero rows.
    ``max_iterations`` is the runaway guard for non-converging UNION ALL
    recursions: the compiler raises instead of silently truncating."""

    base: RelNode = None  # type: ignore[assignment]
    step: RelNode = None  # type: ignore[assignment]
    name: str = ""
    distinct: bool = True
    max_iterations: int = 200


@dataclass(frozen=True)
class SubqueryScan(RelNode):
    """Marker wrapping a subquery subtree (ref: relalg.py:2316-2334); carries
    an alias, otherwise a no-op at runtime."""

    child: RelNode = None  # type: ignore[assignment]
    alias: str | None = None


@dataclass(frozen=True)
class Limit(RelNode):
    """LIMIT/OFFSET. Extension node — see module docstring."""

    child: RelNode = None  # type: ignore[assignment]
    limit: int | None = None
    offset: int | None = None


@dataclass(frozen=True)
class Values(RelNode):
    """Leaf: inline VALUES relation (ref ``ValuesTableSource``
    qal/_qal.py:6436). ``rows`` holds SQL literal/expression strings;
    compiled via a one-row range cross-applied with the literal rows —
    in practice always tiny, driver-side data."""

    rows: tuple[tuple[str, ...], ...] = ()
    columns: tuple[str, ...] = ()
    alias: str | None = None


@dataclass(frozen=True)
class TableFunction(RelNode):
    """Leaf: table function (ref ``FunctionTableSource`` qal/_qal.py:6584).
    ``range`` compiles to ``spark.range`` — a parallelized generator, not
    driver-side data, so a billion-row series is still distributed."""

    function: str = "range"
    args: tuple[str, ...] = ()
    column: str = "id"
    alias: str | None = None


@dataclass(frozen=True)
class Materialize(RelNode):
    """A MATERIALIZED CTE body (ref ``CommonTableExpression`` flag,
    qal/_qal.py:5605): compiled once and ``.cache()``\\ d so every
    reference shares the stored result. ``name`` keys the share — two
    references to the same CTE produce value-equal Materialize nodes, and
    the compiler memoizes compiled frames by node value, so both
    references return the SAME cached DataFrame (one Spark job populates
    it, the second read is a cache hit on every executor)."""

    child: RelNode = None  # type: ignore[assignment]
    name: str = ""


@dataclass(frozen=True)
class SingleRow(RelNode):
    """Leaf: the one-row relation behind FROM-less SELECTs. Extension node
    (the reference parses FROM-less queries through pglast the same way)."""


class RelNodeVisitor:
    """Visitor over the operator set (ref: relalg.py:2444 RelNodeVisitor)."""

    def generic_visit(self, node: RelNode):
        raise NotImplementedError(type(node).__name__)

    def __getattr__(self, name):
        if name.startswith("visit_"):
            return self.generic_visit
        raise AttributeError(name)
