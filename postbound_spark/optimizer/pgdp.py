"""Postgres-style pathlist dynamic programming, re-targeted at Spark.

The reference ships ``PostgresDynProg`` (rbergm/PostBOUND
``postbound/opt/dynprog.py:536``, ~1290 LoC), a translation of Postgres's
``standard_join_search`` including its pruning discipline (``add_path``
:725/:1181), per-level join-rel construction (:856), the three join-path
families (:952 sorted, :1053 unsorted-outer, :1152 hash), and
materialize/memoize insertion (:1417/:1445). That code is inseparable from
Postgres's cost model and hint backend; porting it line-by-line would be
both a copy and non-Spark-idiomatic. This module re-expresses the
*algorithmic discipline* against Spark's physical vocabulary:

- **pathlist per relation set**: multiple surviving paths when they are
  incomparable — cheaper OR usefully sorted (PG's "interesting order"
  argument; here a sort-merge output sorted on join keys can save the
  final ORDER BY sort or a later merge-join sort);
- **add_path pruning** (ref :1181): a new path is kept iff no existing
  path is both no-more-expensive and provides-at-least-its-ordering; any
  path it dominates is evicted;
- **join path families per pair**: broadcast-hash (feasible while the
  build side's estimated rows fit the broadcast budget), shuffle-hash,
  sort-merge (reusing pre-sorted inputs when the DP kept them), and
  nested-loop **with an explicit Materialize on the inner** (ref
  ``_create_materialize_path`` :1445 — in Spark a ``persist()`` of the
  build side, the only sane NL shape when the inner would otherwise be
  recomputed per partition);
- costs are C_out-style (rows processed per operator) over any
  :class:`CardinalityEstimator` — the research knob stays pluggable.

The winner compiles through the standard enforcement path
(``compile_join_tree`` + hints); Materialize decisions land in
``PhysicalOperatorAssignment.materialize`` and compile_join_tree persists
those build sides before joining.
"""

from __future__ import annotations

import itertools
import math
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from postbound_spark.optimizer.hints import JoinOperator, PhysicalOperatorAssignment
from postbound_spark.optimizer.jointree import JoinTree
from postbound_spark.optimizer.stages import (
    CardinalityEstimator,
    PlanEnumerator,
    QuerySpec,
)

__all__ = ["PostgresStyleDynProg", "Path"]


@dataclass(frozen=True)
class Path:
    """One physical alternative for a relation set (ref ``RelOptInfo``
    pathlists, opt/dynprog.py:439): plan shape + per-join operators +
    cost + the output ordering it provides (column names, or ())."""

    tree: JoinTree
    cost: float
    #: qualified (table, column) pairs — bare names would let an ordering
    #: on a.col wrongly satisfy one on b.col (same-named join keys)
    sort_order: tuple[tuple[str, str], ...] = ()
    operators: tuple[tuple[frozenset[str], JoinOperator], ...] = ()
    materialized: tuple[frozenset[str], ...] = ()

    def provides_ordering(self, wanted: tuple[tuple[str, str], ...]) -> bool:
        return self.sort_order[: len(wanted)] == wanted if wanted else True


def _add_path(paths: list[Path], new: Path) -> None:
    """PG's add_path discipline (ref :1181): reject a dominated newcomer,
    evict paths the newcomer dominates. Dominance = cost no worse AND
    ordering at least as useful (prefix-subsumption)."""
    for p in paths:
        if p.cost <= new.cost and _ordering_subsumes(p.sort_order, new.sort_order):
            return  # dominated — drop the newcomer
    paths[:] = [
        p
        for p in paths
        if not (new.cost <= p.cost and _ordering_subsumes(new.sort_order, p.sort_order))
    ]
    paths.append(new)


def _ordering_subsumes(mine: tuple[str, ...], other: tuple[str, ...]) -> bool:
    """``mine`` provides every ordering ``other`` provides (ref
    ``_sorting_subsumes`` :1766): other must be a prefix of mine."""
    return mine[: len(other)] == other


class PostgresStyleDynProg(PlanEnumerator):
    """Bottom-up pathlist DP (ref ``standard_join_search``
    opt/dynprog.py:832 / ``_join_search_one_level`` :856), Spark physical
    vocabulary."""

    #: relative cost factors per operator family (rows-processed units)
    SHUFFLE_FACTOR = 1.0  # both sides exchange
    SORT_FACTOR = 1.2  # sort amplification over plain shuffle
    BROADCAST_FACTOR = 0.1  # build-side replication is cheap while small
    NL_PROBE_FACTOR = 0.01  # per outer-row probe into a materialized inner

    def __init__(
        self,
        cardinality_estimator: CardinalityEstimator,
        broadcast_threshold_rows: float = 1_000_000,
        enable_materialize: bool = True,
        enable_sort: bool = True,
        required_ordering: tuple[tuple[str, str], ...] = (),
        linear: bool = False,
        cost_constants=None,
    ):
        self.estimator = cardinality_estimator
        if cost_constants is not None:
            # measured per-operator constants override the asserted class
            # factors (optimizer/costmodel.py — the reference's
            # NativeCostModel role, ref opt/native.py:57): the DP's cost
            # unit stays "output rows", so the constants render as
            # out_row-relative factors
            for name, value in cost_constants.pgdp_factors().items():
                setattr(self, name, value)
        self.broadcast_threshold_rows = broadcast_threshold_rows
        self.enable_materialize = enable_materialize
        self.enable_sort = enable_sort
        self.required_ordering = required_ordering
        #: restrict the search to linear (zig-zag) trees: every split has a
        #: single-table side, O(n·2^n) splits instead of 3^n — PG itself
        #: switches search modes above join_collapse_limit; this is the
        #: corpus-scale knob for 14-17-table JOB queries
        self.linear = linear

    # -- the DP -------------------------------------------------------------

    def enumerate(
        self, spec: QuerySpec, tables: dict[str, DataFrame]
    ) -> Path:
        names = sorted(spec.tables)
        edges = list(spec.edges)
        # per-table incident edges: a split scan only walks the smaller
        # side's incidence lists (O(deg)) instead of every edge (O(E)) —
        # at 17 tables the full-scan version dominated the whole DP
        incident: dict[str, list] = {t: [] for t in names}
        edge_pos = {id(e): i for i, e in enumerate(edges)}
        for e in edges:
            ts = e.tables()
            if len(ts) == 2:
                for t in ts:
                    incident.setdefault(t, []).append(e)
        card_cache: dict[frozenset[str], float] = {}

        def rows(subset: frozenset[str]) -> float:
            if subset not in card_cache:
                got = self.estimator.estimate_cardinality(spec, subset, tables)
                if math.isnan(got):
                    # a NaN cost makes every add_path dominance test False:
                    # pathlists stop pruning (combinatorial growth) and the
                    # final min() picks an arbitrary plan — fail loudly at
                    # the source instead
                    raise ValueError(
                        f"cardinality estimator returned NaN for "
                        f"{sorted(subset)} — pathlist DP cannot prune on "
                        "unknown cardinalities; fix the estimator input"
                    )
                card_cache[subset] = got
            return card_cache[subset]

        def join_cols(
            left: frozenset[str], right: frozenset[str]
        ) -> list[tuple[tuple[str, str], tuple[str, str]]]:
            # keys are QUALIFIED (table, column) pairs: bare column names
            # collide across tables (every JOB satellite joins on movie_id),
            # and an ordering on a.col must not satisfy one on b.col
            out = []
            small = left if len(left) <= len(right) else right
            scan_ids: set[int] = set()
            scan = []
            for t in small:
                for e in incident.get(t, ()):
                    if id(e) not in scan_ids:
                        scan_ids.add(id(e))
                        scan.append(e)
            # original spec-edge order: the emitted key order feeds the
            # ordering tuples, so it must not depend on set iteration
            scan.sort(key=lambda e: edge_pos[id(e)])
            for e in scan:
                ts = e.tables()
                if len(ts & left) == 1 and len(ts & right) == 1:
                    lkey = (
                        (e.left_table, e.left_col)
                        if e.left_table in left
                        else (e.right_table, e.right_col)
                    )
                    rkey = (
                        (e.right_table, e.right_col)
                        if e.right_table in right
                        else (e.left_table, e.left_col)
                    )
                    out.append((lkey, rkey))
            return out

        pathlists: dict[frozenset[str], list[Path]] = {}
        for t in names:
            s = frozenset((t,))
            pathlists[s] = [Path(JoinTree.leaf(t, rows(s)), cost=rows(s))]

        for size in range(2, len(names) + 1):
            for combo in itertools.combinations(names, size):
                subset = frozenset(combo)
                paths: list[Path] = []
                if self.linear:
                    split_lefts = [
                        s
                        for t in combo
                        for s in ((t,), tuple(x for x in combo if x != t))
                    ]
                else:
                    split_lefts = _proper_subsets(combo)
                for left_tuple in split_lefts:
                    left = frozenset(left_tuple)
                    right = subset - left
                    if left not in pathlists or right not in pathlists:
                        continue
                    keys = join_cols(left, right)
                    if not keys:
                        continue  # no cross products (ref precheck :92)
                    for lp in pathlists[left]:
                        for rp in pathlists[right]:
                            for cand in self._join_paths(
                                lp, rp, left, right, keys, rows(subset)
                            ):
                                _add_path(paths, cand)
                if paths:
                    if not self.required_ordering:
                        # PG's own rule: with no useful pathkeys (the query
                        # has no ORDER BY to satisfy), an ordered path can
                        # never pay for itself — keep only the cheapest
                        # total path per relation. This is also what keeps
                        # the DP corpus-scale: order-differentiated
                        # pathlists cross-multiply (~40 path pairs per
                        # split at 14 tables before this cut)
                        paths = [min(paths, key=lambda p: (p.cost, str(p.tree)))]
                    pathlists[subset] = paths

        full = frozenset(names)
        if full not in pathlists:
            raise ValueError(
                "join graph is disconnected — DP needs a connected SPJ query"
            )
        return min(
            pathlists[full],
            key=lambda p: (
                p.cost + self._final_sort_cost(p, rows(full)),
                str(p.tree),
            ),
        )

    def _final_sort_cost(self, path: Path, out_rows: float) -> float:
        """An ORDER BY the path already provides is free — the interesting-
        order payoff (ref: PG keeps sorted paths exactly for this)."""
        if not self.required_ordering:
            return 0.0
        if path.provides_ordering(self.required_ordering):
            return 0.0
        return self.SORT_FACTOR * out_rows

    # -- join path families (ref :952/:1053/:1152/:1417-1468) ---------------

    def _join_paths(
        self,
        lp: Path,
        rp: Path,
        left: frozenset[str],
        right: frozenset[str],
        keys: list[tuple[str, str]],
        out_rows: float,
    ):
        l_rows = lp.tree.cardinality if not math.isnan(lp.tree.cardinality) else out_rows
        r_rows = rp.tree.cardinality if not math.isnan(rp.tree.cardinality) else out_rows
        joined = left | right
        lkey, rkey = keys[0]

        def mk(op: JoinOperator, extra: float, order: tuple[tuple[str, str], ...],
               materialize: bool = False) -> Path:
            tree = JoinTree.join(lp.tree, rp.tree, out_rows)
            return Path(
                tree=tree,
                cost=lp.cost + rp.cost + extra + out_rows,
                sort_order=order,
                operators=lp.operators + rp.operators + ((frozenset(joined), op),),
                materialized=lp.materialized + rp.materialized + (
                    (frozenset(right),) if materialize else ()
                ),
            )

        # broadcast hash (ref hash path :1152, Spark flavor): feasible while
        # the build side fits the budget; destroys no ordering of the outer
        if r_rows <= self.broadcast_threshold_rows:
            yield mk(
                JoinOperator.BROADCAST_HASH,
                self.BROADCAST_FACTOR * r_rows,
                lp.sort_order,
            )
        # shuffle hash: both sides exchange, ordering lost
        yield mk(
            JoinOperator.SHUFFLE_HASH,
            self.SHUFFLE_FACTOR * (l_rows + r_rows),
            (),
        )
        # sort-merge (ref _sort_inner_outer :952): pay the sort only for
        # inputs not already sorted on their key; output sorted on the key
        if self.enable_sort or (
            lp.provides_ordering((lkey,)) and rp.provides_ordering((rkey,))
        ):
            sort_cost = 0.0
            if not lp.provides_ordering((lkey,)):
                sort_cost += self.SORT_FACTOR * l_rows
            if not rp.provides_ordering((rkey,)):
                sort_cost += self.SORT_FACTOR * r_rows
            yield mk(JoinOperator.SORT_MERGE, sort_cost, (lkey,))
        # nested loop over a materialized inner (ref memoize/materialize
        # paths :1417/:1445): only sane when the inner is tiny; in Spark the
        # materialization is a persist() of the build side
        if self.enable_materialize and r_rows <= self.broadcast_threshold_rows / 100:
            yield mk(
                JoinOperator.BROADCAST_NL,
                r_rows + self.NL_PROBE_FACTOR * l_rows * max(r_rows, 1.0),
                lp.sort_order,
                materialize=True,
            )

    # -- PlanEnumerator interface -------------------------------------------

    def generate_execution_plan(
        self,
        spec: QuerySpec,
        tables: dict[str, DataFrame],
        cost_model=None,
        cardinality_estimator: CardinalityEstimator | None = None,
    ):
        if cost_model is not None:
            raise NotImplementedError(
                "PostgresStyleDynProg embeds its own per-family cost "
                "factors; pass cost_model=None"
            )
        if cardinality_estimator is not None:
            self.estimator = cardinality_estimator
        best = self.enumerate(spec, tables)
        assignment = PhysicalOperatorAssignment()
        for tables_set, op in best.operators:
            assignment.set_join_operator(tables_set, op)
        for mat in best.materialized:
            assignment.set_materialize(mat)
        return best.tree, assignment


def _proper_subsets(combo: tuple[str, ...]):
    for size in range(1, len(combo)):
        yield from itertools.combinations(combo, size)
