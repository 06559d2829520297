"""Join graph — the state machine every join-ordering algorithm walks.

Mirrors the reference's ``JoinGraph`` (rbergm/PostBOUND
``postbound/opt/_joingraph.py:360``): nodes are base tables, edges are
equi-join predicates, each classified **primary-key/foreign-key** or
**n:m** from the catalog's constraint sidecar (Spark has no constraints,
so :mod:`postbound_spark.catalog` carries them — SURVEY.md §7). The
free/joined state drives bottom-up algorithms: UES, DP, greedy all ask
"which free tables connect to what I've already joined".
"""

from __future__ import annotations

from dataclasses import dataclass

from postbound_spark.catalog import FOREIGN_KEYS, PRIMARY_KEYS


@dataclass(frozen=True)
class JoinEdge:
    """Equi-join ``left_table.left_col = right_table.right_col``."""

    left_table: str
    left_col: str
    right_table: str
    right_col: str

    def tables(self) -> frozenset[str]:
        return frozenset((self.left_table, self.right_table))

    def is_pk_fk(self) -> bool:
        """PK/FK iff one side is a registered primary key referenced by the
        other side's foreign key (ref: n:m vs PK/FK classification,
        opt/_joingraph.py:377-384)."""
        return self._fk_side() is not None

    def _fk_side(self) -> str | None:
        if FOREIGN_KEYS.get((self.left_table, self.left_col)) == (
            self.right_table,
            self.right_col,
        ):
            return self.left_table
        if FOREIGN_KEYS.get((self.right_table, self.right_col)) == (
            self.left_table,
            self.left_col,
        ):
            return self.right_table
        return None

    def fk_table(self) -> str | None:
        """The n-side (fan-out side) of a PK/FK edge, else None."""
        return self._fk_side()

    def pk_table(self) -> str | None:
        fk = self._fk_side()
        if fk is None:
            return None
        return self.right_table if fk == self.left_table else self.left_table


class JoinGraph:
    """Mutable traversal state over an immutable edge set."""

    def __init__(self, tables: list[str], edges: list[JoinEdge]):
        self.tables = list(tables)
        self.edges = list(edges)
        self._joined: set[str] = set()

    # -- classification (static) -------------------------------------------

    def edges_between(self, t1: str, t2: str) -> list[JoinEdge]:
        pair = frozenset((t1, t2))
        return [e for e in self.edges if e.tables() == pair]

    def neighbors(self, table: str) -> set[str]:
        out: set[str] = set()
        for e in self.edges:
            if table in e.tables():
                out |= e.tables() - {table}
        return out

    def is_connected(self) -> bool:
        if not self.tables:
            return True
        seen = {self.tables[0]}
        frontier = [self.tables[0]]
        while frontier:
            seen |= (nbrs := self.neighbors(frontier.pop()) - seen)
            frontier.extend(nbrs)
        return seen == set(self.tables)

    # -- traversal state (mirrors free/available/consumed joins,
    #    opt/_joingraph.py:360 region) ------------------------------------

    def mark_joined(self, table: str) -> None:
        self._joined.add(table)

    def joined_tables(self) -> set[str]:
        return set(self._joined)

    def free_tables(self) -> set[str]:
        return set(self.tables) - self._joined

    def available_joins(self) -> list[JoinEdge]:
        """Edges connecting the joined component to a free table."""
        if not self._joined:
            return list(self.edges)
        out = []
        for e in self.edges:
            ts = e.tables()
            if len(ts & self._joined) == 1 and len(ts - self._joined) == 1:
                out.append(e)
        return out

    def available_pk_fk_joins(self) -> list[JoinEdge]:
        return [e for e in self.available_joins() if e.is_pk_fk()]

    def available_n_m_joins(self) -> list[JoinEdge]:
        return [e for e in self.available_joins() if not e.is_pk_fk()]

    def contains_cross_products(self) -> bool:
        return not self.is_connected()


def pk_fk_edges_for(tables: list[str]) -> list[JoinEdge]:
    """All catalog-implied PK/FK equi-join edges among ``tables`` — the
    default join graph when a workload query follows the schema's keys."""
    out = []
    chosen = set(tables)
    for (child, child_col), (parent, parent_col) in FOREIGN_KEYS.items():
        if child in chosen and parent in chosen:
            out.append(JoinEdge(child, child_col, parent, parent_col))
    return out


def primary_key_of(table: str) -> str | None:
    return PRIMARY_KEYS.get(table)
