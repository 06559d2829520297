"""CEB-style random query generation over the fixture schema.

The reference ships a template-driven query generator used to produce
benchmark variants and stress the parser (rbergm/PostBOUND
``postbound/experiments/querygen.py``; CEB — Cardinality Estimation
Benchmark — builds its workloads the same way). This is the Spark-repo
counterpart: a seeded generator over the TPC-H-ish fixture schema whose
output is plain ANSI SQL, so every generated query can run through BOTH
the engine's own parse→algebra→compile path AND DuckDB — making the
generator double as a parser/compiler fuzzer with an executable oracle
(``tests/test_querygen.py`` runs a 200-query property sweep per CI run).

Generation is a random walk over the PK-FK join graph (connected table
subsets only, so no accidental cross products), followed by independently
sampled filters, projections/aggregates, DISTINCT, grouping, ordering and
limits. Everything derives from one ``random.Random(seed)`` — the corpus
for a given (seed, n) is deterministic and therefore replayable as a
regression suite.

Cross-engine discipline baked into the emitted SQL (the same rules the
curated registry follows):
- every aggregate/computed column is aliased identically for both engines;
- timestamps compare through ``CAST('...' AS TIMESTAMP)`` (portable);
- LIMIT only ever follows an ORDER BY over a unique key, so results are
  deterministic under the order-insensitive compare;
- grouping keys are never floats (float group keys can split groups by
  ulp across engines).
"""

from __future__ import annotations

import random

# table -> (columns usable in filters/projections, by class)
SCHEMA: dict[str, dict[str, list[str]]] = {
    "region": {
        "key": ["r_regionkey"],
        "int": ["r_regionkey"],
        "num": [],
        "cat": ["r_name"],
        "date": [],
    },
    "nation": {
        "key": ["n_nationkey"],
        "int": ["n_nationkey", "n_regionkey"],
        "num": [],
        "cat": ["n_name"],
        "date": [],
    },
    "customer": {
        "key": ["c_custkey"],
        "int": ["c_nationkey"],
        "num": ["c_acctbal"],
        "cat": ["c_mktsegment"],
        "date": [],
    },
    "supplier": {
        "key": ["s_suppkey"],
        "int": ["s_nationkey"],
        "num": ["s_acctbal"],
        "cat": [],
        "date": [],
    },
    "part": {
        "key": ["p_partkey"],
        "int": ["p_size"],
        "num": ["p_retailprice"],
        "cat": ["p_brand", "p_type"],
        "date": [],
    },
    "orders": {
        "key": ["o_orderkey"],
        "int": [],
        "num": ["o_totalprice"],
        "cat": ["o_orderstatus", "o_orderpriority"],
        "date": ["o_orderdate"],
    },
    "lineitem": {
        "key": [],  # (orderkey, linenumber) is composite — no unique single key
        "int": ["l_linenumber"],
        "num": ["l_quantity", "l_extendedprice", "l_discount"],
        "cat": ["l_returnflag", "l_linestatus"],
        "date": ["l_shipdate"],
    },
}

#: PK-FK join graph (same edges optimizer.pk_fk_edges_for models)
EDGES: list[tuple[str, str, str, str]] = [
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
]

#: categorical value domains (fixture-generator vocabulary)
CAT_VALUES: dict[str, list[str]] = {
    "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    "n_name": ["NATION_0", "NATION_3", "NATION_7", "NATION_12", "NATION_24"],
    "c_mktsegment": ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"],
    "p_brand": ["Brand#1", "Brand#11", "Brand#13", "Brand#22", "Brand#25"],
    "p_type": ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"],
    "o_orderstatus": ["F", "O", "P"],
    "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
    "l_returnflag": ["A", "N", "R"],
    "l_linestatus": ["F", "O"],
}

_INT_RANGES: dict[str, tuple[int, int]] = {
    "r_regionkey": (0, 4),
    "n_nationkey": (0, 24),
    "n_regionkey": (0, 4),
    "c_nationkey": (0, 24),
    "s_nationkey": (0, 24),
    "p_size": (1, 50),
    "l_linenumber": (1, 7),
}

_NUM_RANGES: dict[str, tuple[float, float]] = {
    "c_acctbal": (-800.0, 9900.0),
    "s_acctbal": (-800.0, 9900.0),
    "p_retailprice": (900.0, 2000.0),
    "o_totalprice": (2000.0, 450000.0),
    "l_quantity": (1.0, 50.0),
    "l_extendedprice": (1000.0, 100000.0),
    "l_discount": (0.0, 0.1),
}

_DATES = [f"{y}-{m:02d}-01" for y in range(1995, 2001) for m in (1, 4, 7, 10)]

_AGGS = ["count", "sum", "avg", "min", "max"]


class QueryGenerator:
    """Seeded random SELECT generator over the fixture schema (ref
    ``experiments/querygen.py`` — template-driven benchmark variants)."""

    def __init__(self, seed: int = 0, max_tables: int = 4):
        self.rng = random.Random(seed)
        self.max_tables = max_tables

    # ---- join-graph walk -------------------------------------------------

    def _pick_tables(self) -> list[str]:
        n = self.rng.randint(1, self.max_tables)
        tables = [self.rng.choice(sorted(SCHEMA))]
        while len(tables) < n:
            frontier = [
                (t1, c1, t2, c2)
                for t1, c1, t2, c2 in EDGES
                if (t1 in tables) != (t2 in tables)
            ]
            if not frontier:
                break
            t1, _, t2, _ = self.rng.choice(frontier)
            tables.append(t2 if t1 in tables else t1)
        return tables

    def _join_predicates(self, tables: list[str]) -> list[str]:
        preds = []
        for t1, c1, t2, c2 in EDGES:
            if t1 in tables and t2 in tables:
                preds.append(f"{t1}.{c1} = {t2}.{c2}")
        return preds

    # ---- filters ---------------------------------------------------------

    def _one_filter(self, table: str) -> str | None:
        s = SCHEMA[table]
        kinds = (
            (["cat"] if s["cat"] else [])
            + (["int"] if s["int"] else [])
            + (["num"] if s["num"] else [])
            + (["date"] if s["date"] else [])
        )
        if not kinds:
            return None
        kind = self.rng.choice(kinds)
        col = self.rng.choice(s[kind])
        q = f"{table}.{col}"
        if kind == "cat":
            vals = CAT_VALUES[col]
            choice = self.rng.random()
            if choice < 0.4:
                return f"{q} = '{self.rng.choice(vals)}'"
            if choice < 0.7:
                picked = self.rng.sample(vals, min(2, len(vals)))
                inlist = ", ".join(f"'{v}'" for v in sorted(picked))
                return f"{q} IN ({inlist})"
            # prefix of varying length: single-char prefixes are all
            # selectivity ~1 on this vocabulary (NATION_*, Brand#*)
            v = self.rng.choice(vals)
            return f"{q} LIKE '{v[: self.rng.randint(1, len(v))]}%'"
        if kind == "int":
            lo, hi = _INT_RANGES[col]
            v = self.rng.randint(lo, hi)
            op = self.rng.choice(["=", "<", ">", "<=", ">="])
            return f"{q} {op} {v}"
        if kind == "num":
            lo, hi = _NUM_RANGES[col]
            if self.rng.random() < 0.3:
                a = round(self.rng.uniform(lo, hi), 2)
                b = round(self.rng.uniform(lo, hi), 2)
                lo2, hi2 = min(a, b), max(a, b)
                return f"{q} BETWEEN {lo2} AND {hi2}"
            v = round(self.rng.uniform(lo, hi), 2)
            op = self.rng.choice(["<", ">", "<=", ">="])
            return f"{q} {op} {v}"
        day = self.rng.choice(_DATES)
        op = self.rng.choice(["<", ">=", ">", "<="])
        return f"{q} {op} CAST('{day}' AS TIMESTAMP)"

    def _filters(self, tables: list[str]) -> list[str]:
        count = self.rng.randint(0, 3)
        out = []
        for _ in range(count):
            f = self._one_filter(self.rng.choice(tables))
            if f:
                out.append(f)
        return out

    def _subquery_filter(self, tables: list[str]) -> str | None:
        """IN- or EXISTS-subquery along a join edge NOT already in the
        join set — the shapes that stress semi-join planning."""
        frontier = [
            (t1, c1, t2, c2)
            for t1, c1, t2, c2 in EDGES
            if (t1 in tables) != (t2 in tables)
        ]
        if not frontier:
            return None
        t1, c1, t2, c2 = self.rng.choice(frontier)
        inner, icol, outer_col = (
            (t2, c2, f"{t1}.{c1}") if t1 in tables else (t1, c1, f"{t2}.{c2}")
        )
        inner_filter = self._one_filter(inner)
        if self.rng.random() < 0.4:  # correlated EXISTS
            conj = f" AND {inner_filter}" if inner_filter else ""
            return (
                f"EXISTS (SELECT 1 FROM {inner} "
                f"WHERE {inner}.{icol} = {outer_col}{conj})"
            )
        where = f" WHERE {inner_filter}" if inner_filter else ""
        return f"{outer_col} IN (SELECT {icol} FROM {inner}{where})"

    # ---- select list -----------------------------------------------------

    def _aggregate_query(self, tables: list[str], where: str) -> str:
        group_pool = [
            f"{t}.{c}"
            for t in tables
            for c in SCHEMA[t]["cat"] + SCHEMA[t]["int"]
        ]
        num_pool = [f"{t}.{c}" for t in tables for c in SCHEMA[t]["num"]]
        aggs = ["COUNT(*) AS n_rows"]
        if self.rng.random() < 0.25:
            cond = self._one_filter(self.rng.choice(tables))
            if cond:
                aggs.append(
                    f"CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT)"
                    " AS n_case"
                )
        for i in range(self.rng.randint(0, 2)):
            fn = self.rng.choice(_AGGS)
            if fn == "count" or not num_pool:
                keys = SCHEMA[tables[0]]["key"]
                pool = group_pool + (
                    [f"{tables[0]}.{keys[0]}"] if keys else []
                )
                if pool:
                    aggs.append(f"COUNT({self.rng.choice(pool)}) AS agg{i}")
                else:  # keyless table with no cat/int columns
                    aggs.append(f"COUNT(*) AS agg{i}")
            else:
                col = self.rng.choice(num_pool)
                aggs.append(f"{fn.upper()}({col}) AS agg{i}")
        if group_pool and self.rng.random() < 0.6:
            keys = self.rng.sample(group_pool, self.rng.randint(1, min(2, len(group_pool))))
            if self.rng.random() < 0.3:
                # GROUP BY <select alias> (output-name resolution — the
                # SSB corpus surfaced this path; generate it so the sweep
                # keeps it honest)
                aliased = [f"{k} AS gkey{i}" for i, k in enumerate(keys)]
                names = [f"gkey{i}" for i in range(len(keys))]
                select = ", ".join(aliased + aggs)
                tail = f" GROUP BY {', '.join(names)}"
                if self.rng.random() < 0.5:
                    tail += f" ORDER BY {', '.join(names)}"
                return f"SELECT {select} FROM {{from_}}{where}{tail}"
            select = ", ".join(keys + aggs)
            tail = f" GROUP BY {', '.join(keys)}"
            if self.rng.random() < 0.3:
                tail += f" HAVING COUNT(*) > {self.rng.randint(0, 3)}"
            if self.rng.random() < 0.5:
                tail += f" ORDER BY {', '.join(keys)}"
            return f"SELECT {select} FROM {{from_}}{where}{tail}"
        return f"SELECT {', '.join(aggs)} FROM {{from_}}{where}"

    def _projection_query(self, tables: list[str], where: str) -> str:
        pool = [
            f"{t}.{c}"
            for t in tables
            for cls in ("key", "cat", "int")
            for c in SCHEMA[t][cls]
        ]
        cols = sorted(set(self.rng.sample(pool, self.rng.randint(1, min(3, len(pool))))))
        distinct = "DISTINCT " if self.rng.random() < 0.4 else ""
        sql = f"SELECT {distinct}{', '.join(cols)} FROM {{from_}}{where}"
        # LIMIT only when ordering by a projected unique key AND the query
        # is single-table: a join multiplies key rows, making the cutoff
        # row nondeterministic even under ORDER BY key
        key_cols = [
            f"{t}.{c}" for t in tables for c in SCHEMA[t]["key"] if f"{t}.{c}" in cols
        ]
        if len(tables) == 1 and key_cols and not distinct and self.rng.random() < 0.5:
            sql += f" ORDER BY {key_cols[0]} LIMIT {self.rng.randint(5, 50)}"
        elif self.rng.random() < 0.4:
            sql += f" ORDER BY {', '.join(cols)}"
        return sql

    def _window_query(self, table: str, where: str) -> str | None:
        """Single-table named-WINDOW query (row-deterministic: the window
        orders by the table's unique key, and only row_number — never a
        tie-sensitive rank — is generated) with an occasional ANSI
        keyword-argument call form (POSITION/substring FROM/TRIM BOTH) on
        a categorical column. Exercises the round-6 parser surfaces in
        every fuzz sweep built on this generator."""
        keys = SCHEMA[table]["key"]
        if not keys:
            return None
        key = f"{table}.{keys[0]}"
        part = ""
        if SCHEMA[table]["cat"] and self.rng.random() < 0.5:
            part = f"PARTITION BY {table}.{SCHEMA[table]['cat'][0]} "
        items = [key, f"row_number() OVER w AS rn"]
        if SCHEMA[table]["num"] and self.rng.random() < 0.5:
            items.append(
                f"sum({table}.{SCHEMA[table]['num'][0]}) OVER w AS running"
            )
        if SCHEMA[table]["cat"] and self.rng.random() < 0.5:
            cat = f"{table}.{SCHEMA[table]['cat'][0]}"
            call = self.rng.choice(
                [
                    f"CAST(position('A' IN {cat}) AS BIGINT)",
                    f"substring({cat} FROM 1 FOR 3)",
                    f"TRIM(BOTH 'A' FROM {cat})",
                ]
            )
            items.append(f"{call} AS f0")
        return (
            f"SELECT {', '.join(items)} FROM {table}{where} "
            f"WINDOW w AS ({part}ORDER BY {key})"
        )

    # ---- entry points ----------------------------------------------------

    def _explicit_from(self, tables: list[str]) -> str:
        """Explicit JOIN chain (occasionally LEFT) in the connection order
        ``_pick_tables`` produced — each table joins something already in
        the chain, so every ON clause is well-formed."""
        used = [tables[0]]
        parts = [tables[0]]
        for t in tables[1:]:
            ons = [
                f"{t1}.{c1} = {t2}.{c2}"
                for t1, c1, t2, c2 in EDGES
                if (t1 == t and t2 in used) or (t2 == t and t1 in used)
            ]
            kind = "LEFT JOIN" if self.rng.random() < 0.25 else "JOIN"
            parts.append(f"{kind} {t} ON {' AND '.join(ons)}")
            used.append(t)
        return " ".join(parts)

    def generate_one(self) -> str:
        tables = self._pick_tables()
        explicit = len(tables) >= 2 and self.rng.random() < 0.3
        preds = [] if explicit else self._join_predicates(tables)
        filters = self._filters(tables)
        if len(filters) >= 2 and self.rng.random() < 0.3:
            b, a = filters.pop(), filters.pop()
            filters.append(f"({a} OR {b})")
        preds += filters
        if self.rng.random() < 0.2:
            sub = self._subquery_filter(tables)
            if sub:
                preds.append(sub)
        where = f" WHERE {' AND '.join(preds)}" if preds else ""
        if len(tables) == 1 and self.rng.random() < 0.15:
            win = self._window_query(tables[0], where)
            if win is not None:
                return win
        from_ = self._explicit_from(tables) if explicit else ", ".join(sorted(tables))
        if self.rng.random() < 0.55:
            template = self._aggregate_query(tables, where)
        else:
            template = self._projection_query(tables, where)
        return template.format(from_=from_)

    def generate(self, n: int) -> dict[str, str]:
        """``n`` labeled queries — deterministic for a given (seed, n)."""
        return {f"gen{i + 1:04d}": self.generate_one() for i in range(n)}
