"""Plan-space analysis utilities.

Mirrors the reference's ``opt/_analysis.py``: ``possible_plans_bound``
(:30 — size of the join-order search space), ``star_query_cardinality``
(:130 — exact star-join cardinality without materializing the join),
join-tree similarity (:241-371), and plan diffing (:562). All but the
star-cardinality helper are pure Python over our artifacts.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from postbound_spark.optimizer.jointree import JoinTree
from postbound_spark.optimizer.stages import QuerySpec


def possible_plans_bound(spec: QuerySpec, shape: str = "bushy") -> int:
    """Upper bound on the number of join orders (ref ``:30``): n! for
    left-deep trees, n! · C(n-1) (Catalan) for bushy — the clique-graph
    worst case; the true count for sparser graphs is lower."""
    n = len(spec.tables)
    if n == 0:
        return 0
    if shape == "left-deep":
        return math.factorial(n)
    catalan = math.comb(2 * (n - 1), n - 1) // n if n > 0 else 1
    return math.factorial(n) * catalan


def star_query_cardinality(
    fact: DataFrame,
    fact_pk: str,
    dimensions: list[tuple[DataFrame, str, str]],
) -> int:
    """Exact cardinality of a star join without materializing the join
    (ref ``opt/_analysis.py:130`` — "for situations where the database is
    unable to compute the cardinality because the intermediates involved
    become too large").

    The reference loops over every fact PK value on the driver, issuing
    one COUNT(*) query per (id, dimension) pair. Distributed form of the
    same algebra: the output count is

        Σ_id  fact_card(id) × Π_d  dim_matches_d(id)

    so each dimension collapses to a per-key match-count aggregate, the
    per-key counts join back to the fact side's own per-key counts
    (missing key ⇒ 0 matches ⇒ the product term vanishes, hence inner
    join), and one final sum reduces the products. Cost: one grouped
    aggregate per input — never the join's output size, which is the
    whole point at 100 TB.

    ``dimensions`` entries are ``(dim_df, fact_join_col, dim_join_col)``;
    apply any dimension/fact filters to the DataFrames before calling
    (the reference takes them from the query's WHERE for the same
    effect).
    """
    acc = fact.groupBy(F.col(fact_pk).alias("__key")).agg(
        F.count(F.lit(1)).alias("__card")
    )
    if len({fact_pk for _, fact_pk, _ in dimensions}) > 1:
        raise ValueError(
            "all dimensions must join the same fact column (pure star; "
            "ref restriction _analysis.py:162-168)"
        )
    for i, (dim, fact_col, dim_col) in enumerate(dimensions):
        if fact_col != fact_pk:
            raise ValueError(
                f"dimension {i} joins {fact_col!r}, expected the fact PK "
                f"{fact_pk!r} (pure star; ref restriction _analysis.py:162-168)"
            )
        matches = dim.groupBy(F.col(dim_col).alias("__key")).agg(
            F.count(F.lit(1)).alias(f"__m{i}")
        )
        acc = acc.join(matches, "__key", "inner").withColumn(
            "__card", F.col("__card") * F.col(f"__m{i}")
        )
    row = acc.agg(F.sum("__card").alias("total")).collect()[0]
    return int(row["total"] or 0)


def jointree_similarity(a: JoinTree, b: JoinTree) -> float:
    """Containment similarity of the two trees' intermediate-result sets
    (the reference's bottom-up similarity idea, ``:241``): |common
    intermediates| / |intermediates|. 1.0 iff identical shapes over the
    same tables (modulo commutativity — sides are unordered here, like the
    reference's default)."""
    ia = {frozenset(j.tables()) for j in a.joins()}
    ib = {frozenset(j.tables()) for j in b.joins()}
    if not ia and not ib:
        return 1.0
    return len(ia & ib) / max(len(ia), len(ib))


def jointree_similarity_topdown(
    a: JoinTree, b: JoinTree, *, symmetric: bool = False, gamma: float = 1.1
) -> float:
    """Top-down recursive similarity (ref ``jointree_similarity_topdown``
    opt/_analysis.py:241): compare the two root splits by Jaccard
    overlap of their child table sets, recurse into the matched pair,
    and amplify deeper levels by ``gamma`` (earlier joins matter more —
    they move the most data). ``symmetric=True`` additionally tries the
    crossover pairing (outer↔inner), so commuted branches are not
    penalized. Scores are relative (gamma compounds); compare trees of
    the same query, not across queries."""

    def jaccard(x, y) -> float:
        x, y = set(x), set(y)
        return len(x & y) / len(x | y) if (x or y) else 1.0

    tables_a, tables_b = set(a.tables()), set(b.tables())
    norm = 1.0 / len(tables_a | tables_b)

    if len(tables_a) == 1 and len(tables_b) == 1:
        return 1.0 if tables_a == tables_b else 0.0
    if len(tables_a) == 1 or len(tables_b) == 1:
        leaf, inner_tree = (a, b) if len(tables_a) == 1 else (b, a)
        return norm * max(
            jaccard(leaf.tables(), inner_tree.inner.tables()),
            jaccard(leaf.tables(), inner_tree.outer.tables()),
        )

    straight = jaccard(a.inner.tables(), b.inner.tables()) + jaccard(
        a.outer.tables(), b.outer.tables()
    )
    crossover = (
        jaccard(a.inner.tables(), b.outer.tables())
        + jaccard(a.outer.tables(), b.inner.tables())
        if symmetric
        else 0.0
    )
    node_score = norm * max(straight, crossover)
    if symmetric and crossover > straight:
        child_score = jointree_similarity_topdown(
            a.inner, b.outer, symmetric=symmetric, gamma=gamma
        ) + jointree_similarity_topdown(
            a.outer, b.inner, symmetric=symmetric, gamma=gamma
        )
    else:
        child_score = jointree_similarity_topdown(
            a.inner, b.inner, symmetric=symmetric, gamma=gamma
        ) + jointree_similarity_topdown(
            a.outer, b.outer, symmetric=symmetric, gamma=gamma
        )
    return node_score + gamma * child_score


def jointree_levenshtein(a: JoinTree, b: JoinTree) -> int:
    """Levenshtein distance of the two trees' linearized table sequences
    (ref ``linearized_levenshtein_distance`` opt/_analysis.py:345) —
    the cheap order-sensitive complement of the set-based measures.
    Plain O(nm) DP over the table lists; join queries are dozens of
    tables at most, never worth more machinery."""
    sa, sb = list(a.tables()), list(b.tables())
    prev = list(range(len(sb) + 1))
    for i, ta in enumerate(sa, 1):
        cur = [i]
        for j, tb in enumerate(sb, 1):
            cur.append(
                min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (ta != tb),
                )
            )
        prev = cur
    return prev[-1]


def plan_diff(a: JoinTree, b: JoinTree) -> dict[str, list[frozenset[str]]]:
    """Intermediates unique to each plan (ref plan diffing ``:562``)."""
    ia = {frozenset(j.tables()) for j in a.joins()}
    ib = {frozenset(j.tables()) for j in b.joins()}
    return {
        "only_left": sorted(ia - ib, key=sorted),
        "only_right": sorted(ib - ia, key=sorted),
        "shared": sorted(ia & ib, key=sorted),
    }


def connected_intermediates(
    spec: QuerySpec, min_size: int = 2, max_size: int | None = None
) -> list[frozenset[str]]:
    """Every connected table subset of the join graph — the intermediate
    relations a bottom-up optimizer enumerates (cross-product-free, ref
    the DP prechecks opt/dynprog.py:92)."""
    import itertools

    names = sorted(spec.tables)
    max_size = max_size or len(names)
    edges = list(spec.edges)

    def connected(subset: frozenset[str]) -> bool:
        if len(subset) == 1:
            return True
        seen = {next(iter(subset))}
        changed = True
        while changed:
            changed = False
            for e in edges:
                ts = e.tables()
                if ts <= subset and (ts & seen) and not ts <= seen:
                    seen |= ts
                    changed = True
        return seen == subset

    out = []
    for size in range(min_size, max_size + 1):
        for combo in itertools.combinations(names, size):
            s = frozenset(combo)
            if connected(s):
                out.append(s)
    return out


def qerror_report(
    spec: QuerySpec,
    estimator,
    tables: dict[str, "DataFrame"],
    truth=None,
    max_size: int | None = None,
) -> dict[frozenset[str], float]:
    """Estimator-quality measurement — per-intermediate q-error of
    ``estimator`` against ground truth (``PreciseCardinalities`` by
    default): the experiment loop the reference's harness runs for every
    cardinality-estimation paper (q-error metric ref ``_qep.py:1575``;
    truth source ``opt/_cardinalities.py:20``).

    Each truth value is one COUNT(*) DataFrame job over the joined
    intermediate — bounded by ``max_size`` because truth for large
    intermediates is itself the expensive part (same trade-off the
    reference documents for PreciseCardinalities)."""
    from postbound_spark.optimizer.cardinalities import PreciseCardinalities

    truth = truth or PreciseCardinalities()
    report: dict[frozenset[str], float] = {}
    for subset in connected_intermediates(spec, max_size=max_size):
        actual = truth.estimate_cardinality(spec, subset, tables)
        est = estimator.estimate_cardinality(spec, subset, tables)
        if math.isnan(est) or math.isnan(actual):
            report[subset] = math.nan
            continue
        lo = max(min(est, actual), 1.0)
        hi = max(est, actual, 1.0)
        report[subset] = hi / lo
    return report
