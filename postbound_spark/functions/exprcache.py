"""Driver-side memoization of composed Column expressions.

Building a PySpark ``Column`` tree is driver-side Python: every operator,
literal, and higher-order-function call is a py4j round trip. The wide
fingerprint expressions here (16 unrolled SimHash bit tests, k MinHash
permutations, banded LSH keys) cost 100-500 ms of pure expression
construction per query build — paid again on every repetition because
builders compose their plans from scratch (measured: dedup_simhash spent
0.42 s building vs 0.23 s executing at sf0.1).

``expr_memo`` caches the RESULT Column keyed by the argument expressions'
canonical text plus any literal parameters. Columns are immutable
expression trees, so reuse across plans is exactly as safe as writing the
same expression twice — this is a prepared-expression cache, not a data
cache: nothing about the input data, scale factor, or query results is
stored, so repeated bench runs still compute everything from the parquet
inputs.

Memoization is restricted to UNRESOLVED column arguments (strings and
``F.col(...)``-style attributes): a DataFrame-bound column (``df["x"]``)
carries plan/dataset metadata that ``str(Column)`` does not show, so two
same-named columns from different DataFrames would collide and the cached
Column could resolve against the wrong side of a self-join (r11 advisor
finding). Lambda variables from higher-order functions get a fresh name
per composition and can never hit, so they skip the memo too — which also
stops the per-function caches growing without bound; a size cap backstops
the rest.
"""

from __future__ import annotations

from functools import wraps

from pyspark.sql import Column

#: sentinel: argument shape that must not be memoized (resolved/df-bound
#: columns, lambda variables, arbitrary composed expressions)
_UNMEMOIZABLE = object()

#: per-function cache entries beyond this are assumed to be churn from an
#: unforeseen unbounded-key call site — drop the cache rather than pin
#: py4j/JVM expression objects for the life of the process
_CACHE_CAP = 512


def _key_part(value):
    if isinstance(value, Column):
        try:
            # Spark 4 classic: Column wraps a ColumnNode. Only a plain
            # UnresolvedAttribute (F.col / string-resolved name) is safe to
            # key textually; df-bound columns arrive as ExpressionColumnNode
            # (resolved AttributeReference with an expression id) and lambda
            # variables as UnresolvedNamedLambdaVariable — both bypass.
            node = value._jc.node()
            if node.getClass().getSimpleName() != "UnresolvedAttribute":
                return _UNMEMOIZABLE
            # normalized() strips parse origins; the string still carries
            # any plan-id metadata, so a tagged attribute can never collide
            # with an untagged one of the same name
            return ("col", node.normalized().toString())
        except Exception:  # noqa: BLE001 — connect-mode / exotic columns
            return _UNMEMOIZABLE
    if isinstance(value, (list, tuple)):
        parts = tuple(_key_part(v) for v in value)
        if any(p is _UNMEMOIZABLE for p in parts):
            return _UNMEMOIZABLE
        return parts
    return value


def expr_memo(fn):
    """Memoize a ``(...) -> Column`` composer on its arguments' canonical
    expression text. Unhashable/unstringifiable/plan-bound argument shapes
    fall through to a plain call (never an error)."""
    cache: dict = {}

    @wraps(fn)
    def wrapper(*args, **kwargs):
        try:
            parts = tuple(_key_part(a) for a in args)
            kparts = tuple(sorted((k, _key_part(v)) for k, v in kwargs.items()))
            if any(p is _UNMEMOIZABLE for p in parts) or any(
                v is _UNMEMOIZABLE for _, v in kparts
            ):
                return fn(*args, **kwargs)
            key = (parts, kparts)
            hash(key)
        except Exception:  # noqa: BLE001 — any unkeyable shape: just build
            return fn(*args, **kwargs)
        col = cache.get(key)
        if col is None:
            if len(cache) >= _CACHE_CAP:
                cache.clear()
            col = fn(*args, **kwargs)
            cache[key] = col
        return col

    wrapper._expr_cache = cache  # introspection for tests
    return wrapper
