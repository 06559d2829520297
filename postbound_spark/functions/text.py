"""Text-analysis column expressions for large-scale corpus pipelines.

Everything here is a pure ``pyspark.sql.Column`` expression built from
built-in / higher-order functions (``F.transform`` / ``F.filter`` /
``F.aggregate`` with Python lambdas), so the whole pipeline stays inside
whole-stage codegen on the JVM — no Python UDFs in the hot path. At 100 TB
that is the difference between a scan-speed pipeline and a serialization
bottleneck: tokenization, hashing, MinHash signatures and SimHash all
evaluate per-row inside Tungsten with zero Python round-trips and zero
shuffles (the only shuffle in a dedup pipeline is the final bucket join).

Determinism notes (these expressions are oracle-checked against DuckDB):
- hashing is md5-based (identical across engines), never ``F.hash`` /
  ``xxhash64`` (engine-private algorithms);
- 64-bit integer hashes take the first 15 hex chars of the md5 (< 2^60,
  always non-negative, no sign-extension differences);
- MinHash permutes a 31-bit base hash through a universal (a*h + b) mod P
  family — ONE md5 kernel per shingle serves all k permutations, and the
  integer arithmetic is bit-identical in any engine.

Reference scope note: the reference system (rbergm/PostBOUND) has no text
pipeline — this module is the training-data-pipeline extension surface
(dedup / quality / language-ID / fingerprinting) built on the same engine.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column
from pyspark.sql import functions as F

from postbound_spark.functions.exprcache import expr_memo

# Stopword list used by quality scoring (tiny on purpose: the scoring
# formula is rational-arithmetic only so it is bit-reproducible; swap in a
# real per-language list in production).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for")


@expr_memo
def tokens(text: Column | str) -> Column:
    """Whitespace tokenization; matches DuckDB ``string_split_regex``
    semantics (empty text -> ``['']``)."""
    return F.split(text, r"\s+")


@expr_memo
def bpe_ish_tokens(text: Column | str) -> Column:
    """BPE-ish subword split: letter runs, digit runs, single punctuation
    marks. A stand-in for a real BPE vocabulary with the same asymptotic
    token counts; pure regex, JVM-side, RE2-compatible pattern."""
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(col, F.lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), F.lit(0))


@expr_memo
def word_shingles(toks: Column, n: int = 3) -> Column:
    """Distinct positional word n-gram shingles ('a b c' for n=3) as one
    codegen expression per row — no explode/groupBy shuffle to form the
    shingle set."""
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    shingled = F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(" ", *[F.element_at(toks, i + k) for k in range(n)]),
        )
    )
    # guard: Spark's sequence(1, stop) runs *descending* when stop < 1, so
    # short docs must short-circuit to an empty shingle set explicitly.
    return F.when(F.size(toks) >= n, shingled).otherwise(
        F.array().cast("array<string>")
    )


@expr_memo
def token_hash64(tok: Column) -> Column:
    """60-bit non-negative integer hash of a token (md5-prefix based, so
    bit-identical in any engine with md5)."""
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")


#: universal-hash family for MinHash permutations: (a*h + b) mod P over a
#: 31-bit base hash. P Mersenne-prime so products of two < 2^31 factors
#: stay < 2^62 — no BIGINT overflow in either engine (Spark wraps
#: silently, DuckDB errors; both are disqualifying).
MINHASH_P = (1 << 31) - 1
MINHASH_A = (1203983, 594603251, 1340049377, 2038074743,
             102938477, 766245317, 1498765813, 909091373)
MINHASH_B = (981766919, 123456791, 1719068887, 432109873,
             1597334677, 207688333, 661041991, 1876543211)

#: bigram-LM vocabulary cap (quality_lm_score): keep only the top-K
#: reference bigrams by count — CCNet's own model pruning. The cap is
#: what bounds the broadcast LM tables BY CONSTRUCTION at any corpus
#: size: a web-scale crawl has billions of distinct bigrams, and an
#: unpruned model would OOM the broadcast long before 100 TB. Sized to
#: bite on the test fixtures too (their reference slice has ~900
#: distinct bigrams), so the pruning path is what the oracle checks.
LM_VOCAB_K = 512


@expr_memo
def shingle_hashes31(shingles: Column) -> Column:
    """31-bit integer hash per shingle — ONE md5 kernel per shingle,
    shared by every MinHash permutation. Materialize this column (cache /
    exchange boundary) before :func:`minhash_signature_from_hashes` in hot
    paths, or projection collapse re-inlines the md5 per permutation."""
    return F.transform(shingles, lambda sh: token_hash64(sh) % MINHASH_P)


@expr_memo
def minhash_signature_from_hashes(hashes: Column, k: int = 8) -> Column:
    """MinHash signature from precomputed 31-bit shingle hashes:
    ``sig[s] = min over shingles of (a_s * h + b_s) mod P`` — the standard
    universal-permutation family, as ``array<long>`` of length ``k``.

    Integer multiply/add/mod only (no hash kernels): O(k·|shingles|)
    64-bit arithmetic inside codegen, vs the k md5 calls per shingle of
    the naive seeded-hash scheme — the difference between 1 and k hash
    kernels per row at corpus scale."""
    if k > len(MINHASH_A):
        raise ValueError(f"at most {len(MINHASH_A)} permutations are seeded")
    a = F.array(*[F.lit(x).cast("long") for x in MINHASH_A[:k]])
    b = F.array(*[F.lit(x).cast("long") for x in MINHASH_B[:k]])
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda s: F.array_min(
            F.transform(
                hashes,
                lambda h: (F.element_at(a, s + 1) * h + F.element_at(b, s + 1))
                % F.lit(MINHASH_P).cast("long"),
            )
        ),
    )


@expr_memo
def minhash_signature(shingles: Column, k: int = 8) -> Column:
    """MinHash signature straight from shingle strings (convenience
    composition; hot paths should materialize :func:`shingle_hashes31`
    first and call :func:`minhash_signature_from_hashes`)."""
    return minhash_signature_from_hashes(shingle_hashes31(shingles), k)


@expr_memo
def lsh_band_keys(signature: Column, bands: int, rows_per_band: int) -> Column:
    """LSH banding: hash each signature band (of integer MinHash values)
    to one bucket key (``array<string>`` of length ``bands``).

    Docs sharing any band key become candidate pairs; the candidate join is
    an *equi*-join on the band key — the scalable alternative to the O(n²)
    all-pairs comparison. The band key is the shuffle key, so skew only
    arises when one bucket captures a degenerate constant shingle set.

    A NULL signature element (empty shingle set → ``array_min`` of an
    empty array) yields an EMPTY key array instead of band keys:
    ``concat_ws`` would silently skip the NULL and collapse every
    shingle-less doc into one constant bucket, turning the candidate join
    into an O(m²) cross product over all short documents. Such docs simply
    never become candidates — the correct semantics (no shingles = nothing
    to match on).
    """
    keys = F.array(
        *[
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit(str(b)),
                    *[
                        F.element_at(signature, b * rows_per_band + r + 1).cast(
                            "string"
                        )
                        for r in range(rows_per_band)
                    ],
                )
            )
            for b in range(bands)
        ]
    )
    return F.when(
        F.element_at(signature, 1).isNull(),
        F.array().cast("array<string>"),
    ).otherwise(keys)


@expr_memo
def token_hashes(toks: Column) -> Column:
    """Distinct-token 60-bit hash array — materialize this (behind an
    exchange or cache) before feeding wide bit-test expressions like
    :func:`simhash16_from_hashes`, or Catalyst's project-collapsing will
    inline the md5 work into every bit test."""
    return F.transform(F.array_distinct(toks), token_hash64)


@expr_memo
def simhash16(toks: Column) -> Column:
    """16-bit SimHash over the distinct-token set (convenience composition;
    prefer ``token_hashes`` + ``simhash16_from_hashes`` with a
    materialization boundary between them in hot paths)."""
    return simhash16_from_hashes(token_hashes(toks))


@expr_memo
def simhash16_from_hashes(th: Column) -> Column:
    """16-bit SimHash from a precomputed token-hash array.

    bit_b = 1 iff at least half the token hashes have bit b set. The 16
    bit-tests are unrolled Python-side into one arithmetic expression —
    O(16·|tokens|) integer ops per row, no shuffle, no UDF (bit test via
    ``bitwiseAND``; no division, so no precision cliff for 60-bit hashes).
    """
    n = F.size(th)

    def bit(b: int) -> Column:
        mask = F.lit(1 << b).cast("long")
        set_count = F.size(F.filter(th, lambda h: h.bitwiseAND(mask) != 0))
        return F.when(2 * set_count >= n, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )

    return reduce(add, [bit(b) for b in range(16)])


@expr_memo
def bow_fingerprint(toks: Column) -> Column:
    """Order-insensitive bag-of-words fingerprint: md5 of the sorted
    distinct token list. Docs with identical vocabulary collide — the
    cheapest near-dup bucket key (one pass, no shuffle)."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))))


@expr_memo
def stopword_count(toks: Column) -> Column:
    return F.size(F.filter(toks, lambda w: w.isin(*STOPWORDS)))


@expr_memo
def vowel_count(text: Column | str) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    return F.length(col) - F.length(F.regexp_replace(col, "[aeiou]", ""))
