"""Expression-level Bloom filter for runtime join pruning.

The 100 TB pattern this encodes: a shuffle (sort-merge) join between a
huge fact and a mid-size dimension selection moves EVERY fact row
through the exchange, even though most can never match. Spark's own
runtime row-level filtering (`spark.sql.optimizer.runtime.bloomFilter.
enabled`) injects exactly this prefilter when statistics allow; this
module makes the pattern explicit, portable, and testable: build a
Bloom bitmap from the dimension's join keys (driver-side, KB-scale —
the same discipline as the IVF codebooks in operators/similarity.py),
then prefilter the fact with a pure-expression membership test BEFORE
the shuffle. False positives are eliminated by the exact join that
follows, so the final result is bit-identical to the plain join — which
is what lets a DuckDB oracle hash-check the whole pipeline.

Layout: ``m_bits`` bits packed 60 per bigint word (60, not 64, so every
mask ``1 << b`` stays a positive long and the bitmap survives any
literal round-trip without sign games). ``k`` probe positions per key
via ``xxhash64(key, seed_i) mod m`` — xxhash64 is a JVM-side codegen'd
expression, so the probe is whole-stage-compiled with zero Python in
the hot path.

Sizing: FPR ≈ (1 - e^(-k*n/m))^k. The default m=61,440 bits holds ~6k
keys at ~1% FPR in an 8 KB literal. For dimension selections in the
millions of keys, scale m linearly (1.2 MB per ~1M keys at 1% — still
a broadcast-trivial plan literal, but at that point prefer handing the
keys to a broadcast semi-join and letting AQE decide; the Bloom wins
when the exact key set is too big to broadcast but the BITMAP is not).

No reference analog (the reference joins pandas frames in memory);
extends SURVEY §2.3 for the warehouse-scale join surface.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS_PER_WORD = 60

_INTEGRAL = {"tinyint", "smallint", "int", "bigint"}


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k probe positions in [0, m_bits) — xxhash64 of (key, seed).

    xxhash64 hashes the VALUE AND ITS TYPE: xxhash64(5::int) !=
    xxhash64(5::bigint). A build/probe type mismatch would therefore
    be silent false negatives — dropped matching rows. Callers of the
    raw build/probe pair must hash identical types;
    ``bloom_prefilter_join`` normalizes integral keys to bigint and
    refuses anything else mismatched."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k)
    ]


def _norm_key(key: Column | str, dtype: str) -> Column:
    key = F.col(key) if isinstance(key, str) else key
    return key.cast("bigint") if dtype in _INTEGRAL else key


def build_bloom(
    df: DataFrame, key_col: str, m_bits: int = 61_440, k: int = 3
) -> list[int]:
    """Fit a Bloom bitmap over ``df[key_col]`` (the build/dimension
    side). One distinct-positions aggregation, then a driver collect of
    at most min(m_bits, k * n_keys) ints — KB-scale for any build side
    a Bloom is appropriate for (the fitted-artifact discipline of the
    IVF codebooks). Returns ``m_bits / 60`` packed bigint words.
    Integral keys hash as bigint so a probe side of a different
    integral width still matches (see _positions).
    """
    if m_bits % BITS_PER_WORD:
        raise ValueError(f"m_bits must be a multiple of {BITS_PER_WORD}")
    key = _norm_key(key_col, dict(df.dtypes)[key_col])
    pos = F.explode(F.array(*_positions(key, m_bits, k)))
    rows = df.select(pos.alias("pos")).distinct().collect()
    words = [0] * (m_bits // BITS_PER_WORD)
    for r in rows:
        words[r.pos // BITS_PER_WORD] |= 1 << (r.pos % BITS_PER_WORD)
    return words


def might_contain(
    key: Column | str, words: list[int], m_bits: int = 61_440, k: int = 3
) -> Column:
    """Membership predicate: true iff all k probe bits are set. The
    bitmap travels as ONE array<bigint> plan literal (m_bits/60 words);
    each probe is element_at + bitwiseAND — O(k) per row, no Python.

    Guaranteed no false negatives (every inserted key tests true), so
    ``fact.filter(might_contain(...)).join(dim, key)`` ≡
    ``fact.join(dim, key)`` row-for-row; false positives only cost
    shuffle bytes the exact join then discards.

    LOW-LEVEL primitive: the probe column's TYPE must match what
    build_bloom hashed, and build_bloom normalizes integral keys to
    BIGINT — so a raw ``might_contain("int_col", words)`` probe of an
    int-built bitmap would silently drop rows. Probe through
    ``bloom_probe`` (which reads the dtype and normalizes) or
    ``bloom_prefilter_join`` unless you are constructing the column
    expression yourself; then apply ``_norm_key`` first.
    """
    key = F.col(key) if isinstance(key, str) else key
    if len(words) * BITS_PER_WORD != m_bits:
        raise ValueError(
            f"bitmap/m_bits mismatch: {len(words)} words hold "
            f"{len(words) * BITS_PER_WORD} bits, m_bits={m_bits} — probes "
            "would hash mod the wrong modulus and silently drop members"
        )
    bm = F.lit(words)
    masks = F.lit([1 << b for b in range(BITS_PER_WORD)])
    conds = []
    for pos in _positions(key, m_bits, k):
        word = F.element_at(bm, (pos / BITS_PER_WORD).cast("int") + 1)
        mask = F.element_at(masks, F.pmod(pos, BITS_PER_WORD).cast("int") + 1)
        conds.append(word.bitwiseAND(mask) != 0)
    return reduce(lambda a, b: a & b, conds)


def bloom_probe(
    df: DataFrame,
    key_col: str,
    words: list[int],
    m_bits: int = 61_440,
    k: int = 3,
) -> DataFrame:
    """``df`` filtered to probable members — might_contain with the
    key normalized the same way build_bloom normalized it (integral →
    bigint), read off the DataFrame's own dtype so a raw-typed probe
    can't silently mismatch the build."""
    key = _norm_key(key_col, dict(df.dtypes)[key_col])
    return df.filter(might_contain(key, words, m_bits, k))


def bloom_prefilter_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 61_440,
    k: int = 3,
    words: list[int] | None = None,
) -> DataFrame:
    """Inner join with a Bloom prefilter on the fact side: fit the
    bitmap on ``dim``'s keys, drop non-members of ``fact`` BEFORE the
    join's exchange, then join exactly. Result is identical to
    ``fact.join(dim, fact_key == dim_key)``; the prefilter only shrinks
    what the shuffle moves. The join is hinted sort-merge — the shape
    the pattern exists for (a broadcast-able dim wouldn't need a
    Bloom; the runtime filter is what replaces the broadcast when the
    dim outgrows it).

    Key types: integral keys of any width hash as bigint on both
    sides (xxhash64 is type-sensitive — an int build probed by a
    bigint fact would silently drop matches); any other cross-type
    pairing is rejected rather than risked.

    Fitting the bitmap is a real (small) Spark job at plan-build time;
    callers building the same plan repeatedly should fit once with
    ``build_bloom`` and pass ``words`` (the memoized-fitted-artifact
    discipline of the IVF codebooks)."""
    if words is not None and len(words) * BITS_PER_WORD != m_bits:
        raise ValueError(
            f"prefit words ({len(words)} words = "
            f"{len(words) * BITS_PER_WORD} bits) do not match m_bits="
            f"{m_bits}; pass the m_bits the bitmap was built with"
        )
    ft = dict(fact.dtypes)[fact_key]
    dt = dict(dim.dtypes)[dim_key]
    if ft != dt and not (ft in _INTEGRAL and dt in _INTEGRAL):
        raise ValueError(
            f"bloom_prefilter_join key type mismatch: {fact_key}:{ft} vs "
            f"{dim_key}:{dt} — xxhash64 membership would silently drop rows"
        )
    if words is None:
        words = build_bloom(dim, dim_key, m_bits, k)
    pre = bloom_probe(fact, fact_key, words, m_bits, k)
    return pre.join(dim.hint("merge"), pre[fact_key] == dim[dim_key])
