"""Broadcast Bloom-filter prefilter — map-side membership screening.

The 100 TB decontamination problem: the exact n-gram leakage check
(catalog ``x_decontamination``) broadcasts the DISTINCT eval-gram set
and equi-joins the exploded train grams against it. That is already
map-side, but the broadcast is the exact STRING set — at a billion eval
grams that is tens of GB and stops fitting. The classic fix is a Bloom
filter: a billion grams at 1% false-positive rate pack into ~1.2 GB of
bits, the big-corpus scan stays fully map-side (broadcast one row
holding the bitset; zero shuffle of corpus grams), and only the ~fpp
false-positive fraction plus the true hits continue to the exact
confirmation join. Membership errors are ONE-SIDED: the bloom never
misses a real hit, so prefilter → exact join is exactly equal to the
exact join alone (pinned in tests/test_bloom.py).

Hashing: ``pos_i(key) = ((a_i·h(key) + b_i) mod P) mod n_bits`` with the
same affine family the MinHash tier draws (operators/dedup.
minhash_coefficients) over either the xxhash64 fast path or the
polynomial rolling hash (``portable=True``). Filters wider than P =
2^31-1 bits (the 1e9-gram sizing is ~9.6e9) switch the fast path to k
independent full-width xxhash64 draws — 2^63-addressable — and the
portable path refuses (its mod-P hash cannot reach those positions).
The portable path's whole
pipeline (hash, positions, word/bit packing, membership conjunction)
re-runs in plain SQL, so a DuckDB oracle can replay it bit-for-bit
(tests/test_bloom.py pins that replay; a catalog registration carries
it to the driver gate).

Plan shape: the SPARSE (word_idx, bits) table broadcasts once and the
k probe positions each resolve through a broadcast HASH join on
word_idx (O(1) per probe, zero shuffle of the corpus side, absent word
= clean). A dense-array broadcast row was measured and rejected: Spark's
MapType ``element_at`` is a linear scan, so densifying n_words entries
costs n_words × n_entries (a single task hung minutes at ~200K words),
and per-probe dense literals re-inline the whole bitset k times (the
PQ plan-shape lesson). Beyond the ~8 GB broadcast ceiling, pre-shuffle
both sides by word_idx bucket instead (noted, not built — the fixtures
are nowhere near it).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _HASH_PRIME as _P  # the coefficient family's modulus —
# positions assume EXACTLY the range minhash_coefficients draws from
from .dedup import _poly_hash, minhash_coefficients


def bloom_parameters(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Standard sizing: optimal (n_bits, n_hashes) for ``n_items`` keys
    at false-positive rate ``fpp``. n_bits is rounded up to a multiple
    of 64 (whole words)."""
    if n_items <= 0:
        raise ValueError(f"n_items must be positive, got {n_items}")
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    n_bits = math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2))
    n_bits = ((n_bits + 63) // 64) * 64
    n_hashes = max(1, round(n_bits / n_items * math.log(2)))
    return n_bits, n_hashes


def _key_hash(key: Column, portable: bool) -> Column:
    if portable:
        return _poly_hash(key)
    return F.pmod(F.xxhash64(key), F.lit(_P))


def _positions(
    key: Column, n_bits: int, n_hashes: int, seed: int, portable: bool
) -> list[Column]:
    # The affine family draws positions mod P = 2^31-1, so a filter wider
    # than P bits is silently unaddressable (round-11 ADVICE: the 1e9-gram
    # sizing is ~9.6e9 bits — the probe space would collapse to 2^31 and
    # the real FP rate climbs to ~75%). Wide filters therefore switch to
    # k independent full-width xxhash64 draws (key hashed together with
    # the seed and the probe index — 2^63-addressable, no overflow, same
    # expression on build and probe so one-sidedness is preserved). The
    # portable path cannot follow (its polynomial hash is mod-P by design
    # for the SQL replay), so it refuses loudly instead of screening at
    # a collapsed width.
    if n_bits >= _P:
        if portable:
            raise ValueError(
                f"portable bloom positions are drawn mod P={_P}; "
                f"n_bits={n_bits} >= P is unaddressable on the portable "
                "path — use portable=False (wide xxhash64 family) or a "
                "higher fpp/sharded filter"
            )
        return [
            F.pmod(
                F.xxhash64(key, F.lit(int(seed)), F.lit(i)),
                F.lit(int(n_bits)),
            )
            for i in range(n_hashes)
        ]
    h = _key_hash(key, portable)
    return [
        ((h * F.lit(a) + F.lit(b)) % F.lit(_P)) % F.lit(int(n_bits))
        for a, b in minhash_coefficients(n_hashes, seed)
    ]


def bloom_build(
    df: DataFrame,
    key_col: str,
    n_bits: int,
    n_hashes: int,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """Aggregate ``key_col`` into a Bloom bitset: one row per NON-EMPTY
    64-bit word, (word_idx BIGINT, bits BIGINT). A distributed bit_or
    aggregate — the bitset never touches the driver."""
    pos = F.explode(
        F.array(*_positions(F.col(key_col), n_bits, n_hashes, seed, portable))
    ).alias("pos")
    return (
        df.select(pos)
        .select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "__bit"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__bit").alias("bits"))
    )


def with_bloom_maybe(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    n_bits: int,
    n_hashes: int,
    seed: int = 42,
    portable: bool = False,
    out_col: str = "bloom_maybe",
) -> DataFrame:
    """Map-side membership: ``n_hashes`` broadcast HASH joins of the
    SPARSE word table (one per probe position, each an O(1) lookup;
    Spark reuses the single broadcast exchange across all of them),
    then the bit-test conjunction — true iff the key MIGHT be in the
    built set (no false negatives). Zero shuffle of ``df``.

    Why not one broadcast row holding the dense array<long>: a map- or
    array-fold to densify is quadratic on the driverless path (Spark's
    MapType ``element_at`` is a LINEAR scan, so densifying n_words
    entries costs n_words × n_entries — measured hanging a single task
    for minutes at ~200K words), and a dense literal re-inlines per
    probe term. The sparse table IS the broadcast-ready form: absent
    word → null bits → bit test false."""
    probes = _positions(F.col(key_col), n_bits, n_hashes, seed, portable)
    out = df
    for i, p in enumerate(probes):
        out = out.withColumn(f"__bw{i}", (p / 64).cast("long")).withColumn(
            f"__bo{i}", (p % 64).cast("int")
        )
    # every join side is the IDENTICAL projection (alias only renames
    # the scope, not the plan), so at runtime the word table broadcasts
    # ONCE and the other n_hashes-1 sides resolve to ReusedExchange
    # nodes (pinned in tests on the post-execution adaptive plan) —
    # the bitset occupies one broadcast's memory, not k copies
    side_base = bloom.select("word_idx", "bits")
    hit = None
    joined_cols = []
    for i in range(n_hashes):
        side = F.broadcast(side_base.alias(f"__bloom{i}"))
        out = out.join(
            side,
            F.col(f"__bw{i}") == F.col(f"__bloom{i}.word_idx"),
            "left",
        )
        one = (
            F.getbit(
                F.coalesce(
                    F.col(f"__bloom{i}.bits"), F.lit(0).cast("long")
                ),
                F.col(f"__bo{i}"),
            )
            == 1
        )
        hit = one if hit is None else (hit & one)
        joined_cols += [
            F.col(f"__bloom{i}.word_idx"),
            F.col(f"__bloom{i}.bits"),
        ]
    out = out.withColumn(out_col, hit)
    for c in joined_cols:
        out = out.drop(c)
    return out.drop(
        *[c for i in range(n_hashes) for c in (f"__bw{i}", f"__bo{i}")]
    )


def bloom_prefilter_join(
    big: DataFrame,
    small: DataFrame,
    key_col: str,
    fpp: float = 0.01,
    n_items: int | None = None,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """The composed screen: build a bloom over ``small[key_col]``, keep
    only ``big`` rows whose key might be present, then CONFIRM with the
    exact semi join — result rows are exactly ``big ⋉ small`` (the bloom
    only shrinks what reaches the join; one-sided errors guarantee
    equality). ``n_items`` sizes the filter (default: the DISTINCT
    non-null key count of ``small`` — the quantity the sizing formula is
    stated in; a raw count would oversize n_bits and the broadcast by
    the small side's key-duplication factor)."""
    if n_items is None:
        n_items = small.select(key_col).na.drop().distinct().count()
    n_bits, n_hashes = bloom_parameters(max(n_items, 1), fpp)
    bloom = bloom_build(small, key_col, n_bits, n_hashes, seed, portable)
    screened = with_bloom_maybe(
        big, key_col, bloom, n_bits, n_hashes, seed, portable
    ).filter(F.col("bloom_maybe"))
    return screened.drop("bloom_maybe").join(
        small.select(key_col).distinct(), key_col, "left_semi"
    )
