"""Broadcast Bloom-filter prefilter (operators/bloom.py).

One-sided-error contract (never drops a true member), measured FP rate
vs the sizing formula, bit-packing pinned against a pure-Python replay,
the portable hash family replayed in DuckDB SQL, and the composed
prefilter join pinned EQUAL to the plain exact join on the
decontamination shape.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.operators import dedup as D
from sportstv_streaming_data_warehouse_spark.operators.bloom import (
    _P,
    bloom_build,
    bloom_parameters,
    bloom_prefilter_join,
    with_bloom_maybe,
)

SF001 = "/root/testdata/sf0.001"


def test_parameters_match_the_standard_formulas():
    n_bits, n_hashes = bloom_parameters(1000, 0.01)
    assert n_bits % 64 == 0
    assert 9586 <= n_bits <= 9664  # ceil(9585.06) rounded up to words
    assert n_hashes == 7
    with pytest.raises(ValueError):
        bloom_parameters(0, 0.01)
    with pytest.raises(ValueError):
        bloom_parameters(10, 1.5)


@pytest.fixture(scope="module", params=[False, True], ids=["xxhash", "portable"])
def built(request, spark):
    portable = request.param
    members = spark.createDataFrame(
        [(f"gram-{i}",) for i in range(500)], "key string"
    )
    n_bits, n_hashes = bloom_parameters(500, 0.01)
    bloom = bloom_build(members, "key", n_bits, n_hashes, portable=portable)
    return members, bloom, n_bits, n_hashes, portable


def test_no_false_negatives(spark, built):
    members, bloom, n_bits, n_hashes, portable = built
    out = with_bloom_maybe(
        members, "key", bloom, n_bits, n_hashes, portable=portable
    )
    assert out.filter(~F.col("bloom_maybe")).count() == 0


def test_false_positive_rate_is_near_the_sizing_target(spark, built):
    _, bloom, n_bits, n_hashes, portable = built
    probes = spark.createDataFrame(
        [(f"absent-{i}",) for i in range(2000)], "key string"
    )
    out = with_bloom_maybe(probes, "key", bloom, n_bits, n_hashes, portable=portable)
    fp = out.filter(F.col("bloom_maybe")).count()
    # target 1%; allow generous sampling slack but catch broken packing
    # (a stuck-bits bug reads ~100%)
    assert fp / 2000 < 0.05


def test_bit_packing_matches_a_pure_python_replay(spark):
    # portable path so the key hash is replayable without xxhash64
    keys = [(f"k{i}",) for i in range(40)]
    members = spark.createDataFrame(keys, "key string")
    n_bits, n_hashes = 256, 3
    got = {
        r["word_idx"]: r["bits"]
        for r in bloom_build(
            members, "key", n_bits, n_hashes, portable=True
        ).collect()
    }
    coefs = D.minhash_coefficients(n_hashes, 42)

    def poly(s):
        h = 0
        for ch in s:
            h = (h * 31 + ord(ch)) % _P
        return h

    words: dict[int, int] = {}
    for (k,) in keys:
        h = poly(k)
        for a, b in coefs:
            pos = ((h * a + b) % _P) % n_bits
            w = pos // 64
            unsigned = words.get(w, 0) | (1 << (pos % 64))
            words[w] = unsigned
    signed = {
        w: v - (1 << 64) if v >= (1 << 63) else v for w, v in words.items()
    }
    assert got == signed


def test_portable_membership_replays_in_duckdb(spark):
    members = [(f"m{i}",) for i in range(60)]
    probes = [(f"m{i}",) for i in range(0, 120, 2)]  # half members, half not
    n_bits, n_hashes = 512, 4
    mdf = spark.createDataFrame(members, "key string")
    pdf = spark.createDataFrame(probes, "key string")
    bloom = bloom_build(mdf, "key", n_bits, n_hashes, portable=True)
    got = sorted(
        (r["key"], r["bloom_maybe"])
        for r in with_bloom_maybe(
            pdf, "key", bloom, n_bits, n_hashes, portable=True
        ).collect()
    )
    # position-set membership is EXACTLY the packed-bit test (bit_or
    # packing is injective on position sets), so the SQL replay checks
    # every probe position against the inserted position set using the
    # same polynomial hash + affine family.
    coefs = D.minhash_coefficients(n_hashes, 42)
    poly = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(string_split(key, ''), "
        f"ch -> CAST(COALESCE(ascii(ch), 0) AS BIGINT))), (a, b) -> (a * 31 + b) % {_P})"
    )
    pos_rows = ", ".join(
        f"((h * {a} + {b}) % {_P}) % {n_bits}" for a, b in coefs
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE members AS SELECT * FROM (VALUES "
        + ", ".join(f"('{k}')" for (k,) in members)
        + ") t(key)"
    )
    con.execute(
        "CREATE TABLE probes AS SELECT * FROM (VALUES "
        + ", ".join(f"('{k}')" for (k,) in probes)
        + ") t(key)"
    )
    want = sorted(
        (k, bool(m))
        for k, m in con.sql(
            f"""
        WITH mh AS (SELECT {poly} AS h FROM members),
        mpos AS (SELECT DISTINCT u.p FROM mh, UNNEST([{pos_rows}]) AS u(p)),
        ph AS (SELECT key, {poly} AS h FROM probes),
        ppos AS (SELECT key, u.p FROM ph, UNNEST([{pos_rows}]) AS u(p))
        SELECT key, BOOL_AND(p IN (SELECT p FROM mpos)) AS maybe
        FROM ppos GROUP BY key
        """
        ).fetchall()
    )
    assert got == want


def test_prefilter_join_equals_the_exact_join_on_decontamination(spark):
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    grams = lambda side: side.select(  # noqa: E731
        "doc_id",
        F.explode(D.word_shingles(F.col("text"), n=2, distinct=True)).alias("gram"),
    )
    tagged = docs.withColumn("__b", F.col("doc_id") % 10)
    train_g = grams(tagged.filter(F.col("__b") != 9))
    eval_g = grams(tagged.filter(F.col("__b") == 9)).select("gram").distinct()
    exact = (
        train_g.join(F.broadcast(eval_g), "gram")
        .select("doc_id", "gram")
        .distinct()
    )
    screened = bloom_prefilter_join(train_g, eval_g, "gram", fpp=0.01)
    screened = screened.select("doc_id", "gram").distinct()
    assert screened.exceptAll(exact).count() == 0
    assert exact.exceptAll(screened).count() == 0
    assert exact.count() > 0


def test_membership_plan_is_all_broadcast_hash_joins(spark, built):
    # the sparse word table rides n_hashes broadcast HASH joins (O(1)
    # probes, zero shuffle of the key side); any loop join, cartesian
    # product, or sort-merge join means the screen stopped being
    # map-side. At runtime the identical join sides collapse to ONE
    # materialized broadcast + n_hashes-1 ReusedExchange nodes, so the
    # bitset never occupies k copies of broadcast memory.
    members, bloom, n_bits, n_hashes, portable = built
    out = with_bloom_maybe(members, "key", bloom, n_bits, n_hashes, portable=portable)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == n_hashes
    out.collect()  # AQE resolves exchange reuse at runtime
    final = out._jdf.queryExecution().executedPlan().toString()
    assert final.count("ReusedExchange") == n_hashes - 1


def test_wide_filter_addresses_past_2_31_bits(spark):
    # round-11 ADVICE: the affine family draws mod P = 2^31-1, so any
    # n_bits >= P was silently unreachable (the 1e9-gram sizing needs
    # ~9.6e9 bits). The wide xxhash64 family must (a) keep the
    # no-false-negative contract, (b) actually set bits past 2^31, and
    # (c) keep the FP rate near target instead of collapsing to ~75%.
    n_bits = ((5_000_000_000 + 63) // 64) * 64
    n_hashes = 7
    members = spark.createDataFrame(
        [(f"wide-{i}",) for i in range(300)], "key string"
    )
    bloom = bloom_build(members, "key", n_bits, n_hashes)
    max_word = bloom.agg(F.max("word_idx")).collect()[0][0]
    assert max_word * 64 > 2**31  # bits past the old collapse point are set
    out = with_bloom_maybe(members, "key", bloom, n_bits, n_hashes)
    assert out.filter(~F.col("bloom_maybe")).count() == 0
    probes = spark.createDataFrame(
        [(f"absent-wide-{i}",) for i in range(2000)], "key string"
    )
    fp = (
        with_bloom_maybe(probes, "key", bloom, n_bits, n_hashes)
        .filter(F.col("bloom_maybe"))
        .count()
    )
    # 300 keys in 5e9 bits: expected FP ~ 0; anything over 1% means the
    # position space collapsed
    assert fp / 2000 < 0.01


def test_wide_filter_refuses_the_portable_path(spark):
    members = spark.createDataFrame([("a",)], "key string")
    with pytest.raises(ValueError, match="portable"):
        bloom_build(members, "key", _P + 64, 3, portable=True)


def test_prefilter_join_sizing_ignores_dup_and_null_small_keys(spark):
    # the default n_items must be the DISTINCT non-null key count (the
    # sizing formula's quantity) — and the composed join must still
    # equal the exact join when the small side carries dups and NULLs
    big = spark.createDataFrame(
        [(i, f"k{i % 20}") for i in range(200)], "row_id long, key string"
    )
    small = spark.createDataFrame(
        [(f"k{i % 5}",) for i in range(500)] + [(None,)] * 10, "key string"
    )
    exact = big.join(small.select("key").distinct(), "key", "left_semi")
    got = bloom_prefilter_join(big, small, "key", fpp=0.01)
    assert sorted(r["row_id"] for r in got.collect()) == sorted(
        r["row_id"] for r in exact.collect()
    )


def test_null_keys_screen_out_cleanly(spark):
    # a NULL probe key must neither throw (ANSI) nor pass the screen
    # when the built set holds only real keys
    m = spark.createDataFrame([("a",), ("b",)], "key string")
    bl = bloom_build(m, "key", 128, 3)
    probes = spark.createDataFrame([("a",), (None,), ("zz",)], "key string")
    got = {
        r["key"]: r["bloom_maybe"]
        for r in with_bloom_maybe(probes, "key", bl, 128, 3).collect()
    }
    assert got["a"] is True
    assert not got[None]
    assert not got["zz"]


from hypothesis import given, settings, strategies as st

_key = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=12
)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(_key, min_size=1, max_size=40, unique=True),
    st.booleans(),
)
def test_property_no_false_negatives_for_any_key_set(spark, keys, portable):
    """Members always pass the screen, for arbitrary printable keys on
    both hash paths — the one-sided-error contract under fuzzing."""
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    n_bits, n_hashes = bloom_parameters(len(keys), 0.01)
    bl = bloom_build(df, "key", n_bits, n_hashes, portable=portable)
    out = with_bloom_maybe(df, "key", bl, n_bits, n_hashes, portable=portable)
    assert out.filter(~F.col("bloom_maybe")).count() == 0
