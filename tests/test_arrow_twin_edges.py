"""Edge-policy pins for the Arrow-batched bit-identical twins.

The four pandas_udf twins (similarity.dot_pandas, clustering._sq_l2_pandas,
similarity.table_signatures_pandas / banded_signatures_pandas,
similarity.normalize_embeddings_pandas) advertise bit-identity to their JVM
folds FOR FINITE INPUTS. This module feeds literal NaN / Inf / NULL /
width-mismatched vectors through BOTH sides and pins the documented edge
policy, so a future Arrow-serializer or numpy change cannot silently flip
ranking or bucketing behavior:

- finite inputs: twin == JVM bit-for-bit (incl. Inf, which both propagate);
- NaN DATA: JVM keeps NaN, twin yields NULL — the deliberate safe-direction
  divergence (Spark sorts NaN above every number, so a NaN similarity would
  rank a corrupt vector as the #1 neighbor; NULL sorts last);
- NULL arrays: NULL both sides for the pair folds; for signatures the JVM
  expression degrades to bucket 0 (null projection fails `>= 0`, the
  when/otherwise emits bit 0) while the twin yields NULL — divergence in the
  safe direction (a NULL bucket joins nothing; bucket 0 would collide);
- a-vs-b width mismatch: NULL both sides, matching zip_with's null-padding —
  including the UNIFORM-batch case where each side vstacks cleanly but the
  widths differ (the round-9 fix: previously an uncaught IndexError when a
  was wider, a silent dot over only a's dims when narrower);
- NaN signatures: JVM sets the sign bit (NaN >= 0 is true under NaN-max
  ordering), numpy clears it — corrupt vectors land in different, non-real
  buckets.
"""

import math

import pytest
from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.operators.clustering import (
    _sq_l2_expr,
    _sq_l2_pandas,
)
from sportstv_streaming_data_warehouse_spark.operators.similarity import (
    banded_signatures_expr,
    banded_signatures_pandas,
    dot,
    dot_pandas,
    lcg_plane,
    lsh_signature,
    normalize_embeddings,
    normalize_embeddings_pandas,
    table_signatures_pandas,
)

NAN, INF = float("nan"), float("inf")


PAIR_TWINS = [
    pytest.param(dot, dot_pandas, id="dot"),
    # the production expression, imported (not re-implemented) so the
    # bit-identity pin cannot silently drift from the shipped fold
    pytest.param(_sq_l2_expr, _sq_l2_pandas, id="sq_l2"),
]


@pytest.mark.parametrize("jvm_fold,twin", PAIR_TWINS)
def test_pair_twin_edge_policy(spark, jvm_fold, twin):
    rows = [
        (1, [1.0, 2.0], [3.0, 4.0]),  # finite: bit-identical
        (2, [NAN, 1.0], [1.0, 1.0]),  # NaN data: JVM NaN, twin NULL
        (3, [INF, 1.0], [1.0, 1.0]),  # Inf: both propagate Inf
        (4, [1.0, 2.0, 3.0], [1.0, 1.0]),  # a wider: NULL both
        (5, [1.0, 2.0], [1.0, 1.0, 1.0]),  # a narrower: NULL both
        (6, None, [1.0, 1.0]),  # null array: NULL both
        (7, [1.0, 1.0], None),
    ]
    df = spark.createDataFrame(rows, "id long, a array<double>, b array<double>")
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            jvm_fold(F.col("a"), F.col("b")).alias("jvm"),
            twin(F.col("a"), F.col("b")).alias("tw"),
        ).collect()
    }
    assert out[1]["jvm"] == out[1]["tw"] and out[1]["tw"] is not None
    assert math.isnan(out[2]["jvm"]) and out[2]["tw"] is None
    assert math.isinf(out[3]["jvm"]) and math.isinf(out[3]["tw"])
    for i in (4, 5, 6, 7):
        assert out[i]["jvm"] is None and out[i]["tw"] is None, (i, out[i])


@pytest.mark.parametrize("jvm_fold,twin", PAIR_TWINS)
def test_pair_twin_uniform_width_mismatch_batches(spark, jvm_fold, twin):
    """Whole-batch uniform mismatch: vstack succeeds on BOTH sides, so only
    the explicit width re-check routes these rows to the NULL fallback —
    the round-9 ADVICE fix (wider a used to IndexError and kill the task;
    narrower a silently dotted over only a's dims)."""
    for a, b in ([1.0, 2.0, 3.0], [1.0, 1.0]), ([1.0, 2.0], [1.0, 1.0, 1.0]):
        df = spark.createDataFrame(
            [(i, a, b) for i in range(8)], "id long, a array<double>, b array<double>"
        )
        got = df.select(
            jvm_fold(F.col("a"), F.col("b")).alias("jvm"),
            twin(F.col("a"), F.col("b")).alias("tw"),
        ).collect()
        assert all(r["jvm"] is None and r["tw"] is None for r in got), (a, b, got[:2])


def test_signature_twins_edge_policy(spark):
    planes = [lcg_plane(4, 0), lcg_plane(4, 4)]
    df = spark.createDataFrame(
        [
            (1, [1.0, -2.0, 0.5, 3.0]),  # finite: bit-identical everywhere
            (2, [NAN, 1.0, 1.0, 1.0]),  # NaN: JVM sign bits SET, numpy CLEAR
            (3, None),  # null: JVM bucket 0, twin NULL
        ],
        "id long, v array<double>",
    )
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            lsh_signature(F.col("v"), planes).alias("jvm_sig"),
            table_signatures_pandas(F.col("v"), [planes]).alias("tw_sig"),
            banded_signatures_expr(F.col("v"), 4, 2, 1, 0).alias("jvm_band"),
            banded_signatures_pandas("v", 4, 2, 1, 0).alias("tw_band"),
        ).collect()
    }
    # finite: all four agree bit-for-bit
    r = out[1]
    assert r["tw_sig"] == [r["jvm_sig"]] and r["tw_band"] == r["jvm_band"]
    # NaN data: every projection is NaN; NaN >= 0 is TRUE JVM-side (sign
    # bits all set -> 0b11 = 3) but FALSE in numpy (bucket 0) — the
    # documented divergence: the corrupt vector lands in a bucket real
    # vectors with those planes cannot produce deterministically
    r = out[2]
    assert r["jvm_sig"] == 3 and r["jvm_band"] == [3]
    assert r["tw_sig"] == [0] and r["tw_band"] == [0]
    # null vector: the JVM when/otherwise degrades to bucket 0 (would
    # collide with genuine bucket-0 vectors); the twins return NULL, which
    # equi-joins nothing — the safe direction
    r = out[3]
    assert r["jvm_sig"] == 0 and r["jvm_band"] == [0]
    assert r["tw_sig"] is None and r["tw_band"] is None


def test_normalize_twin_edge_policy(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [NAN, 1.0]), (3, [INF, 1.0]), (4, None)],
        "id long, embedding array<double>",
    )
    jvm = {
        r["id"]: r["embedding"]
        for r in normalize_embeddings(df).collect()
    }
    tw = {
        r["id"]: r["embedding"]
        for r in normalize_embeddings_pandas(df).collect()
    }
    assert jvm[1] == tw[1] == [0.6, 0.8]
    # NaN norm poisons every element JVM-side; the twin's NaN elements map
    # to NULL through the Arrow list serializer — same safe direction,
    # element-wise
    assert all(math.isnan(x) for x in jvm[2]) and tw[2] == [None, None]
    # Inf: inf/inf = NaN, 1/inf = 0.0 — the finite elements still agree
    assert math.isnan(jvm[3][0]) and jvm[3][1] == 0.0
    assert tw[3] == [None, 0.0]
    assert jvm[4] is None and tw[4] is None


def test_minhash_slots_twin_matches_expression_slots(spark):
    """The integer Arrow twin (round-9 adoption, 1.75x at 100x) must be
    bit-identical to the array_min(transform(...)) expression stack on
    real text AND edge rows — pure 64-bit integer math, so unlike the
    float twins equality is exact by construction. Note the edge rows
    are NOT null signatures: word_shingles(distinct=True)'s short-doc
    fallback gives null/empty/whitespace text the single "" shingle
    (concat_ws of no tokens), so all degenerate docs share one
    deterministic signature — established expression semantics the
    oracle replays, which the twin must reproduce exactly."""
    from sportstv_streaming_data_warehouse_spark.operators.dedup import (
        minhash_signature,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different text with other tokens here"),
            (4, None),
            (5, ""),
            (6, "   \t\n "),
            (7, "two words"),  # fewer tokens than the 3-shingle width
        ],
        "doc_id long, text string",
    )
    expr = {
        r["doc_id"]: r["signature"]
        for r in minhash_signature(docs, "doc_id", "text", arrow=False).collect()
    }
    twin = {
        r["doc_id"]: r["signature"]
        for r in minhash_signature(docs, "doc_id", "text", arrow=True).collect()
    }
    assert expr == twin
    # near-dup docs share most slots
    shared = sum(a == b for a, b in zip(twin[1], twin[2]))
    assert shared >= 16, shared
    # degenerate docs (null/empty/whitespace) share the ""-shingle
    # signature; a real short doc gets its whole-text shingle instead
    assert twin[4] == twin[5] == twin[6]
    assert all(v is not None for v in twin[4])
    assert twin[7] != twin[4]


def test_minhash_slots_twin_null_elements_match_array_min_skip(spark):
    """Direct pin of minhash_slots_pandas' element-null policy: Arrow
    presents a null element of array<long> as NaN in a float array,
    which an `is not None` filter does NOT catch — the round-9 review
    found the twin crashed with 'cannot convert float NaN to integer'
    instead of skipping the element the way array_min skips nulls."""
    from sportstv_streaming_data_warehouse_spark.operators.dedup import (
        _HASH_PRIME,
        minhash_coefficients,
        minhash_slots_pandas,
    )

    coefs = minhash_coefficients(4, 42)
    df = spark.createDataFrame(
        [
            (1, [100, None, 300]),  # null element: skipped per slot
            (2, [100, 300]),        # the equivalent dense array
            (3, [None]),            # all-null: k NULL slots
            (4, []),                # empty: k NULL slots
        ],
        "id long, hs array<long>",
    )
    expr = df.select(
        "id",
        F.array(
            *[
                F.array_min(
                    F.transform(
                        "hs",
                        lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(_HASH_PRIME),
                    )
                )
                for a, b in coefs
            ]
        ).alias("sig"),
    )
    twin = df.select("id", minhash_slots_pandas(F.col("hs"), coefs).alias("sig"))
    e = {r["id"]: r["sig"] for r in expr.collect()}
    t = {r["id"]: r["sig"] for r in twin.collect()}
    assert e == t
    assert t[1] == t[2]  # the null element contributed nothing
    assert t[3] == t[4] == [None] * 4


def test_poly_minhash_twin_matches_expression_portable_path(spark):
    """Round-14: the PORTABLE path's one-pass Arrow twin
    (poly_minhash_slots_pandas — char-level polynomial hash + k affine
    mins) must be bit-identical to the interpreted expression stack it
    replaces, over real text AND the adversarial edges: null / empty /
    whitespace-only docs, unicode incl. a non-BMP char (split('')
    yields codepoints, probed on Spark 4.1.2 — a UTF-16-unit
    implementation would diverge here), interior NUL characters
    (codepoint 0 folds as h*31, indistinguishable from the matrix
    padding unless the mask uses true lengths), and both shingle
    widths the catalog uses (n=1 gate/incremental, n=3 default)."""
    from sportstv_streaming_data_warehouse_spark.operators.dedup import (
        minhash_signature,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, None),
            (4, ""),
            (5, "   \t\n "),
            (6, "héllo wörld 日本語のテキスト mixed"),
            (7, "emoji 😀 in the middle"),
            (8, "nul\x00char inside token"),
            (9, "two words"),
            (10, "x"),
        ],
        "doc_id long, text string",
    )
    for n in (1, 3):
        expr = {
            r["doc_id"]: r["signature"]
            for r in minhash_signature(
                docs, "doc_id", "text", n=n, portable=True, arrow=False
            ).collect()
        }
        twin = {
            r["doc_id"]: r["signature"]
            for r in minhash_signature(
                docs, "doc_id", "text", n=n, portable=True, arrow=True
            ).collect()
        }
        assert expr == twin, f"n={n}"


def test_ivf_assign_twin_matches_expression_path(spark):
    """Round-15: the Arrow argmax-assign (ivf_assign_ids_pandas, closure
    centroids) must reproduce the expression path's crossJoin → dot fold
    → row_number(dot DESC, centroid_id ASC) ≤ keep EXACTLY — cell
    MEMBERSHIP per row — over finite vectors (incl. exact ties, which
    must break to the smaller centroid id), NULL vectors and ragged
    widths (NULL dots, desc-ordered last), for keep=1 and keep=n_probe.
    NaN-element vectors are the documented safe-direction divergence
    (module policy above) and are pinned separately below."""
    from sportstv_streaming_data_warehouse_spark.operators.similarity import (
        _ivf_assign,
        collect_centroids,
    )

    cents = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (3, [0.0, 1.0, 0.0]),
            (7, [0.0, 1.0, 0.0]),   # duplicate of 3: forces dot ties
            (9, [0.5, 0.5, 0.5]),
        ],
        "centroid_id long, __centroid array<double>",
    )
    rows = spark.createDataFrame(
        [
            (1, [1.0, 2.0, 3.0]),
            (2, [0.0, 1.0, 0.0]),      # ties centroids 3 and 7 exactly
            (3, None),                 # NULL vector: all dots NULL
            (4, [1.0, 1.0]),           # ragged: width mismatch, dots NULL
            (5, [0.25, -0.5, 0.125]),  # exact dyadics
            (6, [0.0, 0.0, 0.0]),      # all-zero: every dot == +0.0 (tie)
        ],
        "vec_id long, embedding array<double>",
    )
    lit = collect_centroids(cents)
    for keep in (1, 3):
        expr = sorted(
            (r["vec_id"], r["centroid_id"])
            for r in _ivf_assign(
                rows, cents, "vec_id", "embedding", keep, arrow=False
            ).collect()
        )
        for cached in (lit, None):
            arrow = sorted(
                (r["vec_id"], r["centroid_id"])
                for r in _ivf_assign(
                    rows, cents, "vec_id", "embedding", keep,
                    arrow=True, cents=cached,
                ).collect()
            )
            assert arrow == expr, f"keep={keep} cents={'lit' if cached else 'collected'}"


def test_ivf_assign_twin_nan_vector_is_safe_direction(spark):
    """A NaN element reaches the kernel as NaN (Arrow list-of-float) and
    NaN dots rank FIRST — matching how Spark itself would order a NaN
    dot (NaN sorts above every number) rather than the expression
    path's NULL-dot-last (the JVM fold nulls the whole dot). Pin the
    membership so the divergence stays deliberate and bounded: the row
    still lands on deterministic cells, tie-broken by centroid id."""
    from sportstv_streaming_data_warehouse_spark.operators.similarity import (
        _ivf_assign,
    )

    cents = spark.createDataFrame(
        [(2, [1.0, 0.0]), (5, [0.0, 1.0])],
        "centroid_id long, __centroid array<double>",
    )
    rows = spark.createDataFrame(
        [(1, [float("nan"), 1.0])], "vec_id long, embedding array<double>"
    )
    got = sorted(
        r["centroid_id"]
        for r in _ivf_assign(
            rows, cents, "vec_id", "embedding", 1, arrow=True
        ).collect()
    )
    # both dots NaN -> ties break to the smaller centroid id
    assert got == [2]


def test_poly_minhash_twin_randomized_corpus_parity(spark):
    """Round-15 (r14 ADVICE): the portable path's Arrow twin bit-identity
    rests on two probed Spark behaviors (split('') yields codepoints,
    ascii() = codepoint) pinned above on 10 hand-picked docs. This
    widens the pin to a seeded pseudo-random corpus — mixed-script
    tokens drawn across ASCII / Latin-1 / CJK / non-BMP ranges, random
    token counts and lengths — so a Spark upgrade changing either
    behavior fails THIS test loudly instead of surfacing as downstream
    oracle drift across the whole poly family."""
    import random

    from sportstv_streaming_data_warehouse_spark.operators.dedup import (
        minhash_signature,
    )

    rng = random.Random(15_042)
    ranges = [
        (0x20, 0x7E),        # ASCII printable (incl. space: multi-token)
        (0xA1, 0xFF),        # Latin-1
        (0x400, 0x4FF),      # Cyrillic
        (0x4E00, 0x9FFF),    # CJK
        (0x1F300, 0x1F64F),  # non-BMP emoji
    ]

    def token():
        lo, hi = rng.choice(ranges)
        return "".join(
            chr(rng.randint(lo, hi)) for _ in range(rng.randint(1, 12))
        )

    docs = [
        (i, " ".join(token() for _ in range(rng.randint(0, 25))))
        for i in range(300)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for n in (1, 3):
        expr = {
            r["doc_id"]: r["signature"]
            for r in minhash_signature(
                df, "doc_id", "text", n=n, portable=True, arrow=False
            ).collect()
        }
        twin = {
            r["doc_id"]: r["signature"]
            for r in minhash_signature(
                df, "doc_id", "text", n=n, portable=True, arrow=True
            ).collect()
        }
        assert expr == twin, f"n={n}"


def test_slot_agreement_matches_the_aggregate_fold(spark):
    """Round-15: `_slot_agreement` (size∘filter∘zip_with — 1.4-1.9x the
    fold at gate scale) must count agreeing slots exactly like the
    aggregate fold it replaced for every signature this engine produces
    (fixed k-length, all-or-nothing nulls). The one divergence — an
    ALL-NULL signature scores NULL under the fold, 0 here — is pinned
    too: both fail every catalog threshold (the only τ=0 consumer,
    minhash_calibration, excludes the zero-token docs that could in
    principle produce such signatures — and even those fold to the [""]
    shingle, i.e. valid integer slots, never null)."""
    from sportstv_streaming_data_warehouse_spark.operators.dedup import (
        _slot_agreement,
    )

    k = 8
    rows = [
        (1, [1, 2, 3, 4, 5, 6, 7, 8], [1, 2, 3, 4, 5, 6, 7, 8]),   # all agree
        (2, [1, 2, 3, 4, 5, 6, 7, 8], [1, 2, 0, 4, 0, 6, 0, 8]),   # 5 agree
        (3, [0, 0, 0, 0, 0, 0, 0, 0], [1, 2, 3, 4, 5, 6, 7, 8]),   # none
        (4, [None] * k, [1, 2, 3, 4, 5, 6, 7, 8]),                  # all-null side
        (5, [None] * k, [None] * k),                                # both all-null
    ]
    df = spark.createDataFrame(
        rows, "id long, a array<bigint>, b array<bigint>"
    )
    fold = F.aggregate(
        F.zip_with("a", "b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    got = {
        r["id"]: (r["new"], r["old"])
        for r in df.select(
            "id",
            _slot_agreement(F.col("a"), F.col("b"), k).alias("new"),
            fold.alias("old"),
        ).collect()
    }
    assert got[1] == (8, 8) and got[2] == (5, 5) and got[3] == (0, 0)
    # the documented all-null divergence: 0 vs NULL — both fail any tau>0
    assert got[4] == (0, None) and got[5] == (0, None)
    # and the verdict equivalence both sides of the threshold filter
    for new, old in got.values():
        assert (new / k >= 0.5) == bool(old is not None and old / k >= 0.5)
