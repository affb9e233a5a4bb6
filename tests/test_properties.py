"""Property-based and exhaustive-sweep tests for the load-bearing
semantics: calendar conventions vs Python's datetime, inference
precedence vs a reference implementation, Jaccard vs Python sets."""

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.functions.calendar import date_spine
from sportstv_streaming_data_warehouse_spark.functions.inference import (
    infer_with_precedence,
)
from sportstv_streaming_data_warehouse_spark.operators.dedup import (
    token_jaccard_pairs,
)


def test_calendar_keys_exhaustive_sweep(spark):
    """Every day over an 11-year span (incl. leap years and ISO-week-53
    boundaries) must match Python's calendar exactly (SURVEY §1.4)."""
    start, end = dt.date(1995, 1, 1), dt.date(2005, 12, 31)
    rows = date_spine(spark, start, end).collect()
    assert len(rows) == (end - start).days + 1
    for r in rows:
        d = r["full_date"]
        assert r["date_id"] == int(d.strftime("%Y%m%d"))
        assert r["year"] == d.year
        assert r["quarter"] == (d.month - 1) // 3 + 1
        assert r["month"] == d.month
        assert r["day_of_month"] == d.day
        # ISO-8601 week, paired with CALENDAR year (the reference's
        # deliberate subtlety — week 53 can appear in January)
        assert r["week"] == d.isocalendar()[1], d
        # R %w + 1 convention: Sunday=1 .. Saturday=7
        assert r["day_of_week"] == (d.weekday() + 1) % 7 + 1, d


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            ["DEL-1", "ICE-2", "ICEHL-3", "IHL-4", "SKJ-5", "FIS-6",
             "OXXX-7", "MSL-8", "NLN-9", "SLXXX-10", "random"]
        ),
        min_size=1,
        max_size=30,
    )
)
def test_inference_precedence_matches_reference_impl(spark, values):
    """infer_with_precedence == the R masks' last-write-wins loop."""
    import re

    rules = [
        (r"^(DEL|AHL|AIH|IHB|SIH|NLN|NLA|ICE|NXXX|SLXXX)-", "Ice Hockey"),
        (r"^(IHL|ICEHL)-", "Inline Hockey"),
        (r"^(SKJ|SKA|FIS)-", "Ski Jumping"),
    ]

    def reference(v):  # etl.R:272-285: later assignments overwrite
        out = None
        for pat, label in rules:
            if re.search(pat, v):
                out = label
        return out

    df = spark.createDataFrame([(v,) for v in values], ["v"])
    got = [
        r["lab"]
        for r in df.select(
            infer_with_precedence(F.col("v"), rules).alias("lab")
        ).collect()
    ]
    assert got == [reference(v) for v in values]


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from("abcdefgh"), min_size=1, max_size=8
        ).map(lambda toks: " ".join(toks)),
        min_size=2,
        max_size=8,
    )
)
def test_token_jaccard_matches_python_sets(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in token_jaccard_pairs(docs, "doc_id", "text", threshold=0.0).collect()
    }
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            a, b = set(texts[i].split()), set(texts[j].split())
            inter = len(a & b)
            if inter == 0:
                assert (i, j) not in got  # inverted index never pairs them
            else:
                expected = inter / len(a | b)
                assert abs(got[(i, j)] - expected) < 1e-12


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(
        st.tuples(st.integers(0, 30), st.integers(1, 50)),
        min_size=0, max_size=120,
    ),
    k=st.integers(2, 12),
)
def test_distributed_ranking_properties(spark, vals, k):
    """NTILE closed form + prefix sum vs the single-partition window, on
    arbitrary duplicate-heavy data (hypothesis drives sizes, tie
    patterns, and tile counts — incl. n < k and empty input)."""
    from pyspark.sql import Window

    from sportstv_streaming_data_warehouse_spark.operators.ranking import (
        distributed_ntile,
        with_running_total,
    )

    df = spark.createDataFrame(
        [(i, float(s), v) for i, (s, v) in enumerate(vals)],
        "id long, score double, v long",
    )
    got_t = {
        r["id"]: r["tile"]
        for r in distributed_ntile(df, k, ["score", "id"]).collect()
    }
    got_rt = {
        r["id"]: r["rt"]
        for r in with_running_total(df, ["score", "id"], "v", out_col="rt").collect()
    }
    w = Window.orderBy("score", "id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {
        r["id"]: (r["t"], r["rt"])
        for r in df.withColumn("t", F.ntile(k).over(w))
        .withColumn("rt", F.sum("v").over(run))
        .collect()
    }
    assert got_t == {i: t for i, (t, _) in want.items()}
    assert got_rt == {i: rt for i, (_, rt) in want.items()}


@settings(max_examples=8, deadline=None)
@given(
    lefts=st.lists(st.integers(0, 1000), min_size=1, max_size=40),
    rights=st.lists(
        st.tuples(st.integers(0, 1000), st.one_of(st.none(), st.integers(0, 99))),
        min_size=0, max_size=40,
        unique_by=lambda t: t[0],  # equal right ts would make the
        # tie winner unspecified in BOTH the operator and this reference
    ),
)
def test_asof_join_matches_reference_scan(spark, lefts, rights):
    """As-of join vs a brute-force Python reference: for every left ts,
    the latest right row at-or-before it — whole row, NULLs included."""
    import datetime as _dt

    from sportstv_streaming_data_warehouse_spark.operators.asof import asof_join

    base = _dt.datetime(2024, 1, 1)
    ldf = spark.createDataFrame(
        [(i, base + _dt.timedelta(seconds=s)) for i, s in enumerate(lefts)],
        "id long, ts timestamp",
    ).withColumn("k", F.lit(1))
    rdf = spark.createDataFrame(
        [(base + _dt.timedelta(seconds=s), v) for s, v in rights],
        "ts timestamp, val long",
    ).withColumn("k", F.lit(1))

    got = {
        r["id"]: (r["asof_ts"], r["asof_val"])
        for r in asof_join(
            ldf, rdf, on="k", left_ts="ts", right_ts="ts", value_cols=["val"]
        ).collect()
    }
    rs = sorted(
        ((base + _dt.timedelta(seconds=s), v) for s, v in rights),
        key=lambda t: t[0],
    )
    for i, s in enumerate(lefts):
        lt = base + _dt.timedelta(seconds=s)
        match = None
        for ts, v in rs:
            if ts <= lt:
                match = (ts, v)
        assert got[i] == (match if match else (None, None)), (i, s)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.text(alphabet="ab c", min_size=0, max_size=40), min_size=1, max_size=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
)
def test_chunking_covers_and_reconstructs(spark, texts, chunk_size, stride):
    """Every chunk is the exact substring at its offset, chunk starts
    walk 0, stride, 2·stride, ... across the whole document (full
    coverage when stride <= chunk_size), and empty docs yield nothing."""
    from sportstv_streaming_data_warehouse_spark.functions.text import chunk_documents

    if stride > chunk_size:
        stride = chunk_size
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = chunk_documents(df, "doc_id", "text", chunk_size, stride).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, t in enumerate(texts):
        chunks = sorted(by_doc.get(i, []), key=lambda r: r["chunk_id"])
        if not t:
            assert chunks == []
            continue
        import math

        assert len(chunks) == math.floor((len(t) - 1) / stride) + 1
        for c in chunks:
            assert c["chunk_start"] == c["chunk_id"] * stride
            expect = t[c["chunk_start"]: c["chunk_start"] + chunk_size]
            assert c["chunk_text"] == expect
            assert c["chunk_len"] == len(expect)
        # concatenating each chunk's non-overlapping prefix rebuilds the doc
        rebuilt = "".join(c["chunk_text"][:stride] for c in chunks)
        assert rebuilt == t


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=10,
    )
)
def test_quantize_bounds_and_sign(spark, vecs):
    """Quantized values stay in [-128, 127] and equal floor(v · 127/max|v|)
    exactly. The max-|v| dimension lands on 126 or 127 — not always 127,
    because fl(127/v)·v can round just below 127; that one-step downward
    bias is the price of the floor quantizer's engine-portable
    determinism (round's half-tie conventions differ across engines)."""
    import math

    df = spark.createDataFrame(
        [(i, v, 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )
    # drive the same expressions the catalog query uses, on local data
    from pyspark.sql import functions as F2

    e = df.withColumn(
        "maxabs", F2.array_max(F2.transform("embedding", lambda x: F2.abs(x)))
    )
    out = e.select("vec_id", "maxabs", F2.posexplode("embedding").alias("dim", "val"))
    scale = F2.lit(127.0) / F2.col("maxabs").cast("double")
    q = F2.when(
        F2.col("maxabs") > 0, F2.floor(F2.col("val").cast("double") * scale)
    ).otherwise(F2.lit(0).cast("long"))
    rows = out.select("vec_id", "dim", q.alias("q"), "val", "maxabs").collect()
    for r in rows:
        assert -128 <= r["q"] <= 127
        if r["maxabs"] > 0:
            expected = math.floor(
                float(r["val"]) * (127.0 / float(r["maxabs"]))
            )
            assert r["q"] == expected
            if float(r["val"]) == float(r["maxabs"]):
                assert r["q"] in (126, 127)
        else:
            assert r["q"] == 0


# ---------------------------------------------------------------------------
# Round-5 operators: randomized cross-checks against pure-Python models
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None)
@given(
    st.dictionaries(
        st.integers(min_value=1, max_value=5),                # user_id
        st.sets(st.integers(min_value=0, max_value=40),       # active day #s
                min_size=1, max_size=25),
        min_size=1,
        max_size=5,
    )
)
def test_streaks_match_python_model(spark, activity):
    """gaps-and-islands streaks == a brute-force python scan."""
    from pyspark.sql import Window

    base = dt.date(2024, 1, 1)
    rows = [
        (u, base + dt.timedelta(days=d)) for u, days in activity.items()
        for d in days
    ]
    du = spark.createDataFrame(rows, ["user_id", "d"]).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    runs = du.withColumn(
        "grp", F.unix_date(F.col("d")) - F.row_number().over(w)
    )
    got = {
        r["user_id"]: (r["n_streaks"], r["longest"], r["active"])
        for r in runs.groupBy("user_id", "grp")
        .agg(F.count("*").alias("len"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_streaks"),
            F.max("len").alias("longest"),
            F.sum("len").alias("active"),
        )
        .collect()
    }
    for u, days in activity.items():
        ds = sorted(days)
        streaks, cur = [], 1
        for a, b in zip(ds, ds[1:]):
            if b == a + 1:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        assert got[u] == (len(streaks), max(streaks), len(ds)), (u, ds)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),   # order
            st.integers(min_value=1, max_value=8),   # part
        ),
        min_size=1,
        max_size=40,
    )
)
def test_copurchase_pairs_match_python_model(spark, lines):
    """distinct-pair self-join == itertools.combinations per order."""
    import itertools
    from collections import Counter

    op = spark.createDataFrame(lines, ["l_orderkey", "l_partkey"]).distinct()
    a, b = op.alias("a"), op.alias("b")
    got = {
        (r["pa"], r["pb"]): r["n"]
        for r in a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    model = Counter()
    per_order = {}
    for o, p in set(lines):
        per_order.setdefault(o, set()).add(p)
    for parts in per_order.values():
        for x, y in itertools.combinations(sorted(parts), 2):
            model[(x, y)] += 1
    assert got == dict(model)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.floats(min_value=0.01, max_value=1e6,
                       allow_nan=False, allow_infinity=False),
             min_size=20, max_size=120),
)
def test_winsorize_cutoff_matches_sorted_rank(spark, values):
    """grouped_top_fraction's top-1% min == the ceil(n/100)-th largest
    value from a plain python sort (the winsorization cutoff)."""
    from sportstv_streaming_data_warehouse_spark.operators.ranking import (
        grouped_top_fraction,
    )

    rows = [("g", float(v), i) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, ["flag", "price", "rid"])
    top = grouped_top_fraction(df, "flag", "price", "rid", keep_permille=10)
    got = top.agg(F.min("price")).collect()[0][0]
    k = (len(values) * 10 + 999) // 1000
    expected = sorted(values, reverse=True)[k - 1]
    assert got == expected


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=2,
        max_size=12,
        unique=True,
    )
)
def test_hamming_pairs_match_python_popcount(spark, hashes):
    """The pigeonhole chunk join finds EXACTLY the pairs a brute-force
    python popcount finds at hamming <= 3 (soundness AND completeness
    of the 4-chunk equi-join on random 64-bit signatures)."""
    from itertools import combinations

    from sportstv_streaming_data_warehouse_spark.operators.dedup import (
        hamming_pairs,
    )

    sig = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hashes)], ["id", "h"]
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_pairs(sig, "id", "h", max_hamming=3).collect()
    }
    model = {}
    for (i, a), (j, b) in combinations(enumerate(hashes), 2):
        d = bin((a ^ b) & ((1 << 64) - 1)).count("1")
        if d <= 3:
            model[(i, j)] = d
    assert got == model


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=999_999),  # u-hash slot
            st.integers(min_value=1, max_value=10_000),   # weight
        ),
        min_size=2,
        max_size=20,
    )
)
def test_efraimidis_spirakis_key_order_matches_python(spark, rows):
    """ln(u)/w ordering == python's math.log on the identical micro-nat
    integers: the weighted-sample ranking can never disagree with the
    reference formula."""
    import math

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, fp, w) for i, (fp, w) in enumerate(rows)], ["i", "fp", "w"]
    )
    lnu_micro = F.round(
        F.log((F.col("fp") % 1000000 + 0.5) / 1000000.0) * 1000000.0, 0
    ).cast("long")
    got = [
        r["i"]
        for r in df.select(
            "i", (lnu_micro.cast("double") / F.col("w")).alias("k")
        )
        .orderBy(F.desc("k"), F.asc("i"))
        .collect()
    ]
    def key(t):
        i, (fp, w) = t
        lnu = round(math.log((fp % 1000000 + 0.5) / 1000000.0) * 1000000.0)
        return (-(lnu / w), i)

    model = [i for i, _ in sorted(enumerate(rows), key=key)]
    assert got == model


@settings(max_examples=20, deadline=None)
@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=2**62), min_size=1, max_size=80,
        unique=True,
    ),
    frac=st.sampled_from([0.1, 0.25, 0.5, 0.9, 1.0]),
)
def test_deterministic_sample_properties(spark, ids, frac):
    """deterministic_id_sample (round-10): membership is a pure
    function of (id, fraction) — idempotent, monotone in fraction,
    order/partitioning-independent, and a subset of the input —
    for arbitrary non-negative 64-bit ids (hypothesis drives the id
    space, including > 2^32 where the naive hash overflowed)."""
    from sportstv_streaming_data_warehouse_spark.operators.dedup import (
        deterministic_id_sample,
    )

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r["doc_id"] for r in deterministic_id_sample(df, "doc_id", frac).collect()}
    # pure function: a re-run and a reshuffled input give the same set
    again = {
        r["doc_id"]
        for r in deterministic_id_sample(
            df.repartition(7), "doc_id", frac
        ).collect()
    }
    assert got == again
    assert got <= set(ids)
    if frac == 1.0:
        assert got == set(ids)
    # monotone: a larger fraction never drops a sampled id
    bigger = {
        r["doc_id"]
        for r in deterministic_id_sample(
            df, "doc_id", min(1.0, frac + 0.1)
        ).collect()
    }
    assert got <= bigger
