"""BPE vocabulary induction (operators/bpe.py).

Greedy-leftmost merge semantics, hand-computable pair statistics, a
pure-Python reference implementation of the full learning loop (same
argmax tie-break), early stopping, and a DuckDB SQL replay of the
single-round pair statistics — the r12 catalog-oracle candidate.
"""

import collections
import re

import duckdb
import pytest
from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.operators.bpe import (
    bpe_learn,
    pair_counts,
    top_pairs,
    with_symbols,
    word_frequencies,
)

SF001 = "/root/testdata/sf0.001"


def ref_learn(freqs: dict[str, int], n_merges: int):
    """Sennrich-style reference: pair stats over the word-frequency
    table, argmax with freq-desc / (left, right)-asc tie-break,
    leftmost-greedy application."""
    syms = {w: list(w) for w in freqs}

    def apply(s, a, b):
        out = []
        for x in s:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        return out

    learned = []
    for _ in range(n_merges):
        counts: collections.Counter = collections.Counter()
        for w, f in freqs.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += f
        if not counts:
            break
        (a, b), f = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        learned.append((a, b, f))
        syms = {w: apply(s, a, b) for w, s in syms.items()}
    return learned


def py_word_freqs(texts):
    c: collections.Counter = collections.Counter()
    for t in texts:
        for w in re.split(r"\s+", t.lower()):
            if w:
                c[w] += 1
    return dict(c)


def test_greedy_leftmost_application(spark):
    words = spark.createDataFrame(
        [("aaa", 1), ("abab", 1), ("aab", 1)], "word string, freq long"
    )
    one = {
        r["word"]: r["symbols"]
        for r in with_symbols(words, [("a", "a")]).collect()
    }
    # the merge consumes its left partner; no re-pairing within a pass
    assert one["aaa"] == ["aa", "a"]
    assert one["abab"] == ["a", "b", "a", "b"]
    two = {
        r["word"]: r["symbols"]
        for r in with_symbols(words, [("a", "a"), ("aa", "b")]).collect()
    }
    assert two["aab"] == ["aab"]
    assert two["abab"] == ["a", "b", "a", "b"]


def test_pair_counts_hand_check(spark):
    docs = spark.createDataFrame(
        [("low low low",), ("lower",)], "text string"
    )
    sym = with_symbols(word_frequencies(docs, "text"), [])
    got = {
        (r["left"], r["right"]): r["freq"] for r in pair_counts(sym).collect()
    }
    # 'low' x3 and 'lower' x1: (l,o)=4, (o,w)=4, (w,e)=1, (e,r)=1
    assert got == {("l", "o"): 4, ("o", "w"): 4, ("w", "e"): 1, ("e", "r"): 1}


def test_learn_matches_the_reference_implementation_on_a_planted_corpus(spark):
    texts = [
        "low low low low low lower lower",
        "newest newest newest newest newest newest",
        "widest widest widest",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    got = bpe_learn(docs, "text", 8)
    want = ref_learn(py_word_freqs(texts), 8)
    assert got == want


def test_learn_matches_the_reference_on_the_real_fixture(spark):
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    got = bpe_learn(docs, "text", 6)
    texts = [r["text"] for r in docs.select("text").collect()]
    want = ref_learn(py_word_freqs(texts), 6)
    assert got == want
    assert len(got) == 6


def test_learn_stops_when_no_pairs_remain(spark):
    docs = spark.createDataFrame([("a b c a",)], "text string")
    assert bpe_learn(docs, "text", 5) == []


def test_top_pairs_is_take_ordered_not_global_sort(spark):
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    df = top_pairs(docs, "text", k=20)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_top_pairs_replays_in_duckdb(spark):
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    got = [
        (r["left"], r["right"], r["freq"])
        for r in top_pairs(docs, "text", k=20).collect()
    ]
    want = [
        tuple(r)
        for r in duckdb.sql(
            f"""
        WITH w AS (
          SELECT lower(u.word) AS word, COUNT(*) AS freq
          FROM read_parquet('{SF001}/documents.parquet'),
               UNNEST(list_filter(regexp_split_to_array(text, '\\s+'),
                                  t -> t != '')) AS u(word)
          GROUP BY 1
        ),
        s AS (SELECT word, freq, string_split(word, '') AS chars FROM w),
        p AS (
          SELECT chars[g.i] AS lhs, chars[g.i + 1] AS rhs, freq
          FROM s, (SELECT CAST(generate_series AS INT) AS i
                   FROM generate_series(1, 1000)) g
          WHERE g.i <= len(chars) - 1
        )
        SELECT lhs AS "left", rhs AS "right",
               CAST(SUM(freq) AS BIGINT) AS freq
        FROM p GROUP BY 1, 2
        ORDER BY freq DESC, "left" ASC, "right" ASC
        LIMIT 20
        """
        ).fetchall()
    ]
    assert got == want


from hypothesis import given, settings, strategies as st

_word = st.text(alphabet="abcde", min_size=1, max_size=6)


@settings(max_examples=6, deadline=None)
@given(st.lists(st.lists(_word, min_size=1, max_size=12), min_size=1, max_size=6))
def test_property_learn_matches_reference_on_random_corpora(spark, docs):
    """The full learning loop equals the Sennrich reference (same
    argmax tie-break, same greedy application) on fuzzed corpora —
    small alphabet so merges chain several levels deep."""
    texts = [" ".join(words) for words in docs]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    assert bpe_learn(df, "text", 4) == ref_learn(py_word_freqs(texts), 4)
