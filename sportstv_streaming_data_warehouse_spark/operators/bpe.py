"""BPE vocabulary induction — byte-pair-encoding merge learning.

The tokenizer-training step of an LLM data pipeline: learn the merge
table that turns characters into subword units. The classic
formulation (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units" — public algorithm) learns on the WORD
FREQUENCY TABLE, not the raw corpus: one corpus scan aggregates
(word, freq), and every merge iteration then runs over the compact
distinct-word table (vocabulary-sized — tens of millions of rows at
100 TB corpus scale, a ~10⁴-fold compression of the iteration input).
That separation is exactly the Spark-friendly shape:

- corpus scan → (word, freq): one explode + hash aggregate, the only
  pass that touches the 100 TB;
- pair statistics: per-word adjacent symbol pairs exploded and
  freq-weighted — a map-side transform + one aggregate per round;
- merge application: a LEFT FOLD over each word's symbol array
  (leftmost-greedy, the standard BPE application order) — pure
  map-side expression, no shuffle;
- argmax merge choice: a deterministic one-row reduction
  (max freq, ties broken lexicographically), the only driver traffic
  per round (one pair), same superstep posture as
  operators/clustering.kmeans_lloyd_step and operators/graph.pagerank.

``pair_counts``/``top_pairs`` are the single-round statistics (full
SQL oracle shape — a round-12 catalog registration candidate);
``bpe_learn`` is the iterative driver loop, pinned against a pure-
Python reference implementation in tests/test_bpe.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: word boundary for the corpus scan — the same \s+ split every
#: tokenizing operator in the engine uses (functions/text.tokens)
_WORD_RE = r"\s+"


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over whitespace tokens — the one pass that reads
    the corpus; every merge round after this runs on the distinct-word
    table. Lowercased (BPE vocabularies are usually case-folded here;
    the reference impl in tests mirrors it)."""
    return (
        df.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), _WORD_RE),
                    lambda t: t != "",
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def _initial_symbols(word: Column) -> Column:
    """A word's initial symbol sequence: its characters."""
    return F.filter(F.split(word, ""), lambda c: c != "")


def _apply_merge(sym: Column, left: str, right: str) -> Column:
    """One merge as a leftmost-greedy left fold over the symbol array —
    the standard BPE application semantics (a merge consumes its left
    partner, so 'aaa' under (a,a) becomes [aa, a], and the merged
    symbol does not re-pair within the same merge's pass). F.get (not
    element_at) on the last accumulator slot: NULL on the empty
    accumulator instead of an ANSI out-of-bounds throw."""
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.get(acc, F.size(acc) - 1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(left + right)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def with_symbols(words: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """(word, freq, symbols array<string>) after applying ``merges`` in
    order to the initial character sequence."""
    sym = _initial_symbols(F.col("word"))
    for left, right in merges:
        sym = _apply_merge(sym, left, right)
    return words.select("word", "freq", sym.alias("symbols"))


def pair_counts(symbolized: DataFrame) -> DataFrame:
    """Freq-weighted adjacent-pair statistics over (word, freq,
    symbols): one transform + explode + hash aggregate. Returns
    (left, right, freq)."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("symbols") - 1),
        lambda i: F.struct(
            F.element_at("symbols", i).alias("left"),
            F.element_at("symbols", i + 1).alias("right"),
        ),
    )
    return (
        symbolized.filter(F.size("symbols") >= 2)
        .select(F.col("freq"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("freq").cast("long").alias("freq"))
    )


def top_pairs(
    df: DataFrame, text_col: str, k: int = 20, merges: list[tuple[str, str]] | None = None
) -> DataFrame:
    """The k most frequent adjacent symbol pairs (the next-merge
    candidates), deterministically ordered: freq desc, then (left,
    right) asc — TakeOrderedAndProject, never a global sort."""
    stats = pair_counts(with_symbols(word_frequencies(df, text_col), merges or []))
    return stats.orderBy(
        F.desc("freq"), F.asc("left"), F.asc("right")
    ).limit(k)


def bpe_learn(
    df: DataFrame, text_col: str, n_merges: int
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges: per round, aggregate pair stats
    over the symbolized word table and take the deterministic argmax
    (max freq, ties lexicographic on (left, right)). Driver traffic is
    ONE row per round. Returns [(left, right, freq), ...] in merge
    order. Stops early when no adjacent pair remains.

    Merges apply INCREMENTALLY: round k folds only merge k into the
    persisted round-(k-1) symbol table, so the per-round plan is
    constant-shape (a from-scratch with_symbols replay would stack k
    folds by round k — O(n²) expression cost and an eventual codegen
    method-size wall)."""
    cur = word_frequencies(df, text_col).select(
        "word", "freq", _initial_symbols(F.col("word")).alias("symbols")
    ).persist()
    try:
        learned: list[tuple[str, str, int]] = []
        for _ in range(n_merges):
            best = (
                pair_counts(cur)
                .orderBy(F.desc("freq"), F.asc("left"), F.asc("right"))
                .limit(1)
                .collect()
            )
            if not best:
                break
            row = best[0]
            learned.append((row["left"], row["right"], row["freq"]))
            if len(learned) == n_merges:
                break  # the post-final-merge symbol table is never read
            nxt = cur.select(
                "word",
                "freq",
                _apply_merge(
                    F.col("symbols"), row["left"], row["right"]
                ).alias("symbols"),
            ).persist()
            nxt.count()  # materialize before releasing the parent cache
            cur.unpersist()
            cur = nxt
        return learned
    finally:
        cur.unpersist()
