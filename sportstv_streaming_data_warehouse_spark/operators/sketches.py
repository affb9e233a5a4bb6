"""Mergeable-summary operators: Misra-Gries heavy hitters.

The scale problem these solve: a plain ``explode -> groupBy(token)``
frequency count shuffles EVERY distinct key — at 100 TB of text the
n-gram vocabulary is billions of keys and the shuffle (not the scan) is
the bottleneck. A Misra-Gries summary bounds per-partition state to
``k`` counters and only the union of per-partition candidate keys (at
most ``k x partitions`` rows, independent of vocabulary size) crosses
the wire; a second exact pass recounts just those candidates.

Guarantee (pigeonhole): any item with global count > N/k has
count > N_p/k in at least one partition p, and a Misra-Gries summary
with k counters retains every item whose partition-local count exceeds
N_p/k. The union of partition summaries is therefore a SUPERSET of the
true global heavy hitters, and the exact recount pass makes the final
answer EXACT — this is the classic two-round distributed heavy-hitters
algorithm (Misra & Gries 1982; Agarwal et al., "Mergeable Summaries",
PODS 2012).

Reference anchor: the reference has no sketch tier (its frequency
queries are full MySQL GROUP BYs over a few-K-row fact,
report.Rmd:355-375); this operator is the 100 TB re-expression of the
same "most frequent values" question.

The MG pass is an Arrow-batched ``mapInPandas`` (the one place Python
is justified: memory-bounded per-partition state that Catalyst cannot
express); the recount pass is a broadcast semi-join + hash aggregate,
fully JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def make_merge_compress(k: int):
    """Factory for the mergeable-summaries MERGE + COMPRESS step at
    ``k`` counters (Agarwal et al., PODS 2012): add exact batch counts
    into the summary, then — if it exceeds ``k`` entries — subtract the
    (k+1)-th largest count and drop non-positives. Error stays
    <= N/(k+1), so every item with count > N/k survives.

    Returned as a NESTED closure (not a module-level function) so
    cloudpickle serializes it BY VALUE into mapInPandas /
    applyInPandasWithState closures — executors never need to import
    this package (the self-containment property the /tmp verify probe
    checks). One implementation shared by the batch MG pass and the
    streaming twin (streaming/heavy_hitters.py) so the two summaries
    cannot drift apart.
    """

    def merge_compress(counters: dict, batch_counts) -> dict:
        import heapq

        for v, w in batch_counts:
            counters[v] = counters.get(v, 0) + int(w)
        if len(counters) > k:
            thresh = heapq.nlargest(k + 1, counters.values())[-1]
            counters = {
                key: c - thresh for key, c in counters.items() if c > thresh
            }
        return counters

    return merge_compress


def mg_summaries(
    items: DataFrame, col: str, k: int, key_type: str = "string"
) -> DataFrame:
    """Per-partition Misra-Gries summaries with exact partition totals.

    One output row per surviving counter — (``col``, ``__part_n`` NULL)
    — plus exactly one SENTINEL row per partition (``col`` NULL,
    ``__part_n`` = the partition's exact non-null item count), so the
    caller can reconstruct N without another pass over the input. State
    is bounded at ``k`` counters per partition (plus one Arrow batch's
    distinct keys transiently) regardless of vocabulary size.

    Vectorized: exact per-batch counts via pandas value_counts (C
    speed), merged through ``make_merge_compress`` — a per-token Python
    loop measured identical wall here (the mapInPandas stage overhead
    dominates), but the vectorized form keeps per-row Python work out
    of the 100 TB path.
    """
    out_schema = f"{col} {key_type}, __part_n long"
    mc = make_merge_compress(k)

    def summarize(batches):
        import pandas as pd

        counters: dict = {}
        n = 0
        for pdf in batches:
            vc = pdf[col].value_counts(dropna=True)
            n += int(vc.sum())
            counters = mc(counters, vc.items())
        keys = list(counters.keys())
        yield pd.DataFrame(
            {
                # object dtype: holds str or int keys plus the sentinel
                # None; Arrow infers the declared schema type
                col: pd.Series(keys + [None], dtype="object"),
                "__part_n": pd.array([None] * len(keys) + [n], dtype="Int64"),
            }
        )

    return items.select(col).mapInPandas(summarize, schema=out_schema)


def mg_candidates(
    items: DataFrame, col: str, k: int, key_type: str = "string"
) -> DataFrame:
    """Deduplicated union of the per-partition MG candidate keys — a
    superset of all items with global frequency > N/k (see module
    docstring for the pigeonhole argument)."""
    return (
        mg_summaries(items, col, k, key_type)
        .filter(F.col(col).isNotNull())
        .select(col)
        .distinct()
    )


def exact_heavy_hitters(items: DataFrame, col: str, k: int) -> DataFrame:
    """Items with global frequency strictly greater than N/k, with exact
    counts — two passes over the input, no full-vocabulary shuffle.

    Pass 1 (``mg_summaries``): narrow scan, bounded state; candidate
    keys AND per-partition totals come back in one summary (persisted —
    it is k x partitions rows — so the candidate and total branches do
    not re-run the pass). Pass 2: broadcast the candidate set as a
    semi-join filter, hash-aggregate exact counts for candidates only,
    then apply the exact N/k threshold using the summary's total.

    Output: ``col``, ``n_occurrences`` (exact), ``total_items``
    (non-null items), ``share`` — only true heavy hitters survive
    (false candidates are filtered by the exact threshold).
    """
    # The MG pass runs over 64-bit xxhash64 keys, not the raw strings:
    # the Arrow transfer (8 bytes/item vs the raw text) shrinks, and
    # value_counts over int64 is faster still. A hash collision merges
    # two items' counts, which can only ADD a candidate (counts only
    # grow — no true heavy hitter can be lost), and the exact recount
    # filters any collision-borne false positive by its true count.
    from .ranking import _retain

    items = items.filter(F.col(col).isNotNull())
    hashed = items.select(F.xxhash64(col).alias("__h"))
    # persist the tiny summary (k x partitions rows, LRU-1 like the
    # ranking caches) so the candidate and total branches don't re-run
    # the MG pass
    summ = mg_summaries(hashed, "__h", k, key_type="long").persist()
    _retain(summ)
    cand = summ.filter(F.col("__h").isNotNull()).select("__h").distinct()
    total = summ.filter(F.col("__h").isNull()).agg(
        F.sum("__part_n").alias("total_items")
    )
    counts = (
        items.select(col, F.xxhash64(col).alias("__h"))
        .join(F.broadcast(cand), "__h", "left_semi")
        .groupBy(col)
        .agg(F.count("*").alias("n_occurrences"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("n_occurrences") > F.col("total_items") / float(k))
        .select(
            col,
            "n_occurrences",
            "total_items",
            (F.col("n_occurrences") / F.col("total_items")).alias("share"),
        )
    )


# ---------------------------------------------------------------------------
# Log-bucket quantile sketch (DDSketch-family, integer-exact).
# ---------------------------------------------------------------------------

QSKETCH_SUBBUCKETS = 16  # per power-of-two octave => relative error <= 1/32


def qsketch_bucket(milli: Column) -> Column:
    """Bucket id of a POSITIVE integer milli-unit value in the
    log-bucket quantile sketch: 16 sub-buckets per power-of-two octave,
    so every value in a bucket is within 1/32 relative error of the
    bucket midpoint.

    All arithmetic is integer-exact and engine-portable over the FULL
    long domain: ``floor(log2(m))`` is ``length(bin(m)) - 1`` (no
    floating log at a power-of-two boundary), and the sub-bucket index
    ``floor(m*16 / 2^e)`` is computed as ``shiftright(m, e-4)`` for
    ``e >= 4`` (identical because 16 divides 2^e) and
    ``shiftright(m*16, e)`` for ``e < 4`` (where ``m <= 15``) —
    never a long multiply that wraps past 2^59 nor a double division
    that rounds past 2^53 (round-6 advisor finding; DECIMAL(18,3)
    milli-values legitimately reach ~1e18). The DuckDB oracle replays
    the same split via exact BIGINT ``//`` by a power of two.
    Non-positive values map to bucket -1 (a dedicated underflow cell,
    like DDSketch's zero bucket).

    Mergeability is the point: per-partition / per-day sketches are
    plain (bucket, count) rows, merged by ADDING counts — the property
    that makes the sketch a re-aggregatable tier (day -> week -> month)
    exactly like the HLL rollup, but for quantiles. (DDSketch: Masson,
    Rim & Lee, VLDB 2019 — "DDSketch: a fast and fully-mergeable
    quantile sketch with relative-error guarantees".)
    """
    e = (F.length(F.bin(milli)) - 1).cast("long")
    sub16 = F.when(
        e >= 4, F.call_function("shiftright", milli, (e - 4).cast("int"))
    ).otherwise(
        F.call_function("shiftright", milli * 16, e.cast("int"))
    ).cast("long")
    sub = sub16 - 16
    return F.when(milli <= 0, F.lit(-1)).otherwise(e * 16 + sub)


def qsketch_bucket_estimate(bucket: Column) -> Column:
    """Midpoint milli-unit estimate of a sketch bucket: for bucket
    ``b = e*16 + sub`` the bucket covers ``[2^e*(16+sub)/16,
    2^e*(17+sub)/16)`` and the midpoint is ``floor(2^e*(33+2*sub)/32)``.
    Computed exactly over the full bucket range as
    ``(33+2*sub) * 2^(e-5)`` for ``e >= 5`` (max value 63*2^57 < 2^63,
    no wrap even for the top octave e=62 — the round-6 advisor's
    overflow case) and ``((33+2*sub) * 2^e) // 32`` for ``e < 5``
    (tiny). The powers of two come via pow(2.0, k) cast to long, exact
    for every k <= 62. Bucket -1 (underflow) estimates 0."""
    e = F.floor(bucket / 16).cast("long")
    sub = (bucket % 16).cast("long")
    odd = 33 + 2 * sub
    p2_hi = F.pow(F.lit(2.0), (e - 5).cast("double")).cast("long")
    p2_lo = F.pow(F.lit(2.0), e.cast("double")).cast("long")
    est = F.when(e >= 5, odd * p2_hi).otherwise(
        F.floor(odd * p2_lo / 32).cast("long")
    )
    return F.when(bucket < 0, F.lit(0).cast("long")).otherwise(est)
