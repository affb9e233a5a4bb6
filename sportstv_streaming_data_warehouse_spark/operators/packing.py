"""Context-window sequence packing — the training-dataloader layout step.

GPT-style pre-training consumes fixed-length token sequences: documents
are concatenated in a deterministic order and the token stream is CUT at
exact multiples of the context budget, so documents straddle sequence
boundaries and are split (this is the standard "pack then chunk" layout;
contrast catalog ``x_pack_shards``, which places WHOLE documents into
~budget-sized shards and never splits one). The operator here emits the
exact doc→sequence span mapping a dataloader needs — for each document,
which sequences it feeds and at which offsets — plus the per-sequence
manifest (docs, tokens, splits, fill ratio).

Algebra: with global exclusive token prefix-sum ``s`` and end ``e = s +
n_tokens`` for a document, the document feeds exactly the sequences
``floor(s/B) .. floor((e-1)/B)``, and its span inside sequence ``q`` is
the overlap of ``[s, e)`` with ``[qB, (q+1)B)`` — pure integer math on
the prefix sum. So the whole operator is: one EXACT distributed prefix
sum (operators/ranking.with_running_total — two-phase range-bucket, no
single-partition window), one ``sequence()`` explode (output rows =
input rows + one extra row per boundary straddle, a bounded blow-up of
at most ``n_tokens/B`` per document), and one hash aggregate for the
manifest. Every step is a built-in JVM expression; nothing collects.

At 100 TB this is the layout pass that turns a cleaned corpus into
trainer-ready sequences: the prefix sum is the only coordination point,
and it moves per-bucket COUNTS (a few hundred scalars) to the driver,
never rows.

Reference scope note: the reference warehouse (src/etl.R, report.Rmd)
has no training-data layout stage; this extends the SURVEY §2.12
LLM-pipeline tier (X28 shard packing, X36 chunking) with the
split-at-boundary layout those two deliberately avoid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ranking import with_running_total


def pack_context_windows(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    order_cols: list[str] | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Exact doc→sequence span mapping for fixed-``budget`` packing.

    Documents are laid out in ``order_cols`` order (default: ``id_col``
    — include a unique key for determinism) and the concatenated token
    stream is cut every ``budget`` tokens. Rows with NULL or
    non-positive ``tokens_col`` are excluded (they contribute no
    tokens). Returns one row per (document, sequence) overlap:

    - ``id_col``      — the document key
    - ``n_tokens``    — the document's full token count
    - ``seq_id``      — 0-based sequence index
    - ``doc_offset``  — first token of this span, within the document
    - ``seq_offset``  — first token of this span, within the sequence
    - ``span_tokens`` — tokens this document contributes to this sequence
    - ``is_split``    — true iff the document straddles a boundary
      (span_tokens < n_tokens)

    Invariants (pinned in tests/test_packing.py): per-document spans are
    contiguous and sum to ``n_tokens``; every sequence except the last
    holds exactly ``budget`` tokens.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    order_cols = order_cols or [id_col]
    keep = list(dict.fromkeys([*order_cols, id_col]))
    t = df.select(*keep, F.col(tokens_col).alias("n_tokens")).filter(
        F.col("n_tokens") > 0
    )
    run = with_running_total(
        t, order_cols, "n_tokens", out_col="__end", n_buckets=n_buckets
    )
    b = F.lit(int(budget)).cast("long")
    start = (F.col("__end") - F.col("n_tokens")).cast("long")
    end = F.col("__end").cast("long")
    # sequence bounds use integer `div`, never floor(long / long): the
    # `/` operator is DOUBLE division, which silently mis-rounds once the
    # cumulative token stream passes 2^53 (round-11 ADVICE) — div keeps
    # the layout exact integer math at any stream length
    spans = (
        run.withColumn("__start", start)
        .withColumn("__endl", end)
        .withColumn(
            "seq_id",
            F.explode(
                F.sequence(
                    F.expr(f"__start div {int(budget)}"),
                    F.expr(f"(__endl - 1) div {int(budget)}"),
                )
            ),
        )
        .drop("__endl")
        .withColumn("__seq_lo", F.col("seq_id") * b)
        .withColumn("__from", F.greatest(F.col("__start"), F.col("__seq_lo")))
        .withColumn("__to", F.least(end, F.col("__seq_lo") + b))
    )
    return spans.select(
        F.col(id_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("seq_id").cast("long").alias("seq_id"),
        (F.col("__from") - F.col("__start")).alias("doc_offset"),
        (F.col("__from") - F.col("__seq_lo")).alias("seq_offset"),
        (F.col("__to") - F.col("__from")).alias("span_tokens"),
        (F.col("__to") - F.col("__from") < F.col("n_tokens")).alias("is_split"),
    )


def pack_manifest(spans: DataFrame, budget: int) -> DataFrame:
    """Per-sequence manifest over ``pack_context_windows`` output:
    (seq_id, n_docs, n_split_docs, n_tokens, fill_ratio). Every sequence
    except the last has fill_ratio exactly 1.0; the last holds the
    stream remainder."""
    return (
        spans.groupBy("seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("is_split").cast("long")).alias("n_split_docs"),
            F.sum("span_tokens").cast("long").alias("n_tokens"),
        )
        .withColumn(
            "fill_ratio", F.col("n_tokens") / F.lit(float(budget))
        )
    )
