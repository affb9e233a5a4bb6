"""Text-analysis column expressions for the documents table.

LLM-pipeline extensions (BASELINE.json north star): language ID, quality
scoring, token counting, document fingerprinting. Everything is a native
column expression (whole-stage codegen) — no Python UDFs, so these run at
scan speed over 100 TB of text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language
# heuristic. Deliberately small + deterministic (mirrored in the DuckDB
# oracle SQL).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "es": ["el", "la", "de", "y", "es", "un"],
    "fr": ["le", "la", "et", "est", "les", "un"],
}

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

FINGERPRINT_MOD = 1_000_000_007


def tokens(text: Column) -> Column:
    """Whitespace tokens with empties removed (deterministic).

    Splits on ``\\s+`` — the same regex as operators/dedup._tokens and as
    the DuckDB oracles' ``regexp_split_to_array(text, '\\s+')`` — so every
    tokenizing operator in the engine agrees on tabs/newlines/multi-space.
    """
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    # count of non-empty \s+-split tokens == count of maximal \S+ runs —
    # one regexp_count instead of size(filter(split(...))). Measured a
    # wash at 100x (the split scan dominates either way, round-9
    # triage); kept because it skips materializing the token array and
    # drops the interpreted filter HOF from the plan. Null-safe
    # identical on every fixture + edge case (null/empty/whitespace-
    # only/padded). tokens() stays for array consumers.
    return F.regexp_count(text, F.lit(r"\S+"))


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish pre-tokens via regexp (JVM-side regexp_count).

    Round-9 triage counter-result, kept as a warning: the alternation
    decomposes into 3 disjoint-class scans (letter runs + digit runs +
    other chars) that measure 3.6x FASTER in isolation at 100x corpus
    scale — but 1.3x SLOWER inside the full x_text_stats projection
    (10.5 s -> 13.9 s, interleaved A/B), where the extra expressions
    push the generated stage past the JIT's effective method budget.
    Expression micro-optimizations must be measured in the projection
    they ship in, not column-by-column; the single alternation stays."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_RE))


def punct_count(text: Column) -> Column:
    return F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))


def avg_token_len(text: Column) -> Column:
    # raw IEEE division — no rounding, so the value is bit-identical in
    # any engine computing sum(len)/n (SURVEY determinism contract).
    # sum(token lengths) == count of non-whitespace chars EXACTLY (tokens
    # are the maximal non-\s runs), so the former interpreted
    # aggregate/transform fold over the token array is one codegen-able
    # regexp_replace + length — same integers, same double (round-9
    # Arrow-twin triage: the HOF fold was the only interpreted
    # expression left on the x_text_stats hot path)
    n = token_count(text)
    total = F.length(F.regexp_replace(text, r"\s", ""))
    return F.when(n > 0, total / n).otherwise(F.lit(0.0))


def stopword_hits(text: Column, lang: str) -> Column:
    """Number of tokens that are stopwords of ``lang``."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens(F.lower(text)), lambda t: F.array_contains(sw, t)))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    n = token_count(text)
    return F.when(n > 0, stopword_hits(text, lang) / n).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Heuristic [0,1] quality: length + punctuation-density + stopwords.

    Same shape as Gopher/C4-style quality filters: long-enough docs with
    moderate punctuation and some function words score high.
    """
    n = token_count(text)
    len_score = F.least(n / F.lit(100.0), F.lit(1.0))
    punct_ratio = F.when(
        F.length(text) > 0, punct_count(text) / F.length(text)
    ).otherwise(F.lit(0.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio * 5.0, F.lit(1.0))
    sw_score = F.least(stopword_ratio(text, "en") * 5.0, F.lit(1.0))
    return (len_score + punct_score + sw_score) / 3.0


def lang_id(text: Column) -> Column:
    """Stopword-vote language guess over the 4 known lists.

    Deterministic argmax: ties broken by fixed language order
    (en > de > es > fr), 'und' (undetermined) when no list hits.
    """
    hits = {lang: stopword_hits(text, lang) for lang in STOPWORDS}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    for lang in reversed(list(STOPWORDS)):  # reversed → earlier langs win ties
        expr = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


# PII patterns kept RE2-compatible (no backrefs/lookarounds) so the same
# regexes run in Spark (Java regex) and any RE2-based engine identically.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9 ()\-]{7,}[0-9]",
    "url": r"https?://[^\s]+",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
}


def redact_pii(text: Column, replacement: str = "[PII]") -> Column:
    """Scrub emails/phones/URLs/IPs — the pre-training privacy pass.
    Pure chained regexp_replace: scan-speed, order fixed (URLs before
    emails would also work; the chain is deterministic either way)."""
    out = text
    for pattern in PII_PATTERNS.values():
        out = F.regexp_replace(out, pattern, replacement)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind PII match counts (for corpus audits)."""
    return {
        kind: F.regexp_count(text, F.lit(pattern))
        for kind, pattern in PII_PATTERNS.items()
    }


def fingerprint(text: Column) -> Column:
    """Polynomial rolling hash of the full text, mod 1e9+7.

    acc = (acc*31 + ascii(char)) % M — a deterministic 'document
    fingerprint' computable identically in any engine (the DuckDB oracle
    uses list_reduce with the same recurrence).
    """
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.coalesce(F.ascii(ch), F.lit(0))) % FINGERPRINT_MOD,
    )


def tfidf_top_terms(df, id_col: str, text_col: str, k: int = 3):
    """Top-k most distinctive terms per document by tf · (N/df).

    Linear-idf variant: monotone in term rarity like ln-idf, but its
    arithmetic (exact integer multiply + one IEEE-754 division) is
    bit-identical across engines, where ln's last-ulp behavior is
    libm-specific (e.g. 2·ln(10) vs ln(100) can rank-flip). Plan: two
    hash-aggs (tf, df), a vocabulary-sized broadcast for df, a 1-row
    broadcast for N, and a WindowGroupLimit-pruned per-doc top-k — no
    global sort.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    total = df.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "score",
            (F.col("tf") * F.col("n_docs")).cast("double")
            / F.col("df").cast("double"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "score", "rank")
    )


def bm25_top_docs(
    df,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
):
    """BM25 retrieval: top-k documents for a fixed bag of query terms.

    Rational idf variant — idf(t) = (N - df_t + 0.5) / (df_t + 0.5)
    WITHOUT the usual ln(): monotone in term rarity exactly like
    ln-idf, but pure +,-,*,/ on doubles, so any engine reproduces it
    bit-for-bit (ln's last-ulp behavior is libm-specific — same
    determinism contract as tfidf_top_terms). Per-term partial scores
    are summed in the FIXED order of ``query_terms`` via one conditional
    aggregation per term, so the float addition order is part of the
    operator's definition, not the shuffle's.

    Plan shape at 100 TB: the query terms are LITERALS, so each per-term
    tf is a column expression over the token array — the whole base
    relation (id, dl, tf per term) comes from ONE corpus scan with no
    explode and no (doc, term) shuffle. All corpus statistics (N, total
    length, per-term document frequencies) fold into a single 1-row
    aggregate that broadcasts back, and the final top-k is
    TakeOrderedAndProject — one scan, one tiny broadcast, no global sort.

    Returns (id, n_matched, bm25) for the top_k docs by score DESC,
    id ASC.
    """
    if not query_terms:
        raise ValueError("bm25_top_docs requires at least one query term")
    if len(set(query_terms)) != len(query_terms):
        # each duplicate would contribute an independent tf/df/score
        # term, silently inflating scores; BM25 over a term BAG is not
        # what the fixed-order summation defines, so reject outright
        dupes = sorted({t for t in query_terms if query_terms.count(t) > 1})
        raise ValueError(f"bm25_top_docs: duplicated query terms {dupes}")
    toks = tokens(F.col(text_col))

    def _tf(term: str) -> Column:
        # NB: F.filter treats a 2-arg callable as (element, index) — a
        # default-arg capture would silently bind the index, so close
        # over the term via a factory instead
        return F.size(F.filter(toks, lambda t: t == term))

    base = df.select(
        F.col(id_col),
        F.size(toks).alias("dl"),
        *[_tf(t).alias(f"tf{i}") for i, t in enumerate(query_terms)],
    )
    idx = range(len(query_terms))
    stats = base.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("total_dl"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)).alias(f"df{i}")
            for i in idx
        ],
    )
    joined = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("total_dl").cast("double") / F.col("n_docs").cast("double")

    def term_score(i: int):
        tf = F.col(f"tf{i}").cast("double")
        dfq = F.col(f"df{i}")
        idf = ((F.col("n_docs") - dfq).cast("double") + F.lit(0.5)) / (
            dfq.cast("double") + F.lit(0.5)
        )
        denom = tf + F.lit(k1) * (
            F.lit(1.0) - F.lit(b) + F.lit(b) * (F.col("dl").cast("double") / avgdl)
        )
        return F.when(
            F.col(f"tf{i}") > 0, idf * (tf * F.lit(k1 + 1.0)) / denom
        ).otherwise(F.lit(0.0))

    total = term_score(0)
    for i in idx:
        if i > 0:
            total = total + term_score(i)
    matched = F.when(F.col("tf0") > 0, 1).otherwise(0)
    for i in idx:
        if i > 0:
            matched = matched + F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)
    any_tf = F.col("tf0")
    for i in idx:
        if i > 0:
            any_tf = any_tf + F.col(f"tf{i}")
    return (
        joined.filter(any_tf > 0)
        .select(
            F.col(id_col),
            matched.cast("long").alias("n_matched"),
            total.alias("bm25"),
        )
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(top_k)
    )


def chunk_documents(
    df,
    id_col: str,
    text_col: str,
    chunk_size: int = 500,
    stride: int = 400,
):
    """Split documents into overlapping character windows — the standard
    LLM-preprocessing chunking step (stride < chunk_size gives
    chunk_size - stride characters of overlap between neighbors).

    One row per chunk: (id, chunk_id, chunk_start, chunk_text,
    chunk_len). Chunks start at 0, stride, 2·stride, … while the start
    is inside the document; empty documents yield no chunks. Pure
    JVM-side expressions (sequence + explode + substring): narrow — no
    shuffle, no UDF — so it runs at scan speed and scales linearly with
    corpus bytes; output partitioning follows the input.
    """
    if not 0 < stride <= chunk_size:
        raise ValueError("require 0 < stride <= chunk_size")
    n = F.length(F.col(text_col))
    idx = F.sequence(F.lit(0).cast("long"), F.floor((n - 1) / stride))
    exploded = (
        df.filter(n > 0)
        .select(F.col(id_col), F.col(text_col), F.explode(idx).alias("__idx"))
    )
    start = F.col("__idx") * stride
    chunk = F.substring(F.col(text_col), (start + 1).cast("int"), chunk_size)
    return exploded.select(
        F.col(id_col),
        F.col("__idx").cast("int").alias("chunk_id"),
        start.cast("long").alias("chunk_start"),
        chunk.alias("chunk_text"),
        F.length(chunk).alias("chunk_len"),
    )


def _segment_passages(text_col: str, passage_tokens: int):
    """THE passage-segmentation expressions (tokens array + array of
    non-overlapping ``passage_tokens``-token passages) shared by the
    intra-doc (dedup_passages) and cross-doc (scrub_crossdoc_passages)
    rewriters and mirrored by the _SEG_TOKS oracle convention. One
    definition, per the round-5 review consolidation — a copy that
    drifts would silently diverge the two rewrite siblings."""
    from pyspark.sql import functions as F

    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    n_seg = F.ceil(F.size(toks) / F.lit(float(passage_tokens))).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.array_join(
            F.slice(toks, i * passage_tokens + 1, passage_tokens), " "
        ),
    )
    return toks, segs


def dedup_passages(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    passage_tokens: int = 10,
):
    """Within-document repeated-passage removal (C4/CCNet intra-doc
    dedup): split ``text_col`` into non-overlapping ``passage_tokens``
    -token passages, keep the FIRST occurrence of each distinct passage,
    re-join the survivors. Fully NARROW (per-row fold, no shuffle); the
    keep-first accumulator is O(k²) in passages-per-doc, bounded by doc
    length. The ONE definition behind the x_passage_dedup catalog query
    and its planted-input tests (round-5 review finding: the logic used
    to be inlined in both).

    Returns (id_col, n_segments, n_kept, cleaned_text); rows whose text
    has no tokens are dropped.
    """
    from pyspark.sql import functions as F

    toks, segs = _segment_passages(text_col, passage_tokens)
    kept = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(F.array_contains(acc, s), acc).otherwise(
            F.concat(acc, F.array(s))
        ),
    )
    return df.filter(F.size(toks) > 0).select(
        id_col,
        F.size(segs).alias("n_segments"),
        F.size(kept).alias("n_kept"),
        F.array_join(kept, " ").alias("cleaned_text"),
    )


def scrub_crossdoc_passages(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    passage_tokens: int = 10,
    max_df: int = 2,
):
    """CROSS-document duplicated-passage removal — CCNet's paragraph-hash
    dedup re-expressed at passage grain, and the REWRITE counterpart of
    x_shared_passage_flags: segment every document into non-overlapping
    ``passage_tokens``-token passages, count each distinct passage's
    document frequency across the corpus, and remove passages appearing
    in MORE than ``max_df`` documents. Boilerplate (headers, navigation,
    legal blurbs) vanishes from every copy; document-unique prose
    survives. Completes the passage family: detect
    (shared_passage_flags) → intra-doc rewrite (dedup_passages) →
    cross-doc rewrite (this).

    Returns (id_col, n_segments, n_kept, cleaned_text) with original
    passage order preserved. Documents whose passages are ALL scrubbed
    stay in the output with n_kept=0 and empty cleaned_text — the
    all-boilerplate rows a downstream quality gate should drop, visible
    rather than silently deleted. Rows with no tokens are dropped (the
    sibling operators' convention).

    Plan: the segment subtree evaluates twice (once aggregated into the
    boilerplate set, once as the probe side) — both are NARROW
    scan-speed passes with the pos column pruned off the aggregate side.
    The join is a LEFT ANTI against only the passages whose df EXCEEDS
    the threshold — the boilerplate set, a small fraction of the
    distinct-passage table, broadcastable at any realistic corpus size —
    then one per-doc agg. No loop joins at any scale; order rebuild is
    array_sort over (pos, seg) structs inside the agg.
    """
    from pyspark.sql import functions as F

    toks, segs = _segment_passages(text_col, passage_tokens)
    base = df.filter(F.size(toks) > 0).select(
        id_col, F.size(segs).alias("n_segments"), segs.alias("__segs")
    )
    e = base.select(
        id_col, F.posexplode("__segs").alias("pos", "seg")
    )
    boiler = (
        e.groupBy("seg")
        .agg(F.countDistinct(id_col).alias("__df"))
        .where(F.col("__df") > max_df)
        .select("seg")
    )
    kept = (
        e.join(boiler, "seg", "left_anti")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("int").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                    lambda s: s.seg,
                ),
                " ",
            ).alias("cleaned_text"),
        )
    )
    return base.drop("__segs").join(kept, id_col, "left").select(
        id_col,
        "n_segments",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
    )


def source_overlap_matrix(
    df,
    source_col: str = "source",
    text_col: str = "text",
):
    """Cross-source exact-overlap matrix over the portable content
    fingerprint: for every ordered source pair (a <= b), the count of
    distinct fingerprints present in both (diagonal = each source's own
    distinct count). One hash-agg for the distinct (source, fp) pairs,
    then a self-equi-join on fp whose per-key fan-out is bounded by the
    source count. Shared by the x_source_overlap catalog query and its
    planted-input tests."""
    from pyspark.sql import functions as F

    h = df.select(
        source_col, fingerprint(F.col(text_col)).alias("fp")
    ).distinct()
    a, b = h.alias("a"), h.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col(f"a.{source_col}") <= F.col(f"b.{source_col}")),
        )
        .groupBy(
            F.col(f"a.{source_col}").alias("source_a"),
            F.col(f"b.{source_col}").alias("source_b"),
        )
        .agg(F.count("*").alias("shared_fingerprints"))
    )


def bigram_pairs(df, id_col: str = "doc_id", text_col: str = "text"):
    """(id, w1, w2) rows for every consecutive token pair (docs with
    fewer than two tokens contribute nothing)."""
    from pyspark.sql import functions as F

    tk = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    return (
        df.select(id_col, tk.alias("tk"))
        .filter(F.size("tk") >= 2)
        .select(
            id_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("tk") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("tk"), i).alias("w1"),
                        F.element_at(F.col("tk"), i + 1).alias("w2"),
                    ),
                )
            ).alias("b"),
        )
        .select(id_col, F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )


def bigram_surprisal(df, id_col: str = "doc_id", text_col: str = "text"):
    """Per-doc cross-entropy under the corpus bigram LM (micro-nat
    integer terms; see the x_bigram_surprisal catalog query, which calls
    this — the one definition its planted tests exercise too)."""
    from pyspark.sql import functions as F

    tk = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    pairs = bigram_pairs(df, id_col, text_col)
    c2 = pairs.groupBy("w1", "w2").agg(F.count("*").alias("f2"))
    c1 = (
        df.select(F.explode(tk).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("f1"))
    )
    terms = (
        pairs.join(c2, ["w1", "w2"])
        .join(c1, pairs.w1 == c1.token)
        .select(
            id_col,
            F.round(
                F.log(F.col("f1").cast("double") / F.col("f2")) * 1000000.0, 0
            )
            .cast("long")
            .alias("q"),
        )
    )
    return terms.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.sum("q") / 1000000.0 / F.count("*"), 4).alias(
            "bigram_surprisal_nats"
        ),
    )
