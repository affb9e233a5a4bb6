"""Semantics tests for the round-6 operators, with planted inputs the
fixture corpus lacks (a passage shared by exactly 3+ documents, an
all-boilerplate document, order-sensitive survivors)."""

from sportstv_streaming_data_warehouse_spark.functions.text import (
    scrub_crossdoc_passages,
)

BLOCK = "a b c d e f g h i j"   # one exact 10-token passage
TAIL = "k l m n o p q r s t"
SOLO = "u v w x y z aa bb cc dd"


def _scrub(spark, rows, max_df=2):
    """Planted inputs through THE SAME function the catalog query calls
    (functions/text.scrub_crossdoc_passages)."""
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {
        r["doc_id"]: r
        for r in scrub_crossdoc_passages(
            df, "doc_id", "text", passage_tokens=10, max_df=max_df
        ).collect()
    }


def test_boilerplate_passage_scrubbed_from_every_document(spark):
    # BLOCK appears in 3 docs (> max_df=2) -> removed from ALL of them;
    # TAIL appears in 2 docs (== max_df) -> kept in both
    rows = [
        (1, f"{BLOCK} {TAIL}"),
        (2, f"{TAIL} {BLOCK}"),
        (3, f"{BLOCK} {SOLO}"),
    ]
    got = _scrub(spark, rows)
    assert got[1]["n_segments"] == 2 and got[1]["n_kept"] == 1
    assert got[1]["cleaned_text"] == TAIL
    assert got[2]["cleaned_text"] == TAIL
    assert got[3]["cleaned_text"] == SOLO


def test_all_boilerplate_doc_stays_visible_with_empty_text(spark):
    rows = [
        (1, BLOCK),
        (2, BLOCK),
        (3, BLOCK),
        (4, SOLO),
    ]
    got = _scrub(spark, rows)
    # the boilerplate-only docs are NOT silently deleted
    for d in (1, 2, 3):
        assert got[d]["n_segments"] == 1
        assert got[d]["n_kept"] == 0
        assert got[d]["cleaned_text"] == ""
    assert got[4]["cleaned_text"] == SOLO


def test_survivor_order_is_original_passage_order(spark):
    # survivors must re-join in ORIGINAL position order even when the
    # scrubbed passage sits between them (and regardless of the
    # lexicographic order of the passages themselves)
    first = "z z z z z z z z z z"     # sorts AFTER 'k...' lexicographically
    rows = [
        (1, f"{first} {BLOCK} {TAIL}"),
        (2, BLOCK),
        (3, BLOCK),
    ]
    got = _scrub(spark, rows)
    assert got[1]["cleaned_text"] == f"{first} {TAIL}"


def test_intra_doc_repeats_count_df_once(spark):
    # a passage repeated INSIDE one doc has df=1 there: with max_df=1 a
    # second doc sharing it pushes df to 2 and scrubs both copies
    rows = [
        (1, f"{BLOCK} {BLOCK} {TAIL}"),
        (2, f"{BLOCK} {SOLO}"),
    ]
    got = _scrub(spark, rows, max_df=1)
    # df(BLOCK) = 2 distinct docs -> scrubbed everywhere, BOTH copies
    assert got[1]["cleaned_text"] == TAIL and got[1]["n_kept"] == 1
    assert got[2]["cleaned_text"] == SOLO
    # df(TAIL) = df(SOLO) = 1 -> kept
    got2 = _scrub(spark, [(1, f"{BLOCK} {BLOCK} {TAIL}")], max_df=1)
    # alone, the intra-doc repeat survives the CROSS-doc scrub (df=1);
    # collapsing it is the intra-doc sibling's job (dedup_passages)
    assert got2[1]["cleaned_text"] == f"{BLOCK} {BLOCK} {TAIL}"
