"""Regex-based category inference with last-write-wins precedence.

The reference recovers orphaned asset rows via three sequential boolean
masks (loadAnalyticsDB.PractII.VarmaA.R:272-285): each assignment
OVERWRITES earlier ones, so a value matching both the ice-hockey pattern
(``ICE`` prefix) and the inline-hockey pattern (``ICEHL-``) ends up as
Inline Hockey. A naive Spark ``when``-chain is first-match-wins, so we
build the chain in REVERSE rule order to replicate last-write-wins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def infer_with_precedence(col: Column, rules: Sequence[tuple[str, str]]) -> Column:
    """Apply (regex, label) rules with last-write-wins semantics.

    ``rules`` in source order (as in etl.R:272-285); the LAST matching
    rule's label wins. Returns NULL when nothing matches (caller drops or
    coalesces — etl.R:335-343's orphan fallback).
    """
    expr: Column = F.lit(None).cast("string")
    for pattern, label in rules:  # build reversed: later rules tested first
        expr = F.when(col.rlike(pattern), F.lit(label)).otherwise(expr)
        # each new when() wraps the previous chain, so iterating in source
        # order leaves the final (latest) rule outermost == tested first
    return expr


# The reference's actual rule set (etl.R:272-285) for the reference-shaped
# fixture tests: note ICEHL- matches both the ICE prefix and the inline
# pattern; last-write-wins makes it Inline Hockey (SURVEY.md §7.4.3).
SPORT_RULES: tuple[tuple[str, str], ...] = (
    (r"^(DEL|AHL|AIH|IHB|SIH|NLN|NLA|ICE|NXXX|SLXXX)-", "Ice Hockey"),
    (r"^(IHL|ICEHL)-", "Inline Hockey"),
    (r"^(SKJ|SKA|FIS)-", "Ski Jumping"),
)
