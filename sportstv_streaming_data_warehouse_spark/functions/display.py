"""Display-layer number formatting (SURVEY §2.8 F13).

The reference formats report numbers with thousands separators and fixed
decimals (report.Rmd:41-47's format(big.mark=",") calls). That is
presentation, not analytics — kept out of every catalog query on purpose
(formatted strings would destroy numeric comparability) and exposed here
for the final SELECT of a report."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def format_display(col: Column, decimals: int = 0) -> Column:
    """'1234567.891' → '1,234,568' (decimals=0) / '1,234,567.89' (=2)."""
    return F.format_number(col, decimals)


def format_pct(col: Column, decimals: int = 1) -> Column:
    """Ratio → display percentage string: 0.1234 → '12.3%'."""
    return F.concat(F.format_number(col * 100.0, decimals), F.lit("%"))
