"""Dependency-free rendering of the business report — the Spark twin of
knitting the reference's report.Rmd.

The reference renders its analysis document with kable/kableExtra HTML
tables and base-R line/bar charts
(reports/BusinessAnalysis.PractII.VarmaA.Rmd:129-148 pivot kables,
:163-199 growth line plots, :234-249 weekly barplot, :275-308 by-sport
kable + barplots). This container has no plotting libraries, so the
re-expression is GitHub-flavored markdown: kable → markdown table,
base-R chart → deterministic ASCII bar chart. Everything upstream of
the final ``collect()`` stays a distributed DataFrame — rendering only
ever materializes REPORT-GRAIN tables (sports × years, weekdays,
countries: tens of rows by construction, the same tables the reference
pulls into R memory to plot), so the edge collect is bounded no matter
the fact size.

tests/test_render.py pins the structure: header hierarchy mirrors the
Rmd's section outline, every table row survives into the markdown, bar
lengths are proportional to values, and the whole render is
byte-deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

MAX_RENDER_ROWS = 1000  # refuse to render non-report-grain frames


def markdown_table(df: DataFrame, caption: str | None = None) -> str:
    """kable analog: a GitHub-markdown table of a report-grain frame.

    Column order is the frame's; values render via ``str`` except
    floats, which use a fixed 2-decimal format so re-renders are
    byte-identical; None renders as an em-dash like kable's default NA.
    Raises on frames above MAX_RENDER_ROWS — rendering is for report
    tables, not data export.
    """
    rows = df.limit(MAX_RENDER_ROWS + 1).collect()
    if len(rows) > MAX_RENDER_ROWS:
        raise ValueError(
            f"markdown_table renders report-grain frames "
            f"(<= {MAX_RENDER_ROWS} rows); aggregate first"
        )
    cols = df.columns

    def cell(v) -> str:
        if v is None:
            return "—"
        if isinstance(v, float):
            return f"{v:,.2f}"
        if isinstance(v, int) and not isinstance(v, bool):
            return f"{v:,}"
        return str(v).replace("|", "\\|")

    out = []
    if caption:
        out.append(f"**{caption}**")
        out.append("")
    out.append("| " + " | ".join(cols) + " |")
    out.append("|" + "|".join("---" for _ in cols) + "|")
    for r in rows:
        out.append("| " + " | ".join(cell(r[c]) for c in cols) + " |")
    return "\n".join(out)


def ascii_barchart(
    labels: list[str],
    values: list[float],
    title: str | None = None,
    width: int = 40,
    unit: str = "",
) -> str:
    """base-R barplot analog: one fixed-width row per bar, lengths
    proportional to value / max(values), deterministic output."""
    if len(labels) != len(values):
        raise ValueError("labels and values must align")
    out = []
    if title:
        out.append(f"**{title}**")
        out.append("")
    out.append("```")
    vmax = max((v for v in values if v is not None), default=0)
    lw = max((len(str(l)) for l in labels), default=0)
    for label, v in zip(labels, values):
        if v is None:
            out.append(f"{str(label):>{lw}} | —")
            continue
        n = round(width * v / vmax) if vmax > 0 else 0
        out.append(f"{str(label):>{lw}} | {'█' * n} {v:,.1f}{unit}")
    out.append("```")
    return "\n".join(out)


def render_business_report(fact: DataFrame) -> str:
    """Assemble the markdown report document over the star fact —
    section outline mirroring report.Rmd (:105 growth by sport,
    :211 weekly activity, :257 by-sport statistics, :312 by-country),
    each section one distributed aggregation collected at report grain.
    """
    from pyspark.sql import functions as F

    from .report import streaming_by_sport, top_markets, yoy_growth

    sections: list[str] = ["# Streaming Business Analysis", ""]

    # Growth of streaming by sport over time (report.Rmd:105-153):
    # the events pivot — sports × years, R1's dcast as groupBy().pivot()
    years = [
        r[0]
        for r in fact.select(F.col("year").cast("int"))
        .distinct()
        .orderBy("year")
        .collect()
    ]
    pivot = (
        fact.groupBy("sport_name")
        .pivot("year", years)
        .agg(F.sum("transaction_count").cast("long"))
        .orderBy("sport_name")
    )
    sections.append("## Streaming Events by Sport and Year")
    sections.append(
        markdown_table(pivot, "Number of Streaming Events by Sport and Year")
    )
    sections.append("")

    # Growth trends (report.Rmd:155-199's line plots) — the yearly
    # totals as a bar series per year
    growth = (
        fact.groupBy(F.col("year").cast("int").alias("year"))
        .agg(F.sum("transaction_count").cast("long").alias("streaming_events"))
        .orderBy("year")
        .collect()
    )
    sections.append("## Growth Trends")
    sections.append(
        ascii_barchart(
            [str(r["year"]) for r in growth],
            [float(r["streaming_events"]) for r in growth],
            title="Total Streaming Events by Year",
        )
    )
    sections.append("")

    # Weekly activity (report.Rmd:211-249): day-of-week derived from
    # the date key (the Rmd joins dim_date for it; the fact's date_id
    # IS the yyyyMMdd key, schema.R:71-87) — Sunday=1 like the
    # reference's dim_date
    d = F.to_date(F.col("date_id").cast("string"), "yyyyMMdd")
    weekly = (
        fact.groupBy(
            F.date_format(d, "EEEE").alias("day_of_week_name"),
            F.dayofweek(d).alias("day_of_week"),
        )
        .agg(F.sum("transaction_count").cast("long").alias("streaming_events"))
        .orderBy("day_of_week")
        .collect()
    )
    sections.append("## Weekly Streaming Activity")
    sections.append(
        ascii_barchart(
            [r["day_of_week_name"] for r in weekly],
            [float(r["streaming_events"]) for r in weekly],
            title="Streaming Events by Day of Week",
        )
    )
    sections.append("")

    # By sport / top markets / YoY — the report.py tables
    # (report.Rmd:257-359's kables), formatted at the display edge
    sections.append("## Streaming Statistics by Sport")
    sections.append(
        markdown_table(
            streaming_by_sport(fact, formatted=True),
            "Streaming Statistics by Sport",
        )
    )
    sections.append("")
    sections.append("## Top Markets")
    sections.append(
        markdown_table(top_markets(fact, formatted=True), "Top Markets by Volume")
    )
    sections.append("")
    sections.append("## Year-over-Year Growth")
    sections.append(
        markdown_table(yoy_growth(fact, formatted=True), "Year-over-Year Growth")
    )
    sections.append("")
    return "\n".join(sections)
