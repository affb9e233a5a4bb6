"""Markdown/ASCII rendering of the business report (plans/render.py) —
the dependency-free twin of knitting report.Rmd. Pins: kable-analog
tables keep every row and escape pipes, bar lengths are proportional,
the assembled document carries the Rmd's section outline, and the whole
render is byte-deterministic across invocations."""

import pytest

from sportstv_streaming_data_warehouse_spark.plans import render, star

from .fixtures_ref import generate


@pytest.fixture(scope="module")
def fact(spark):
    data = generate()
    sdfs = {k: spark.createDataFrame(v) for k, v in data.items()}
    return star.run_etl(
        spark,
        streaming_txns=sdfs["streaming_txns"],
        csv_txns=sdfs["csv_txns"],
        subscribers=sdfs["subscribers"],
        postal2city=sdfs["postal2city"],
        cities=sdfs["cities"],
        countries=sdfs["countries"],
        assets=sdfs["assets"],
    )["fact"].cache()


def test_markdown_table_rows_and_escaping(spark):
    df = spark.createDataFrame(
        [("a|b", 1, 1.5), ("c", None, None)],
        "name string, n int, x double",
    )
    md = render.markdown_table(df, caption="T")
    lines = md.splitlines()
    assert lines[0] == "**T**"
    assert lines[2] == "| name | n | x |"
    assert "a\\|b" in md  # pipe escaped, not a new column
    assert "| c | — | — |" in md  # NULLs render as em-dash
    assert len([l for l in lines if l.startswith("| ")]) == 3  # header + 2 rows


def test_markdown_table_refuses_data_export(spark):
    big = spark.range(render.MAX_RENDER_ROWS + 1).selectExpr("id")
    with pytest.raises(ValueError):
        render.markdown_table(big)


def test_ascii_barchart_proportional():
    md = render.ascii_barchart(["a", "b", "c"], [10.0, 5.0, 0.0], width=40)
    bars = [l.count("█") for l in md.splitlines() if "|" in l]
    assert bars == [40, 20, 0]


def test_business_report_structure_and_determinism(fact):
    doc1 = render.render_business_report(fact)
    doc2 = render.render_business_report(fact)
    assert doc1 == doc2  # byte-deterministic
    # the Rmd's section outline survives
    for heading in [
        "# Streaming Business Analysis",
        "## Streaming Events by Sport and Year",
        "## Growth Trends",
        "## Weekly Streaming Activity",
        "## Streaming Statistics by Sport",
        "## Top Markets",
        "## Year-over-Year Growth",
    ]:
        assert heading in doc1, heading
    # every sport row reaches the pivot table
    from .fixtures_ref import SPORTS

    for sport in set(SPORTS.values()):
        assert sport in doc1
    # the weekly chart covers the full week
    for day in ["Monday", "Sunday"]:
        assert day in doc1
