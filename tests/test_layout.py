"""Layout clustering must actually tighten per-file parquet statistics —
measured from the files' own row-group metadata, the thing the scanner
skips on."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from sportstv_streaming_data_warehouse_spark.plans.layout import (
    cluster_by_range,
    zorder_by,
)
from sportstv_streaming_data_warehouse_spark.sources.fixtures import load_table

from .conftest import SF001, SF01


def _file_spans(path: str, col: str) -> list[float]:
    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        los, his = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            los.append(st.min)
            his.append(st.max)
        lo, hi = min(los), max(his)
        spans.append(
            (hi - lo).total_seconds() if hasattr(hi - lo, "total_seconds") else float(hi - lo)
        )
    return spans


def test_range_cluster_tightens_file_stats(spark, tmp_path):
    li = load_table(spark, SF01, "lineitem")
    base, clustered = str(tmp_path / "base"), str(tmp_path / "clustered")
    li.repartition(16).write.parquet(base)  # hash layout: every file spans everything
    cluster_by_range(li, ["l_shipdate"], num_files=16).write.parquet(clustered)

    base_spans = _file_spans(base, "l_shipdate")
    clus_spans = _file_spans(clustered, "l_shipdate")
    global_span = max(base_spans)
    # unclustered files each cover ~the whole range; clustered files ~1/16
    assert max(clus_spans) < global_span / 4
    assert sum(clus_spans) / len(clus_spans) < global_span / 8


def test_zorder_tightens_both_dimensions(spark, tmp_path):
    li = load_table(spark, SF01, "lineitem").withColumn(
        "ship_days", F.datediff(F.to_date("l_shipdate"), F.lit("1995-01-01"))
    )
    base, z = str(tmp_path / "base"), str(tmp_path / "z")
    li.repartition(16).write.parquet(base)
    zorder_by(li, ["ship_days", "l_partkey"], num_files=16).write.parquet(z)

    for col in ["ship_days", "l_partkey"]:
        base_avg = sum(_file_spans(base, col)) / 16
        z_avg = sum(_file_spans(z, col)) / 16
        # both interleaved dimensions shrink (a single-col sort would
        # only shrink one); sqrt(16)=4 is the theoretical factor, assert
        # a conservative 2x
        assert z_avg < base_avg / 2, (col, z_avg, base_avg)


def test_compaction_plan_bins_small_files(spark, tmp_path):
    from sportstv_streaming_data_warehouse_spark.plans.layout import (
        compaction_plan,
    )

    # plant a many-small-files table (the 10K-task-job symptom)
    d = str(tmp_path / "smalls")
    load_table(spark, SF01, "lineitem").repartition(20).write.parquet(d)
    # spark writes part-*.parquet inside d
    import os

    files = [n for n in os.listdir(d) if n.endswith(".parquet")]
    assert len(files) == 20
    total = sum(os.path.getsize(os.path.join(d, n)) for n in files)
    target = total // 4  # aim for ~4 bins
    rows = compaction_plan(spark, d, target_bytes=target).collect()
    assert {r["file_name"] for r in rows} == set(files)
    bins = {}
    for r in rows:
        bins.setdefault(r["bin"], []).append(r)
    # every bin except possibly the last fills to >= target (first-fit
    # on the exclusive prefix: a file whose prefix falls in bin b starts
    # there, so b's content reaches at least target before b+1 opens)
    last = max(bins)
    for b, rs in bins.items():
        byt = sum(r["bytes"] for r in rs)
        assert all(r["bin_bytes"] == byt and r["files_in_bin"] == len(rs) for r in rs)
        if b != last:
            assert byt >= target * 0.5  # conservative: files are chunky
    # deterministic: second run produces the identical plan
    rows2 = compaction_plan(spark, d, target_bytes=target).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_compaction_plan_single_bin_when_under_target(spark, tmp_path):
    from sportstv_streaming_data_warehouse_spark.plans.layout import (
        compaction_plan,
    )

    rows = compaction_plan(spark, SF001, target_bytes=1 << 30).collect()
    assert rows and all(r["bin"] == 0 for r in rows)
    assert rows[0]["files_in_bin"] == len(rows)
