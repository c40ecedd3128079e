"""Z-order clustering: multi-dimensional file-range narrowing, proven
from the written parquet footers' min/max stats."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from rabbit_in_a_blender_spark.operators.zorder import zorder_key, zorder_layout

N_FILES = 16


def _file_ranges(path: str, col: str) -> list[float]:
    """Per-file (max - min) width of `col`, from parquet footer stats."""
    widths = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(path, f))
        idx = {md.schema.column(j).name: j for j in range(md.num_columns)}[col]
        stats = [
            md.row_group(i).column(idx).statistics for i in range(md.num_row_groups)
        ]
        widths.append(float(max(s.max for s in stats) - min(s.min for s in stats)))
    return widths


def _xy(spark, n=40_000):
    # two independent uniform dimensions (md5-derived, deterministic)
    return spark.range(n).select(
        F.col("id"),
        (F.conv(F.substring(F.md5(F.concat(F.col("id").cast("string"), F.lit(":x"))), 1, 6), 16, 10).cast("long") % 10_000).alias("x"),
        (F.conv(F.substring(F.md5(F.concat(F.col("id").cast("string"), F.lit(":y"))), 1, 6), 16, 10).cast("long") % 10_000).alias("y"),
    )


def test_zorder_narrows_all_dimensions(spark, tmp_path):
    df = _xy(spark)
    # baseline: 1-D clustering on x — y stays full-range in every file
    oned = tmp_path / "oned"
    df.repartitionByRange(N_FILES, "x").sortWithinPartitions("x").write.parquet(str(oned))
    zed = tmp_path / "zed"
    zorder_layout(df, ["x", "y"], num_files=N_FILES).write.parquet(str(zed))

    avg = lambda v: sum(v) / len(v)
    x_1d, y_1d = avg(_file_ranges(str(oned), "x")), avg(_file_ranges(str(oned), "y"))
    x_z, y_z = avg(_file_ranges(str(zed), "x")), avg(_file_ranges(str(zed), "y"))
    # 1-D layout: x narrow, y full-range (~10k)
    assert x_1d < 1500 and y_1d > 8000
    # z-order: BOTH dimensions substantially narrowed vs full range —
    # with 16 files a perfect 2-D split gives ~1/4 of the range per dim
    assert x_z < 0.55 * y_1d
    assert y_z < 0.55 * y_1d
    # and the data is intact
    back = spark.read.parquet(str(zed))
    assert back.count() == df.count()
    assert back.agg(F.sum("x")).collect()[0][0] == df.agg(F.sum("x")).collect()[0][0]


def test_zorder_key_is_deterministic_and_bounded(spark):
    df = _xy(spark, 2_000)
    z1 = sorted(r["z"] for r in df.select(zorder_key(df, ["x", "y"]).alias("z")).collect())
    z2 = sorted(r["z"] for r in df.repartition(7).select(zorder_key(df, ["x", "y"]).alias("z")).collect())
    assert z1 == z2
    assert 0 <= z1[0] and z1[-1] < 2 ** 16  # 2 dims x 8 bits


def test_warehouse_write_zorder_by(spark, tmp_path):
    from rabbit_in_a_blender_spark.pipeline.warehouse import Warehouse

    wh = Warehouse(str(tmp_path / "wh"))
    wh.write(_xy(spark, 5_000), "work", "zt", zorder_by=["x", "y"])
    back = wh.read(spark, "work", "zt")
    assert back.count() == 5_000
    assert set(back.columns) == {"id", "x", "y"}  # __z never persisted


def test_zorder_with_date_dimension(spark, tmp_path):
    """Regression (ADVICE r5): cast(date as double) is forbidden — date
    dims must go through days-since-epoch, and files must still narrow
    on the date dimension (the docstring's 'observation date' case)."""
    df = spark.range(8_000).select(
        F.col("id"),
        (F.col("id") % 9973).alias("x"),
        F.date_add(F.lit("2020-01-01").cast("date"), (F.col("id") % 730).cast("int")).alias("d"),
    )
    out = tmp_path / "zd"
    zorder_layout(df, ["x", "d"], num_files=8).write.parquet(str(out))
    back = spark.read.parquet(str(out))
    assert back.count() == 8_000
    import pyarrow.parquet as pq_

    spans = []
    for f in sorted(os.listdir(out)):
        if not f.endswith(".parquet"):
            continue
        col = pq_.read_table(os.path.join(out, f), columns=["d"])["d"].to_pylist()
        spans.append((max(col) - min(col)).days)
    # each file should cover well under the full 730-day range
    assert sum(spans) / len(spans) <= 500, spans


def test_zorder_with_string_dimension(spark, tmp_path):
    """String dims hash to a numeric proxy: equal values collapse into
    few files (point-lookup pruning) while the numeric dim still
    narrows."""
    df = spark.range(8_000).select(
        F.col("id"),
        (F.col("id") % 9973).alias("x"),
        F.concat(F.lit("src"), (F.col("id") % 12).cast("string")).alias("s"),
    )
    out = tmp_path / "zs"
    zorder_layout(df, ["x", "s"], num_files=8).write.parquet(str(out))
    back = spark.read.parquet(str(out))
    assert back.count() == 8_000
    # each distinct string value should appear in well under all 8 files
    import pyarrow.parquet as pq_

    per_value_files = {}
    for f in sorted(os.listdir(out)):
        if not f.endswith(".parquet"):
            continue
        vals = set(
            pq_.read_table(os.path.join(out, f), columns=["s"])["s"].to_pylist()
        )
        for v in vals:
            per_value_files.setdefault(v, 0)
            per_value_files[v] += 1
    avg_files = sum(per_value_files.values()) / len(per_value_files)
    assert avg_files <= 4, per_value_files  # vs 8 with no clustering
