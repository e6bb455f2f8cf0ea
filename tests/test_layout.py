"""Data-layout writes (sources/layout.py): Z-order / range-sorted
parquet and their actual row-group pruning power, measured from the
files' parquet statistics with pyarrow."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from dbd_datawarehouse_scraper_spark.sources.layout import (
    sorted_write,
    zorder_key,
    zorder_write,
)


def _rowgroup_touch_fraction(path, col_a, lo_a, hi_a, col_b=None,
                             lo_b=None, hi_b=None):
    """Fraction of row groups whose [min,max] statistics intersect the
    given rectangle — exactly what a parquet reader's row-group
    pruning computes."""
    touched = total = 0
    for f in glob.glob(f"{path}/part-*.parquet"):
        meta = pq.ParquetFile(f).metadata
        names = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        for rg in range(meta.num_row_groups):
            total += 1
            g = meta.row_group(rg)
            sa = g.column(names[col_a]).statistics
            hit = sa.min <= hi_a and sa.max >= lo_a
            if hit and col_b is not None:
                sb = g.column(names[col_b]).statistics
                hit = sb.min <= hi_b and sb.max >= lo_b
            touched += hit
    assert total > 0
    return touched / total


@pytest.fixture(scope="module")
def grid(spark):
    # 100k rows over a 1000x1000 value grid, shuffled order: every row
    # group of a naive write spans ~the full domain of both columns
    return (
        spark.range(0, 100_000, 1, 8)
        .select(
            F.col("id").alias("row_id"),
            (F.xxhash64("id") % 1000).alias("x"),
            (F.xxhash64("id", F.lit(1)) % 1000).alias("y"),
        )
        .withColumn("x", F.abs(F.col("x")))
        .withColumn("y", F.abs(F.col("y")))
    )


def test_zorder_write_prunes_rectangles(spark, grid, tmp_path):
    naive = str(tmp_path / "naive")
    zord = str(tmp_path / "zorder")
    grid.write.mode("overwrite").parquet(naive)
    zorder_write(grid, zord, ["x", "y"], num_files=16)

    # identical data, different order
    a = sorted(r["row_id"] for r in spark.read.parquet(zord).collect())
    assert a == list(range(100_000))

    # a 10%x10% rectangle: the shuffled layout touches ~every row
    # group; the Z-ordered one a small fraction
    f_naive = _rowgroup_touch_fraction(naive, "x", 100, 199, "y", 500, 599)
    f_zord = _rowgroup_touch_fraction(zord, "x", 100, 199, "y", 500, 599)
    assert f_naive > 0.9, f_naive
    assert f_zord < 0.4 * f_naive, (f_zord, f_naive)

    # single-column range filters prune on BOTH participating columns
    # (the property a linear sort cannot give)
    fx = _rowgroup_touch_fraction(zord, "x", 0, 99)
    fy = _rowgroup_touch_fraction(zord, "y", 0, 99)
    assert fx < 0.75 and fy < 0.75, (fx, fy)

    # and the engine actually reads fewer rows through the pruned scan
    pruned = spark.read.parquet(zord).filter(
        (F.col("x").between(100, 199)) & (F.col("y").between(500, 599))
    )
    expect = grid.filter(
        (F.col("x").between(100, 199)) & (F.col("y").between(500, 599))
    )
    assert pruned.count() == expect.count()


def test_sorted_write_prunes_leading_column(spark, grid, tmp_path):
    srt = str(tmp_path / "sorted")
    sorted_write(grid, srt, ["x"], num_files=16)
    assert spark.read.parquet(srt).count() == 100_000
    # leading-column filter prunes hard; the unsorted column doesn't
    fx = _rowgroup_touch_fraction(srt, "x", 100, 199)
    fy = _rowgroup_touch_fraction(srt, "y", 100, 199)
    assert fx < 0.25, fx
    assert fy > 0.9, fy


def test_zorder_key_bounds_and_validation(spark):
    import pyspark.sql.functions as SF

    df = spark.range(4).select(
        SF.col("id").alias("a"), (SF.lit(3) - SF.col("id")).alias("b")
    )
    # 2 cols x 12 bits -> key < 2^24, deterministic, distinct on a grid
    from dbd_datawarehouse_scraper_spark.sources.layout import _quantize

    q = [_quantize(SF.col(c), 0, 3, 12) for c in ("a", "b")]
    keys = [r["k"] for r in df.select(zorder_key(q, 12).alias("k")).collect()]
    assert len(set(keys)) == 4 and all(0 <= k < (1 << 24) for k in keys)
    with pytest.raises(ValueError, match="exceeds"):
        zorder_key(q * 3, 12)
    from dbd_datawarehouse_scraper_spark.sources.layout import zorder_write

    with pytest.raises(ValueError, match="at least one column"):
        zorder_write(df, "/tmp/never", [])


def test_bloom_filter_option_writes_blooms(spark, grid, tmp_path):
    """bloom_cols adds parquet bloom filters: the files carry extra
    bloom bytes (this container's pyarrow can't introspect bloom
    offsets, so presence is pinned by the deterministic size delta on
    identical data+layout), and filtered reads stay correct."""
    import os

    plain = str(tmp_path / "plain")
    bloom = str(tmp_path / "bloom")
    sorted_write(grid, plain, ["x"], num_files=4)
    sorted_write(grid, bloom, ["x"], num_files=4,
                 bloom_cols={"row_id": 100_000})

    def total(p):
        return sum(
            os.path.getsize(f) for f in glob.glob(f"{p}/part-*.parquet")
        )

    assert total(bloom) > total(plain)
    got = spark.read.parquet(bloom).filter(F.col("row_id") == 4242).collect()
    assert len(got) == 1 and got[0]["row_id"] == 4242


def test_optimize_table_compacts_and_zorders_in_place(spark, grid, tmp_path):
    """optimize_table = compaction + Z-order in one in-place rewrite,
    reusing compact_output's swap protocol (and its crash recovery)."""
    import os

    from dbd_datawarehouse_scraper_spark.sources.layout import optimize_table
    from dbd_datawarehouse_scraper_spark.sources.sinks import (
        recover_compaction,
    )

    path = str(tmp_path / "tbl")
    # simulate accumulated micro-batch appends: many small files
    grid.repartition(64).write.mode("overwrite").parquet(path)
    n_before = len(glob.glob(f"{path}/part-*.parquet"))
    assert n_before >= 32
    f_before = _rowgroup_touch_fraction(path, "x", 100, 199, "y", 500, 599)

    n_after = optimize_table(
        spark, path, ["x", "y"], target_mb=1,
        # pruning granularity is the ROW GROUP: a compacted file still
        # needs several groups inside it, so cap group size (64 KB)
        options={"parquet.block.size": 65536},
    )
    files = glob.glob(f"{path}/part-*.parquet")
    assert len(files) < n_before
    assert sorted(
        r["row_id"] for r in spark.read.parquet(path).collect()
    ) == list(range(100_000))
    f_after = _rowgroup_touch_fraction(path, "x", 100, 199, "y", 500, 599)
    assert f_after < 0.5 * f_before, (f_after, f_before)
    assert not os.path.exists(f"{path}.__compact_old__")
    assert not os.path.exists(f"{path}.__compact_tmp__")

    # crash-recovery contract: a swap that stopped after the first
    # rename is rolled back by the shared recover_compaction
    os.rename(path, f"{path}.__compact_old__")
    assert recover_compaction(path) is True
    assert spark.read.parquet(path).count() == 100_000
