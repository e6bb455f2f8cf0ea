"""One-pass table profiling: exact fields pinned exactly, HLL
estimate bounded and partition-invariant, complex types handled."""

import pytest
from pyspark.sql import functions as F

from dbd_datawarehouse_scraper_spark.operators.profiling import profile_table


def _profile_map(df, **kw):
    return {r["column"]: r for r in profile_table(df, **kw).collect()}


def test_profile_exact_fields(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 1.5, [1, 2]),
            (2, None, 2.5, None),
            (3, "c", None, [3]),
            (3, "c", 4.5, []),
        ],
        "id int, s string, x double, arr array<int>",
    )
    p = _profile_map(df)
    assert set(p) == {"id", "s", "x", "arr"}
    for c in p.values():
        assert c["n_rows"] == 4
    assert p["id"]["n_nulls"] == 0 and p["s"]["n_nulls"] == 1
    assert p["x"]["n_nulls"] == 1 and p["arr"]["n_nulls"] == 1
    # small cardinalities: HLL is exact
    assert p["id"]["approx_ndv"] == 3
    assert p["s"]["approx_ndv"] == 2
    assert p["id"]["min_value"] == "1" and p["id"]["max_value"] == "3"
    assert p["s"]["min_value"] == "a" and p["s"]["max_value"] == "c"
    assert p["x"]["min_value"] == "1.5" and p["x"]["max_value"] == "4.5"
    # complex types: ndv still estimated, min/max deliberately NULL
    assert p["arr"]["approx_ndv"] == 3  # [1,2], [3], []
    assert p["arr"]["min_value"] is None and p["arr"]["max_value"] is None


def test_profile_interval_columns_get_null_minmax(spark):
    """'interval' dtypes match the 'int' PREFIX but Spark refuses
    min()/max() over calendar intervals — they must profile like the
    complex types (counts + ndv, NULL min/max) instead of crashing
    the whole-table sweep (reviewed)."""
    df = spark.range(3).select(
        F.col("id"), F.make_interval(years=F.lit(1)).alias("iv")
    )
    p = _profile_map(df)
    assert p["iv"]["n_rows"] == 3 and p["iv"]["n_nulls"] == 0
    assert p["iv"]["approx_ndv"] == 1
    assert p["iv"]["min_value"] is None and p["iv"]["max_value"] is None
    assert p["id"]["min_value"] == "0"  # plain ints still profiled


def test_profile_partition_invariant_and_bounded(spark):
    df = spark.range(5000).select(
        F.col("id"), (F.col("id") % 977).alias("k")
    )
    a = _profile_map(df.coalesce(1))
    b = _profile_map(df.repartition(13))
    assert a.keys() == b.keys()
    for c in a:
        assert a[c].asDict() == b[c].asDict(), c
    # estimate within the documented rsd envelope (use 3x slack)
    assert abs(a["k"]["approx_ndv"] - 977) <= 3 * 0.05 * 977
    assert abs(a["id"]["approx_ndv"] - 5000) <= 3 * 0.05 * 5000


def test_profile_column_subset_and_validation(spark):
    df = spark.range(10).select(F.col("id"), F.lit("x").alias("s"))
    p = _profile_map(df, columns=["s"])
    assert set(p) == {"s"} and p["s"]["approx_ndv"] == 1
    with pytest.raises(ValueError, match="no such columns"):
        profile_table(df, columns=["nope"])
    with pytest.raises(ValueError, match="no columns"):
        profile_table(df, columns=[])
