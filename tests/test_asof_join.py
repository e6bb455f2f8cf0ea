"""asof_join directions vs pandas merge_asof on randomized data.

The DuckDB oracle already pins all three directions at the driver
level; this adds a property-style unit check against an independent
implementation (pandas) with keys missing on either side, equal
timestamps, and out-of-range probes."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dbd_datawarehouse_scraper_spark.operators.joins import asof_join


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(7)
    n_l, n_r = 400, 300
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 8, n_l),          # key 7 absent on right
            "ts": rng.integers(0, 1000, n_l),
            "lval": np.arange(n_l),
        }
    )
    right = (
        pd.DataFrame(
            {
                "k": rng.integers(0, 7, n_r),
                "ts": rng.integers(0, 1000, n_r),
                "rval": np.arange(n_r),
            }
        )
        # right must be unique per (k, ts): keep min rval like the
        # operator contract requires
        .sort_values(["k", "ts", "rval"])
        .drop_duplicates(["k", "ts"])
        .reset_index(drop=True)
    )
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_matches_pandas(spark, frames, direction):
    left, right = frames
    l_df = spark.createDataFrame(left.astype({"k": int, "ts": int, "lval": int}))
    r_df = spark.createDataFrame(right.astype({"k": int, "ts": int, "rval": int}))
    got = (
        asof_join(
            l_df, r_df, key="k", left_ts="ts", right_ts="ts",
            right_cols=("rval",), direction=direction,
        )
        .select("lval", "asof_rval")
        .collect()
    )
    got_map = {r["lval"]: r["asof_rval"] for r in got}

    expected = pd.merge_asof(
        left.sort_values("ts", kind="stable"),
        right.sort_values("ts", kind="stable"),
        on="ts",
        by="k",
        direction=direction,
        allow_exact_matches=True,
    )
    exp_map = {
        int(r.lval): (None if pd.isna(r.rval) else int(r.rval))
        for r in expected.itertuples()
    }
    assert len(got_map) == len(left)
    mismatches = {
        lv: (got_map[lv], exp_map[lv])
        for lv in exp_map
        if got_map[lv] != exp_map[lv]
    }
    # 'nearest' tie-break: our operator prefers backward on equal
    # distance, pandas also prefers backward — sets must agree exactly
    assert not mismatches, f"{direction}: {list(mismatches.items())[:5]}"


def test_asof_unknown_direction_raises(spark, frames):
    left, right = frames
    l_df = spark.createDataFrame(left)
    r_df = spark.createDataFrame(right)
    with pytest.raises(ValueError, match="direction"):
        asof_join(
            l_df, r_df, key="k", left_ts="ts", right_ts="ts",
            right_cols=("rval",), direction="sideways",
        )
