"""ivf_build_maintenance audit (r12 verdict item 9): confirm the kmeans
fit and the partitioned write don't re-featurize/re-scan the vec
relation more than the two inherent passes (fit sample + assignment
write), by counting the embeddings scans in the assignment-write plan
and the jobs the fit runs.

Run: python scripts/ivf_build_audit_r13.py
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from dbd_datawarehouse_scraper_spark import get_spark
    from dbd_datawarehouse_scraper_spark.operators.clustering import (
        _assign_to_centers,
        kmeans_fit,
    )

    spark = get_spark(app_name="ivf-build-audit")
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    sc = spark.sparkContext

    # the fit: content-hash sample + driver Lloyd's — count its jobs
    t = sc.statusTracker()
    before = len(t.getJobIdsForGroup(None) or [])
    centers = kmeans_fit(e, vec_col="embedding", n_clusters=8, seed=42)
    after = len(t.getJobIdsForGroup(None) or [])
    print(f"kmeans_fit spark jobs: {after - before}")

    assigned = _assign_to_centers(
        e.select("vec_id", "embedding"), "embedding", centers
    ).withColumnRenamed("cluster", "_list")
    plan_df = assigned.repartition("_list")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    # count operators in the plan TREE only — the formatted details
    # section repeats each operator name once more
    tree = plan.split("\n\n")[0]
    n_scans = tree.count("Scan parquet")
    n_python = tree.count("EvalPython") + tree.count("MapInArrow")
    print(f"assignment-write plan: {n_scans} embeddings scan(s), "
          f"{n_python} Python node(s)")
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r13", "ivf_build_assignment_plan.txt",
    )
    with open(out, "w") as f:
        f.write(plan)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
