"""Dump .explain("formatted") for headline queries to plans/r13/.

Usage:
    python scripts/dump_plans_r13.py before [name ...]
    python scripts/dump_plans_r13.py after  [name ...]

With no names, dumps every headline query. Plans are captured at
$SPARK_GRAFT_SF_DIR (default sf0.1) without executing the query
(planning only), so a dump run does not perturb bench numbers.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from dbd_datawarehouse_scraper_spark import get_spark  # noqa: E402
from dbd_datawarehouse_scraper_spark.queries import QUERIES  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    assert suffix in ("before", "after"), suffix
    names = sys.argv[2:] or [n for n in HEADLINE if n in QUERIES]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r13",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"dump-plans-{suffix}")
    for name in names:
        df = QUERIES[name].builder(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
