"""Dump .explain("formatted") for registered queries into plans/<tag>/.

Usage: python tools/dump_plans.py <tag> [suffix] [query ...]
  tag     subdirectory under plans/ (e.g. r06)
  suffix  'before' or 'after' (default 'before')
  query   subset of query names (default: all registered queries)

Judge evidence for OPTIMIZATION_r*.md: each file is the formatted physical
plan of the query as built (pre-execution, AQE isFinalPlan=false) at the
bench sf dir — enough to verify Exchange counts, join strategies, scan
pushdown, and Python-boundary nodes without running Spark.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from geotreehealth_spark.session import get_spark  # noqa: E402
from tools.plan_audit import plan_string  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r06"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="plan-dump", cores=8)
    queries = entrymod.queries()
    if not names:
        names = list(queries)
    for name in names:
        try:
            p = plan_string(queries[name](spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            p = f"ERROR {type(e).__name__}: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(p)
        print(f"wrote {path} ({len(p)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
