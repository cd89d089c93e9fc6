"""Split a query's wall time into plan-build / optimize / execute phases.

Usage: python tools/profile_query.py <query> [--sf DIR] [--passes N]

For each pass prints:
  build   - python-side DataFrame construction (lazy)
  explain - analysis + optimization + physical planning (explainString cost)
  count   - full execution via .count() (bench protocol)
Helps decide whether a slow bench entry is driver/planning-bound or
execution-bound before touching the operator (guide §1 / §7.3).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from geotreehealth_spark.session import get_spark  # noqa: E402
from tools.plan_audit import plan_string  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    passes = 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--passes":
            passes = int(args[i + 1]); i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(app_name="profile-query", cores=cpus)
    queries = entrymod.queries()

    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def _warm(v):
        return v

    spark.range(100000).select(F.sum(_warm(F.col("id")))).collect()
    spark.read.parquet(f"{sf_dir}/orders.parquet").count()

    def release_caches() -> None:
        spark.catalog.clearCache()
        jsc = spark.sparkContext._jsc
        for rdd in jsc.getPersistentRDDs().values():
            rdd.unpersist()

    for p in range(passes):
        for name in names:
            t0 = time.time()
            df = queries[name](spark, sf_dir)
            t_build = time.time() - t0
            t0 = time.time()
            plan_string(df)
            t_explain = time.time() - t0
            t0 = time.time()
            n = df.count()
            t_count = time.time() - t0
            print(
                f"pass{p} {name}: build={t_build:.2f}s explain={t_explain:.2f}s "
                f"count={t_count:.2f}s rows={n}",
                flush=True,
            )
            release_caches()
    spark.stop()


if __name__ == "__main__":
    main()
