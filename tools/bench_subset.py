"""Time a subset of the registered queries with bench.py's exact protocol.

Usage: python tools/bench_subset.py q1 [q2 ...] [--passes N] [--sf DIR]

Same session config, warmup, interleaved min-of-N passes, and cache release
as bench.py — produced numbers are comparable to BENCH_r*.json entries. Used
for the idle-host spot-reruns of individual queries (VERDICT r4 "What's
wrong" 4) and for A/B timing of operator variants without paying the full
35-query headline sweep.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from geotreehealth_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    passes = 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--passes":
            passes = int(args[i + 1]); i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(app_name="geotreehealth-bench-subset", cores=cpus)
    queries = entrymod.queries()
    unknown = [n for n in names if n not in queries]
    assert not unknown, f"unknown queries: {unknown}"

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

    per_query: dict[str, float] = {}
    for p in range(passes):
        for name in names:
            t0 = time.time()
            n = queries[name](spark, sf_dir).count()
            dt = time.time() - t0
            prev = per_query.get(name)
            per_query[name] = round(dt if prev is None else min(prev, dt), 3)
            print(f"# pass{p} {name}: {dt:.2f}s rows={n}", file=sys.stderr)
            release_caches()

    print(json.dumps({"queries": per_query, "sf_dir": sf_dir, "cpus": cpus,
                      "passes": passes}))
    spark.stop()


if __name__ == "__main__":
    main()
