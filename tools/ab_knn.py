"""A/B knn_join / quadrant_knn_join variants interleaved in ONE session.

Usage: python tools/ab_knn.py [--passes N] [--sf DIR]

Times q_knn / q_knn_quadrant-shaped calls with different prologue_rings in
the same session, interleaved (variant A pass 0, variant B pass 0, A pass 1,
...), min-of-N per variant — removes the cross-session window drift that
poisoned the r5 quadrant claim (VERDICT r5 "What's wrong" 1).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from geotreehealth_spark import synth  # noqa: E402
from geotreehealth_spark.operators import knn  # noqa: E402
from geotreehealth_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    passes = 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    i = 0
    while i < len(args):
        if args[i] == "--passes":
            passes = int(args[i + 1]); i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            i += 1
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(app_name="ab-knn", cores=cpus)

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

    def q_knn(rings, cell=None):
        stems = synth.stems(spark, sf_dir).where(F.col("stem_key") % 50 == 0)
        crowns = synth.crowns(spark, sf_dir).drop("stem_tag")
        return knn.knn_join(
            stems, crowns, k=6, left_id="stem_tag", right_id="crown_id",
            prologue_rings=rings, cell_size=cell,
        ).select("stem_tag", "crown_id", "dist", "knn_rank")

    def q_quad(rings, cell=None):
        stems = synth.stems(spark, sf_dir).where(F.col("stem_key") % 50 == 0)
        crowns = synth.crowns(spark, sf_dir).drop("stem_tag")
        return knn.quadrant_knn_join(
            stems, crowns, left_id="stem_tag", right_id="crown_id", min_dist=3.0,
            prologue_rings=rings, cell_size=cell,
        ).select("stem_tag", "quadrant", "crown_id", "dist")

    # quadrant default cell at sf0.1 is 4*sqrt(1/0.6)=5.164; knn default is
    # 1.25*sqrt(6/0.6)=3.953
    variants = [
        ("quad r=(1,)", lambda: q_quad((1,))),
        ("quad r=(1,4)", lambda: q_quad((1, 4))),
    ]
    best: dict[str, float] = {}
    rows: dict[str, int] = {}
    for p in range(passes):
        for name, fn in variants:
            t0 = time.time()
            n = fn().count()
            dt = time.time() - t0
            best[name] = min(best.get(name, 1e9), dt)
            rows[name] = n
            print(f"# pass{p} {name}: {dt:.2f}s rows={n}", flush=True)
            release_caches()
    for name, _ in variants:
        print(f"MIN {name}: {best[name]:.2f}s rows={rows[name]}")
    spark.stop()


if __name__ == "__main__":
    main()
