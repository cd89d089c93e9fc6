"""Batch-incremental checkpointing: per-partition lineage + metrics + resume.

north_rule: "resumable from checkpoint with per-partition lineage + metrics".
The reference is batch-only (SURVEY.md §2.8) so this maps to stage-level
incremental recompute, not Structured Streaming:

- every pipeline stage writes its output parquet PARTITIONED BY a stable
  `part_key` (e.g. coarse cell id or tile id);
- alongside, a lineage table records (stage, part_key, input_fingerprint,
  row_count, wall_ms, completed_at_ns);
- a restarted job anti-joins its input partitions against completed lineage
  rows and recomputes ONLY missing/stale partitions, then unions with the
  checkpointed output.

The input_fingerprint is a deterministic hash of the partition's input rows
(xor-aggregated row hashes — order-independent), so a changed input partition
is detected and recomputed, which is exactly Iceberg-snapshot semantics
expressed over plain parquet (SURVEY.md §7 hazard 5: Iceberg jar unavailable
in the sandbox; the catalog module keeps the swap one line).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_DIR = "_lineage"


def partition_fingerprints(df: DataFrame, part_key: str) -> DataFrame:
    """(part_key, input_fingerprint, input_rows) — order-independent xor hash."""
    hashed = df.withColumn("__h", F.xxhash64(*[F.col(c) for c in df.columns]))
    return hashed.groupBy(part_key).agg(
        # xor-fold via sum of (h mod large prime) is NOT collision-safe; use
        # bit_xor aggregate (order-independent, exact)
        F.expr("bit_xor(__h)").alias("input_fingerprint"),
        F.count("*").alias("input_rows"),
    )


def _lineage_path(base: str, stage: str) -> str:
    return os.path.join(base, LINEAGE_DIR, stage)


def read_lineage(spark: SparkSession, base: str, stage: str) -> DataFrame | None:
    path = _lineage_path(base, stage)
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def run_stage(
    spark: SparkSession,
    stage: str,
    inputs: DataFrame,
    part_key: str,
    compute,
    base: str,
) -> DataFrame:
    """Run `compute(partition_subset_df) -> DataFrame` incrementally.

    Returns the full stage output (checkpointed parts + newly computed parts).
    compute must be deterministic per partition (all engine operators are).
    """
    out_path = os.path.join(base, stage)
    fps = partition_fingerprints(inputs, part_key)
    done = read_lineage(spark, base, stage)
    if done is not None:
        fresh = fps.join(
            done.select(part_key, "input_fingerprint"),
            [part_key, "input_fingerprint"],
            "left_anti",
        )
    else:
        fresh = fps
    fresh_keys = [r[0] for r in fresh.select(part_key).collect()]

    if fresh_keys:
        t0 = time.time()
        subset = inputs.join(
            F.broadcast(fresh.select(part_key)), part_key, "left_semi"
        )
        result = compute(subset)
        (
            result.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(part_key)
            .parquet(out_path)
        )
        wall_ms = int((time.time() - t0) * 1000)
        out_now = spark.read.parquet(out_path).join(
            F.broadcast(fresh.select(part_key)), part_key, "left_semi"
        )
        counts = out_now.groupBy(part_key).agg(F.count("*").alias("row_count"))
        lineage_rows = (
            fresh.join(counts, part_key, "left")
            .withColumn("row_count", F.coalesce(F.col("row_count"), F.lit(0)))
            .withColumn("stage", F.lit(stage))
            .withColumn("wall_ms", F.lit(wall_ms))
            .withColumn("completed_at_ns", F.lit(time.time_ns()))
        )
        lineage_rows.write.mode("append").parquet(_lineage_path(base, stage))
    return spark.read.parquet(out_path)
