"""Flagship end-to-end pipeline (north_star deliverable order, SURVEY.md §7):

docs → decode (stems / crowns / tiles views) → cell-encode → PIP crowns→plots
→ kNN stems→crowns → zonal HSI stats + lidar CHM percentiles → outputs
(crown_stem_matches, tile_assignments, crown_features) — each stage a plain
DataFrame transform, resumable via lineage.run_stage when given a checkpoint
base dir.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geotreehealth_spark import synth
from geotreehealth_spark.docs import decode, generator
from geotreehealth_spark.operators import aggregates, pip_join, tiling, zonal


@dataclass
class PipelineOutputs:
    crown_stem_matches: DataFrame
    tile_assignments: DataFrame
    crown_features: DataFrame
    metrics: dict = field(default_factory=dict)


def run_pipeline(spark: SparkSession, sf_dir: str, with_raster: bool = True) -> PipelineOutputs:
    """Build docs from the derived views, decode them back, then run the
    spatial core — exercising the full interleaved-docs path end-to-end."""
    stems_raw = synth.stems(spark, sf_dir)
    crowns_raw = synth.crowns(spark, sf_dir)

    # docs roundtrip (the engine's real input model)
    stems = decode.decode_stems(generator.stems_to_docs(stems_raw))
    crowns_geo = generator.crowns_with_geometry(crowns_raw)
    crowns = decode.decode_crowns(generator.crowns_to_docs(crowns_geo))
    crowns = crowns.withColumnRenamed("stem_tag", "crown_stem_tag")

    # centroid columns for kNN / tie-break distances
    from geotreehealth_spark.operators.udfs import polygon_centroid_udf

    crowns = crowns.withColumn("__c", polygon_centroid_udf(F.col("geometry_wkb")))
    crowns = (
        crowns.withColumn("cx", F.col("__c")[0]).withColumn("cy", F.col("__c")[1]).drop("__c")
    )

    # 1) crown ← best contained stem (J4)
    matches = pip_join.pip_assign_best(
        stems,
        crowns,
        poly_id="crown_id",
        point_id="stem_tag",
        cell_size=25.0,
        poly_wkb="geometry_wkb",
        poly_bounds=("gxmin", "gymin", "gxmax", "gymax"),
    ).select("crown_id", "stem_tag", "dist")

    # 2) tile assignment (J12)
    tiles = tiling.tile_grid(spark, extent=1000.0, tile_size=100.0, overlap=0.0).selectExpr(
        "tile_id", "txmin", "tymin", "txmax", "tymax",
        "concat('hsi://tile/', tile_id) AS media_ref",
        "12 AS bands", "100 AS height", "100 AS width",
    )
    assignments = tiling.assign_tiles(
        crowns, tiles, bounds=("gxmin", "gymin", "gxmax", "gymax")
    ).select("crown_id", "tile_id")

    # 3) per-crown features: HSI band stats + lidar height percentiles
    lidar = synth.lidar(spark, sf_dir)
    lid_cands = pip_join.pip_join(
        lidar,
        crowns.select("crown_id", "gxmin", "gymin", "gxmax", "gymax"),
        cell_size=25.0,
        poly_wkb=None,
        poly_bounds=("gxmin", "gymin", "gxmax", "gymax"),
    )
    chm = aggregates.rank_percentile(
        lid_cands.select("crown_id", "z", "point_id"),
        key="crown_id",
        value="z",
        tie_col="point_id",
        quantiles={"z_p50": 0.5, "z_p75": 0.75, "z_p95": 0.95, "z_p99": 0.99},
    )
    if with_raster:
        hsi = zonal.zonal_raster_stats(crowns, tiles)
        features = hsi.join(chm, "crown_id", "full_outer")
    else:
        features = chm
    return PipelineOutputs(matches, assignments, features)
