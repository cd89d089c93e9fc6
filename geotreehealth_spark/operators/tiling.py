"""Tile grid generation and tile assignment (SURVEY.md S5/J12/P7).

Reference semantics:
- split_raster produces overlapping windows (batch_sam.py:359, buffer
  get_polygons.py:603-615, config.py:42); a crown belongs to every tile whose
  window its bbox overlaps (get_polygons.py:625-639).
- boundary filter: drop polygons whose bbox comes within `margin` of the tile
  core edge (batch_sam.py:563-568, 645-648) — dedups the overlap zone when
  compositing per-tile outputs (batch_sam.py:629-662).

Physical plan: the tile manifest is tiny (grid rows) → broadcast nested-loop
range join; zero shuffle of the big side. At 10^12-doc scale the manifest stays
small relative to data (tiles ~ extent²/tile_size²) and Iceberg partitioning on
tile_id turns downstream per-tile work into partition-pruned scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tile_grid(
    spark,
    extent: float = 1000.0,
    tile_size: float = 100.0,
    overlap: float = 10.0,
) -> DataFrame:
    """Deterministic tile manifest: row-major ids, overlap-buffered windows
    (txmin..tymax) plus the OWNED core window (cxmin..cymax) that zonal ops
    use for exactly-once pixel coverage when overlap > 0."""
    n = int(extent / tile_size)
    return spark.sql(
        f"""
        SELECT CAST(i AS STRING) AS tile_id,
               i AS tile_key,
               (i % {n}) * {tile_size}e0 - {overlap}e0 AS txmin,
               CAST(FLOOR(i / {n}) AS BIGINT) * {tile_size}e0 - {overlap}e0 AS tymin,
               (i % {n}) * {tile_size}e0 + {tile_size + overlap}e0 AS txmax,
               CAST(FLOOR(i / {n}) AS BIGINT) * {tile_size}e0 + {tile_size + overlap}e0 AS tymax,
               (i % {n}) * {tile_size}e0 AS cxmin,
               CAST(FLOOR(i / {n}) AS BIGINT) * {tile_size}e0 AS cymin,
               (i % {n}) * {tile_size}e0 + {tile_size}e0 AS cxmax,
               CAST(FLOOR(i / {n}) AS BIGINT) * {tile_size}e0 + {tile_size}e0 AS cymax
        FROM (SELECT explode(sequence(0, {n * n - 1})) AS i)
        """
    )


def assign_tiles(
    df: DataFrame,
    tiles: DataFrame,
    bounds: tuple[str, str, str, str] = ("xmin", "ymin", "xmax", "ymax"),
    tile_bounds: tuple[str, str, str, str] = ("txmin", "tymin", "txmax", "tymax"),
) -> DataFrame:
    """J12: rows × overlapping tiles (bbox strict-overlap, broadcast join)."""
    x0, y0, x1, y1 = bounds
    tx0, ty0, tx1, ty1 = tile_bounds
    pred = (
        (F.col(x0) < F.col(tx1))
        & (F.col(x1) > F.col(tx0))
        & (F.col(y0) < F.col(ty1))
        & (F.col(y1) > F.col(ty0))
    )
    return df.join(F.broadcast(tiles), pred)


def translate_to_window(
    df: DataFrame,
    x: str,
    y: str,
    origin_x: str,
    top_y: str,
    out: tuple[str, str] = ("wx", "wy"),
) -> DataFrame:
    """P6: world → window-frame coordinates with the raster y-flip
    (get_polygons.py:540-548, 626-628; full_image_sam.py:19-27):
    wx = x - window_left, wy = window_top - y. Pure column arithmetic."""
    return df.withColumn(out[0], F.col(x) - F.col(origin_x)).withColumn(
        out[1], F.col(top_y) - F.col(y)
    )


def boundary_filter(
    assigned: DataFrame,
    margin: float = 0.5,
    bounds: tuple[str, str, str, str] = ("xmin", "ymin", "xmax", "ymax"),
    tile_bounds: tuple[str, str, str, str] = ("txmin", "tymin", "txmax", "tymax"),
) -> DataFrame:
    """P7: keep rows whose bbox stays `margin` inside the tile window."""
    x0, y0, x1, y1 = bounds
    tx0, ty0, tx1, ty1 = tile_bounds
    return assigned.where(
        (F.col(x0) >= F.col(tx0) + margin)
        & (F.col(y0) >= F.col(ty0) + margin)
        & (F.col(x1) <= F.col(tx1) - margin)
        & (F.col(y1) <= F.col(ty1) - margin)
    )
