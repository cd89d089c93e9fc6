"""Zonal raster extraction parity vs a sequential numpy oracle (A6)."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from geotreehealth_spark import media, synth
from geotreehealth_spark.docs import generator
from geotreehealth_spark.geo import wkb
from geotreehealth_spark.operators import tiling, zonal
from tests.conftest import SF_DIR


def test_rasterize_mask_square():
    # golden analog of the reference's square-mask test
    # (tests/get_polygons_tests.py:13-33): 50x50 square → exactly 2500 px at 1 m res
    ring = np.array([[10.0, 10.0], [60.0, 10.0], [60.0, 60.0], [10.0, 60.0], [10.0, 10.0]])
    rr, cc, ok = media.rasterize_mask(ring, 0.0, 100.0, 100, 100, 1.0, 1.0)
    assert ok and len(rr) == 2500


def test_zonal_raster_parity(spark):
    # deterministic sample (limit() picks different rows per evaluation on
    # the multi-partition ingest): ~300 crowns
    crowns = synth.crowns(spark, SF_DIR).where(F.col("crown_key") % 15 == 0)
    geo = generator.crowns_with_geometry(crowns)
    tiles = tiling.tile_grid(spark, extent=1000.0, tile_size=100.0, overlap=0.0).selectExpr(
        "tile_id", "txmin", "tymin", "txmax", "tymax",
        "concat('hsi://tile/', tile_id) AS media_ref",
        "12 AS bands", "100 AS height", "100 AS width",
    )
    got = zonal.zonal_raster_stats(geo, tiles).toPandas().set_index("crown_id")

    pdf = geo.select("crown_id", "geometry_wkb").toPandas()
    checked = 0
    for row in pdf.itertuples():
        ring = wkb.decode_polygon(row.geometry_wkb)
        xmin, ymin = ring.min(axis=0)
        xmax, ymax = ring.max(axis=0)
        vals = []
        for ti in range(100):
            tx0, ty0 = (ti % 10) * 100.0, (ti // 10) * 100.0
            if xmin >= tx0 + 100 or xmax <= tx0 or ymin >= ty0 + 100 or ymax <= ty0:
                continue
            cube = media.resolve_raster(f"hsi://tile/{ti}", 12, 100, 100).astype(np.float64)
            rr, cc, ok = media.rasterize_mask(ring, tx0, ty0 + 100.0, 100, 100, 1.0, 1.0)
            if ok:
                vals.append(cube[:, rr, cc])
        if not vals:
            assert row.crown_id not in got.index
            continue
        allv = np.concatenate(vals, axis=1)
        g = got.loc[row.crown_id]
        assert g.n_px == allv.shape[1]
        np.testing.assert_allclose(np.asarray(g.band_mean), allv.mean(axis=1), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(g.band_std), allv.std(axis=1), rtol=1e-9)
        checked += 1
    assert checked > 200


def test_zonal_overlapping_tiles_exactly_once(spark):
    """With a 10 m overlap manifest + core_bounds ownership, results must
    equal the abutting-grid run (each pixel counted exactly once)."""
    # deterministic sample (limit() picks different rows per evaluation on
    # the multi-partition ingest): ~300 crowns
    crowns = synth.crowns(spark, SF_DIR).where(F.col("crown_key") % 15 == 0)
    geo = generator.crowns_with_geometry(crowns)

    def manifest(overlap):
        return tiling.tile_grid(
            spark, extent=1000.0, tile_size=100.0, overlap=overlap
        ).selectExpr(
            "tile_id", "txmin", "tymin", "txmax", "tymax",
            "cxmin", "cymin", "cxmax", "cymax",
            "concat('hsic://tile/', CAST(tile_key AS STRING)) AS media_ref",
            "4 AS bands",
            # buffered windows are wider: keep 1 m pixels
            f"CAST({100 + 2 * overlap} AS INT) AS height",
            f"CAST({100 + 2 * overlap} AS INT) AS width",
        )

    core = ("cxmin", "cymin", "cxmax", "cymax")
    flat = (
        zonal.zonal_raster_stats(geo, manifest(0.0), n_bands=4, core_bounds=core)
        .toPandas()
        .set_index("crown_id")
        .sort_index()
    )
    buffered = (
        zonal.zonal_raster_stats(geo, manifest(10.0), n_bands=4, core_bounds=core)
        .toPandas()
        .set_index("crown_id")
        .sort_index()
    )
    assert list(flat.index) == list(buffered.index)
    assert (flat.n_px == buffered.n_px).all()
    for cid in flat.index:
        np.testing.assert_allclose(
            np.asarray(flat.loc[cid].band_mean),
            np.asarray(buffered.loc[cid].band_mean),
            rtol=1e-12,
        )
