"""Arrow-batched pandas UDFs bridging Spark columns to the numpy geo kernels.

These are the ONLY Python boundaries in the engine (north_star: "no per-row
Python"). Each UDF is vectorized over the whole Arrow batch; the PIP refine UDF
additionally amortizes polygon decoding by factorizing on the WKB bytes within
a batch (many rows share a polygon after a cell join).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from geotreehealth_spark.geo import cells, kernels, wkb


def make_cell_encode_udf(cell_size: float):
    """(x, y) → Morton cell_id at the given resolution."""

    @pandas_udf(LongType())
    def cell_encode_udf(x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series(cells.cell_encode(x.to_numpy(), y.to_numpy(), cell_size))

    return cell_encode_udf


def make_covering_cells_udf(cell_size: float):
    """(xmin, ymin, xmax, ymax) → array of covering cell_ids (for explode)."""

    @pandas_udf(ArrayType(LongType()))
    def covering_cells_udf(
        xmin: pd.Series, ymin: pd.Series, xmax: pd.Series, ymax: pd.Series
    ) -> pd.Series:
        rows, cell_ids = cells.cells_covering_bbox(
            xmin.to_numpy(), ymin.to_numpy(), xmax.to_numpy(), ymax.to_numpy(), cell_size
        )
        out = [[] for _ in range(len(xmin))]
        for r, c in zip(rows.tolist(), cell_ids.tolist()):
            out[r].append(c)
        return pd.Series(out)

    return covering_cells_udf


def make_covering_cells_xy_udf(cell_size: float):
    """Like make_covering_cells_udf but emits struct(cell, gx, gy) so that
    downstream canonical-cell checks (pair dedup) can run as pure JVM
    floor-division arithmetic instead of another Python roundtrip."""

    @pandas_udf(
        ArrayType(
            StructType(
                [
                    StructField("cell", LongType()),
                    StructField("gx", LongType()),
                    StructField("gy", LongType()),
                ]
            )
        )
    )
    def covering_cells_xy_udf(
        xmin: pd.Series, ymin: pd.Series, xmax: pd.Series, ymax: pd.Series
    ) -> pd.Series:
        rows, cell_ids = cells.cells_covering_bbox(
            xmin.to_numpy(), ymin.to_numpy(), xmax.to_numpy(), ymax.to_numpy(), cell_size
        )
        gx, gy = cells.cell_decode(cell_ids)
        out = [[] for _ in range(len(xmin))]
        for r, c, x, y in zip(rows.tolist(), cell_ids.tolist(), gx.tolist(), gy.tolist()):
            out[r].append((c, x, y))
        return pd.Series(out)

    return covering_cells_xy_udf


def make_ring_cells_udf(cell_size: float, ring: int):
    """(x, y) → array of cell_ids within `ring` steps of the point's cell."""

    @pandas_udf(ArrayType(LongType()))
    def ring_cells_udf(x: pd.Series, y: pd.Series) -> pd.Series:
        base = cells.cell_encode(x.to_numpy(), y.to_numpy(), cell_size)
        codes = cells.cell_ring(base, ring)
        return pd.Series([row[row >= 0].tolist() for row in codes])

    return ring_cells_udf


@pandas_udf(BooleanType())
def pip_udf(geom_wkb: pd.Series, px: pd.Series, py: pd.Series) -> pd.Series:
    """Exact point-in-polygon refine; polygon decode amortized per unique WKB."""
    out = np.zeros(len(geom_wkb), dtype=bool)
    pxv = px.to_numpy(dtype=np.float64)
    pyv = py.to_numpy(dtype=np.float64)
    codes, uniques = pd.factorize(geom_wkb)
    for gi, w in enumerate(uniques):
        mask = codes == gi
        ring = wkb.decode_polygon(w)
        out[mask] = kernels.points_in_polygon(pxv[mask], pyv[mask], ring)
    return pd.Series(out)


def _decode_cached(series: pd.Series) -> list:
    """Decode a WKB column with per-batch memoization — each polygon appears
    in many candidate pairs, so decode once per unique buffer."""
    codes, uniques = pd.factorize(series)
    rings = [wkb.decode_polygon(u) for u in uniques]
    return [rings[c] for c in codes]


@pandas_udf(DoubleType())
def iou_udf(wkb_a: pd.Series, wkb_b: pd.Series) -> pd.Series:
    """Pairwise polygon IoU (batch_sam.py:150-151 calculate_overlap)."""
    ra = _decode_cached(wkb_a)
    rb = _decode_cached(wkb_b)
    return pd.Series([kernels.polygon_iou(a, b) for a, b in zip(ra, rb)])


@pandas_udf(DoubleType())
def overlap_ratio_udf(wkb_a: pd.Series, wkb_b: pd.Series) -> pd.Series:
    """inter / max(areaA, areaB) — greedy-NMS criterion (get_polygons.py:806-816)."""
    ra = _decode_cached(wkb_a)
    rb = _decode_cached(wkb_b)
    return pd.Series([kernels.polygon_overlap_ratio(a, b) for a, b in zip(ra, rb)])


@pandas_udf(BinaryType())
def point_wkb_udf(x: pd.Series, y: pd.Series) -> pd.Series:
    return pd.Series(wkb.encode_points(x.to_numpy(), y.to_numpy()))


@pandas_udf(BinaryType())
def box_wkb_udf(
    xmin: pd.Series, ymin: pd.Series, xmax: pd.Series, ymax: pd.Series
) -> pd.Series:
    """Axis-aligned box → WKB Polygon ring (CCW, closed)."""
    out = []
    for x0, y0, x1, y1 in zip(xmin, ymin, xmax, ymax):
        ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])
        out.append(wkb.encode_polygon(ring))
    return pd.Series(out)


@pandas_udf(DoubleType())
def polygon_area_udf(geom_wkb: pd.Series) -> pd.Series:
    return pd.Series([kernels.polygon_area(wkb.decode_polygon(w)) for w in geom_wkb])


@pandas_udf(ArrayType(DoubleType()))
def polygon_centroid_udf(geom_wkb: pd.Series) -> pd.Series:
    return pd.Series([list(kernels.polygon_centroid(wkb.decode_polygon(w))) for w in geom_wkb])


@pandas_udf(ArrayType(DoubleType()))
def polygon_bounds_udf(geom_wkb: pd.Series) -> pd.Series:
    xmin, ymin, xmax, ymax = wkb.polygon_bounds(list(geom_wkb))
    return pd.Series(np.stack([xmin, ymin, xmax, ymax], axis=1).tolist())
