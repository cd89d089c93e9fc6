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
from pyspark.sql.types import ArrayType, BinaryType, BooleanType, DoubleType

from geotreehealth_spark.geo import kernels, wkb

# NOTE: cell encode / covering-cells / ring-cells UDFs were retired in round
# 2 — join-path cell arithmetic is pure Catalyst now (geo/cellexprs.py); the
# Morton transform (geo/cells.py) remains for write-time file ordering.


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
    """Axis-aligned box → WKB Polygon ring (CCW, closed).

    r6: encoded as one vectorized (n, 93)-byte buffer instead of a per-row
    python loop — same 93-byte LE layout (header <bIII 1,3,1,5> + 5 closed
    CCW vertices) byte-for-byte; the loop cost ~3 us/row over the 600k-crown
    zonal input."""
    n = len(xmin)
    x0 = xmin.to_numpy(dtype=np.float64)
    y0 = ymin.to_numpy(dtype=np.float64)
    x1 = xmax.to_numpy(dtype=np.float64)
    y1 = ymax.to_numpy(dtype=np.float64)
    buf = np.empty((n, 93), dtype=np.uint8)
    import struct

    buf[:, 0:13] = np.frombuffer(struct.pack("<bIII", 1, 3, 1, 5), dtype=np.uint8)
    coords = np.empty((n, 10), dtype="<f8")
    coords[:, 0], coords[:, 1] = x0, y0
    coords[:, 2], coords[:, 3] = x1, y0
    coords[:, 4], coords[:, 5] = x1, y1
    coords[:, 6], coords[:, 7] = x0, y1
    coords[:, 8], coords[:, 9] = x0, y0
    buf[:, 13:93] = coords.view(np.uint8)
    raw = buf.tobytes()
    return pd.Series([raw[i * 93 : (i + 1) * 93] for i in range(n)])


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
