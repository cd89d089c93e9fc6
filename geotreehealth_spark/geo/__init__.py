"""Pure-numpy geometry layer: WKB codec, Morton cell index, vectorized kernels.

No shapely / GEOS dependency — the sandbox has none, and the kernels the
reference needs (PIP, area, centroid, convex clip IoU, distance) are small
enough to implement vectorized from scratch. All functions operate on numpy
arrays so they stay Arrow-batch-friendly inside pandas UDFs.
"""

from geotreehealth_spark.geo.wkb import (  # noqa: F401
    decode_points,
    decode_polygon,
    decode_polygons,
    encode_point,
    encode_points,
    encode_polygon,
    polygon_bounds,
)
from geotreehealth_spark.geo.cells import (  # noqa: F401
    cell_encode,
    cell_ring,
    cells_covering_bbox,
    morton_interleave,
)
from geotreehealth_spark.geo.kernels import (  # noqa: F401
    clip_area,
    convex_clip_area,
    is_convex,
    points_in_polygon,
    polygon_area,
    polygon_centroid,
    polygon_iou,
    polygon_overlap_ratio,
    repair_ring,
    triangulate_ring,
)
