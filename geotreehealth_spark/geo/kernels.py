"""Vectorized geometry kernels (numpy only).

Replaces the reference's shapely calls — `contains`/`within`
(get_polygons.py:101, batch_sam.py:405), `intersection.area` / IoU
(batch_sam.py:150-151, from_mask_to_polygons.py:23), area/centroid
(batch_sam.py:784, tree_health_detection/utils.py:317) — with numpy
array kernels suitable for Arrow batches.

Conventions: a polygon is its exterior ring as an (k,2) float64 array with the
closing vertex repeated (as produced by wkb.decode_polygon).
"""

from __future__ import annotations

import numpy as np


def polygon_area(ring: np.ndarray) -> float:
    """Shoelace area (absolute)."""
    x, y = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    return float(abs(np.sum(x * y1 - x1 * y)) / 2.0)


def polygon_centroid(ring: np.ndarray) -> tuple[float, float]:
    """Area-weighted centroid (matches shapely's `.centroid` for polygons)."""
    x, y = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    cross = x * y1 - x1 * y
    a = np.sum(cross) / 2.0
    if abs(a) < 1e-12:  # degenerate: fall back to vertex mean
        return float(x.mean()), float(y.mean())
    cx = np.sum((x + x1) * cross) / (6.0 * a)
    cy = np.sum((y + y1) * cross) / (6.0 * a)
    return float(cx), float(cy)


def points_in_polygon(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Ray-casting point-in-polygon test, vectorized over points.

    Semantics match shapely `contains` closely enough for the reference's use
    (strict interior; boundary points are excluded on the upper edge, included
    on the lower — the synthetic fixtures avoid exact-boundary points).
    O(n_points * n_edges) numpy ops, no Python loop over points.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    # edge straddles the horizontal line through the point
    straddle = (y0[None, :] > py[:, None]) != (y1[None, :] > py[:, None])
    dy = y1 - y0
    dy = np.where(dy == 0.0, 1e-300, dy)
    x_at = x0[None, :] + (py[:, None] - y0[None, :]) * ((x1 - x0)[None, :] / dy[None, :])
    crossings = np.sum(straddle & (px[:, None] < x_at), axis=1)
    return (crossings % 2).astype(bool)


def convex_clip_area(subject: np.ndarray, clip: np.ndarray) -> float:
    """Area of subject ∩ clip via Sutherland–Hodgman.

    `clip` must be convex (the synthetic crowns are convex polygons,
    FIXTURES.md §3; axis-aligned tile windows always are). `subject` may be any
    simple polygon. Rings may wind either way.
    """
    # ensure clip is counter-clockwise
    x, y = clip[:-1, 0], clip[:-1, 1]
    x1, y1 = clip[1:, 0], clip[1:, 1]
    if np.sum(x * y1 - x1 * y) < 0:
        clip = clip[::-1]
    out = subject[:-1] if np.array_equal(subject[0], subject[-1]) else subject
    for i in range(len(clip) - 1):
        if len(out) == 0:
            return 0.0
        a, b = clip[i], clip[i + 1]
        ex, ey = b[0] - a[0], b[1] - a[1]
        # signed side of each subject vertex w.r.t. clip edge (>=0 is inside)
        sx = out[:, 0] - a[0]
        sy = out[:, 1] - a[1]
        side = ex * sy - ey * sx
        nxt = np.roll(side, -1)
        pts = []
        n = len(out)
        for j in range(n):
            cur_in = side[j] >= 0
            nxt_in = nxt[j] >= 0
            p, q = out[j], out[(j + 1) % n]
            if cur_in:
                pts.append(p)
            if cur_in != nxt_in:
                t = side[j] / (side[j] - nxt[j])
                pts.append(p + t * (q - p))
        out = np.asarray(pts) if pts else np.empty((0, 2))
    if len(out) < 3:
        return 0.0
    ring = np.vstack([out, out[:1]])
    return polygon_area(ring)


def polygon_iou(a: np.ndarray, b: np.ndarray) -> float:
    """Intersection-over-union (batch_sam.py:150-151 `calculate_overlap`)."""
    inter = convex_clip_area(a, b)
    if inter == 0.0:
        return 0.0
    union = polygon_area(a) + polygon_area(b) - inter
    return inter / union if union > 0 else 0.0


def polygon_overlap_ratio(a: np.ndarray, b: np.ndarray) -> float:
    """inter / max(areaA, areaB) — the greedy-NMS criterion
    (get_polygons.py:806-816 uses intersection over the larger area)."""
    inter = convex_clip_area(a, b)
    if inter == 0.0:
        return 0.0
    m = max(polygon_area(a), polygon_area(b))
    return inter / m if m > 0 else 0.0


def affine_transform(
    ring: np.ndarray,
    dx: float = 0.0,
    dy: float = 0.0,
    sx: float = 1.0,
    sy: float = 1.0,
    origin: tuple[float, float] = (0.0, 0.0),
) -> np.ndarray:
    """Translate + scale about an origin (shapely.affinity translate/scale,
    delineation_pipeline.py:92, delineation_utils.py:129-143). Pure column
    math on the ring array."""
    ox, oy = origin
    out = np.empty_like(ring)
    out[:, 0] = (ring[:, 0] - ox) * sx + ox + dx
    out[:, 1] = (ring[:, 1] - oy) * sy + oy + dy
    return out


def _dp_keep(arr: np.ndarray, i0: int, i1: int, tolerance: float, acc: set) -> None:
    """Douglas–Peucker recursion: mark interior points farther than tolerance
    from the chord (i0, i1)."""
    if i1 <= i0 + 1:
        return
    a, b = arr[i0], arr[i1]
    ab = b - a
    norm = np.hypot(ab[0], ab[1])
    seg = arr[i0 + 1 : i1]
    if norm == 0.0:
        d = np.hypot(seg[:, 0] - a[0], seg[:, 1] - a[1])
    else:
        d = np.abs(ab[0] * (a[1] - seg[:, 1]) - ab[1] * (a[0] - seg[:, 0])) / norm
    i = int(np.argmax(d))
    if d[i] > tolerance:
        j = i0 + 1 + i
        acc.add(j)
        _dp_keep(arr, i0, j, tolerance, acc)
        _dp_keep(arr, j, i1, tolerance, acc)


def simplify_ring(ring: np.ndarray, tolerance: float) -> np.ndarray:
    """Douglas–Peucker simplification of a closed ring (shapely
    simplify(0.1), delineation_pipeline.py:169). The ring is split at its
    first vertex and the vertex farthest from it (the standard closed-ring
    anchoring), each open chain simplified, then re-closed."""
    pts = ring[:-1] if np.array_equal(ring[0], ring[-1]) else ring
    if len(pts) <= 3:
        return np.vstack([pts, pts[:1]])
    d0 = np.hypot(pts[:, 0] - pts[0, 0], pts[:, 1] - pts[0, 1])
    far = int(np.argmax(d0))
    half1 = pts[: far + 1]
    half2 = np.vstack([pts[far:], pts[:1]])
    keep1: set = {0, len(half1) - 1}
    keep2: set = {0, len(half2) - 1}
    _dp_keep(half1, 0, len(half1) - 1, tolerance, keep1)
    _dp_keep(half2, 0, len(half2) - 1, tolerance, keep2)
    out = np.vstack([half1[sorted(keep1)], half2[sorted(keep2)][1:-1]])
    return np.vstack([out, out[:1]])


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew monotone-chain convex hull → closed CCW ring (k,2).

    Used by the deterministic crown-polygon generator (star vertices → hull)
    so every synthetic crown is convex and convex_clip_area stays exact.
    """
    pts = np.unique(points, axis=0)  # sorts lexicographically (x, then y)
    if len(pts) <= 2:
        return np.vstack([pts, pts[:1]])

    def half(seq):
        out = []
        for p in seq:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-1]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    ring = np.asarray(lower[:-1] + upper[:-1])
    return np.vstack([ring, ring[:1]])
