"""Hierarchical grid cell index (Morton / Z-order), numpy-vectorized.

Plays the role of the reference's R-tree candidate pruning
(from_mask_to_polygons.py:11-13, get_polygons.py:806-812,
delineation_utils.py:119-120) and of H3/S2 in the north_star: a deterministic
integer `cell_id` that turns spatial joins into equi-joins. Pure integer
bit-twiddling — no external h3/s2 wheel — behind an API (`cell_encode(x, y,
cell_size)`) that a real H3 lib could drop into.

Cell id layout: Morton-interleaved (ix, iy) at a fixed cell_size in site
coordinates. Morton order keeps spatially-near cells numerically near, which
gives Iceberg/parquet files sorted by cell_id good locality (SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the lower 32 bits of v into even bit positions (uint64)."""
    v = v.astype(np.uint64)
    v &= np.uint64(0xFFFFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def morton_interleave(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    """(ix, iy) int arrays → int64 Morton code (ix in even bits)."""
    code = _part1by1(np.asarray(ix)) | (_part1by1(np.asarray(iy)) << np.uint64(1))
    return code.astype(np.int64)


def cell_encode(x: np.ndarray, y: np.ndarray, cell_size: float) -> np.ndarray:
    """Point coordinates → Morton cell id at the given cell size (meters).

    Negative coordinates are clamped to 0 — the synthetic site frame is
    [0, extent) by construction (FIXTURES.md §2).
    """
    ix = np.maximum(np.floor(np.asarray(x) / cell_size), 0).astype(np.int64)
    iy = np.maximum(np.floor(np.asarray(y) / cell_size), 0).astype(np.int64)
    return morton_interleave(ix, iy)


def cell_decode(cell_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Morton id → (ix, iy)."""
    v = np.asarray(cell_id).astype(np.uint64)

    def compact(u: np.ndarray) -> np.ndarray:
        u &= np.uint64(0x5555555555555555)
        u = (u | (u >> np.uint64(1))) & np.uint64(0x3333333333333333)
        u = (u | (u >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        u = (u | (u >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
        u = (u | (u >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
        u = (u | (u >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
        return u.astype(np.int64)

    return compact(v.copy()), compact(v >> np.uint64(1))


def cell_ring(cell_id: np.ndarray, ring: int = 1) -> np.ndarray:
    """k-ring expansion: for each cell, all cells within `ring` steps (incl. self).

    Returns shape (n, (2*ring+1)**2) int64. Used to build kNN candidate sets
    (SURVEY.md J5: "join stems to neighbor-cell ring").
    """
    ix, iy = cell_decode(cell_id)
    offs = np.arange(-ring, ring + 1)
    dx, dy = np.meshgrid(offs, offs, indexing="ij")
    nx = ix[:, None] + dx.ravel()[None, :]
    ny = iy[:, None] + dy.ravel()[None, :]
    valid = (nx >= 0) & (ny >= 0)
    nx = np.maximum(nx, 0)
    ny = np.maximum(ny, 0)
    codes = morton_interleave(nx.ravel(), ny.ravel()).reshape(nx.shape)
    # invalid (negative) neighbors collapse onto clamped cells; mark with -1
    codes[~valid] = -1
    return codes


def cells_covering_bbox(
    xmin: np.ndarray,
    ymin: np.ndarray,
    xmax: np.ndarray,
    ymax: np.ndarray,
    cell_size: float,
) -> tuple[np.ndarray, np.ndarray]:
    """All cells intersecting each bbox → (row_index, cell_id) COO pairs.

    This is the polygon→covering-cells explosion used to index polygons for
    filter-refine PIP joins (SURVEY.md J3). Vectorized over rows with a
    variable fan-out: returns parallel arrays (which input row, which cell).
    """
    ix0 = np.maximum(np.floor(np.asarray(xmin) / cell_size), 0).astype(np.int64)
    iy0 = np.maximum(np.floor(np.asarray(ymin) / cell_size), 0).astype(np.int64)
    ix1 = np.maximum(np.floor(np.asarray(xmax) / cell_size), 0).astype(np.int64)
    iy1 = np.maximum(np.floor(np.asarray(ymax) / cell_size), 0).astype(np.int64)
    counts = (ix1 - ix0 + 1) * (iy1 - iy0 + 1)
    total = int(counts.sum())
    rows = np.repeat(np.arange(len(counts)), counts)
    # per-row local offset 0..count-1
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    local = np.arange(total) - np.repeat(starts, counts)
    width = np.repeat(iy1 - iy0 + 1, counts)
    gx = np.repeat(ix0, counts) + local // width
    gy = np.repeat(iy0, counts) + local % width
    return rows, morton_interleave(gx, gy)
