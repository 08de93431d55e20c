"""Child-NeRF grid splitting.

Reference: ``data_preprocess/scripts/split_child_nerf_xyz.py`` (C31) — each
cluster AABB is cut into ~1 m cells with the reference's exact ``huafen``
edge construction, scanned z-major / y / x-minor; every non-empty cell
becomes one child NeRF.
"""

from __future__ import annotations

from typing import List

import numpy as np


def huafen_edges(length: float, threshold: float, lo: float, hi: float) -> np.ndarray:
    """Cell-edge construction (split_child_nerf_xyz.py:6-20).

    Edges at lo + i*threshold; the count rounds length/threshold to the
    nearer integer (+1 edge), minimum two cells... except short extents get
    exactly one cell (two edges); the last edge is hi + 0.05.
    """
    if length > 2 * threshold:
        if length % threshold <= 0.5 * threshold:
            n = int(length / threshold)
        else:
            n = int(length / threshold) + 1
        n += 1
    else:
        n = 2
    edges = lo + threshold * np.arange(n, dtype=np.float64)
    edges[-1] = hi + 0.05
    return edges


def grid_split_cluster(points: np.ndarray, xy_threshold: float = 1.0,
                       z_threshold: float = 1.0) -> List[np.ndarray]:
    """Split one cluster into non-empty grid cells.

    Returns the per-cell point arrays in the reference's scan order
    (z outer, then y, then x — split_child_nerf_xyz.py:38-52).
    """
    pts = np.asarray(points, dtype=np.float64)
    lo = pts.min(axis=0)
    hi = pts.max(axis=0)
    xs = huafen_edges(hi[0] - lo[0], xy_threshold, lo[0], hi[0])
    ys = huafen_edges(hi[1] - lo[1], xy_threshold, lo[1], hi[1])
    zs = huafen_edges(hi[2] - lo[2], z_threshold, lo[2], hi[2])

    # vectorized cell assignment identical to the [e_i, e_{i+1}) interval scan
    ix = np.searchsorted(xs, pts[:, 0], side="right") - 1
    iy = np.searchsorted(ys, pts[:, 1], side="right") - 1
    iz = np.searchsorted(zs, pts[:, 2], side="right") - 1
    nx, ny, nz = len(xs) - 1, len(ys) - 1, len(zs) - 1
    valid = ((ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
             & (iz >= 0) & (iz < nz))
    flat = (iz * ny + iy) * nx + ix  # z-major scan order

    cells = []
    order = np.argsort(flat[valid], kind="stable")
    vpts = pts[valid][order]
    vflat = flat[valid][order]
    boundaries = np.flatnonzero(np.diff(vflat)) + 1
    for chunk in np.split(vpts, boundaries):
        if chunk.shape[0] > 0:
            cells.append(chunk.astype(np.float32))
    return cells
