"""Multi-scan point-cloud fusion (vectorized).

Reference: ``data_preprocess/scripts/pointcloud_fusion.py`` (C27) — per-point
Python loops replaced by array masks; identical crop order and semantics:

1. drop points inside the vehicle body box (|x|<rx & |y|<ry & |z|<rz);
2. drop points above ``over_height`` or below ``over_low``;
3. drop points with range > 120 m;
4. transform to the rebased world frame (pose of scan j+1);
5. keep points within (interest_x, interest_y) of ANY trajectory position.

Only train-split frames are fused (the reference hardcodes the 20% rule
``(j+1-3)%5 != 0``, pointcloud_fusion.py:53-56; here the split predicate is
injected).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np


def corridor_mask(points_xy: np.ndarray, traj_xy: np.ndarray,
                  interest_x: float, interest_y: float,
                  chunk: int = 65536) -> np.ndarray:
    """Points within |dx|<=ix and |dy|<=iy of any trajectory position."""
    out = np.zeros(points_xy.shape[0], bool)
    for s in range(0, points_xy.shape[0], chunk):
        p = points_xy[s:s + chunk]
        dx = np.abs(p[:, 0:1] - traj_xy[None, :, 0])
        dy = np.abs(p[:, 1:2] - traj_xy[None, :, 1])
        out[s:s + chunk] = ((dx <= interest_x) & (dy <= interest_y)).any(axis=1)
    return out


def crop_scan(points: np.ndarray, range_delete, max_range: float,
              over_height: Optional[float], over_low: Optional[float]):
    """Vehicle-body + height + range crops in sensor frame."""
    rx, ry, rz = range_delete
    keep = ((np.abs(points[:, 0]) >= rx) | (np.abs(points[:, 1]) >= ry)
            | (np.abs(points[:, 2]) >= rz))
    pts = points[keep]
    if over_height is not None:
        pts = pts[pts[:, 2] <= over_height]
    if over_low is not None:
        pts = pts[pts[:, 2] >= over_low]
    dist = np.linalg.norm(pts, axis=1)
    return pts[dist <= max_range]


def fuse_scans(load_scan: Callable[[int], np.ndarray], poses: np.ndarray,
               data_start: int, data_end: int,
               is_train_frame: Callable[[int], bool], *,
               range_delete=(3.0, 2.0, 1.25), interest_x=20.0, interest_y=20.0,
               over_height=0.168, over_low=-2.0, max_range=120.0,
               pose_offset: int = 1):
    """Fuse the train-split scans into one world-frame cloud.

    Args:
      load_scan: frame index j -> (N, 3) sensor-frame points (scan j+1).
      poses: (F, 4, 4) rebased poses; scan j uses ``poses[j + pose_offset]``
        (KITTI offset 1, matching pointcloud_fusion.py:85).
      is_train_frame: split predicate over j in [data_start, data_end).

    Returns (fused_points (N,3) float32, scan_positions (T,3) float32).
    """
    traj_xy = poses[data_start + pose_offset:data_end + pose_offset, :2, 3]
    fused, positions = [], []
    for j in range(data_start, data_end):
        if not is_train_frame(j):
            continue
        pts = crop_scan(load_scan(j).astype(np.float32), range_delete,
                        max_range, over_height, over_low)
        T = poses[j + pose_offset].astype(np.float32)
        world = pts @ T[:3, :3].T + T[:3, 3]
        keep = corridor_mask(world[:, :2], traj_xy, interest_x, interest_y)
        fused.append(world[keep])
        positions.append(T[:3, 3])
    return (np.concatenate(fused, axis=0).astype(np.float32),
            np.stack(positions).astype(np.float32))
