"""Trajectory pose loading and rebasing.

Reproduces the reference pose pipelines:

- KITTI (``nof/dataset/ipb2dmapping.py:567-589``): each 3x4 row of
  ``poses.txt`` is lifted to 4x4, right-multiplied by the hardcoded
  velodyne-to-camera calibration, then re-expressed relative to
  ``T_start = poses[data_start + 1]``.
- MaiCity (``ipb2dmapping.py:237-249``): raw 4x4 lift only.
"""

from __future__ import annotations

import numpy as np

# KITTI sequence-00 velodyne->camera calibration, hardcoded in the reference
# (ipb2dmapping.py:567-570 and eval_kitti_render.py:564-567).
T_VELO2CAM_KITTI = np.array(
    [
        [4.276802385584e-04, -9.999672484946e-01, -8.084491683471e-03, -1.198459927713e-02],
        [-7.210626507497e-03, 8.081198471645e-03, -9.999413164504e-01, -5.403984729748e-02],
        [9.999738645903e-01, 4.859485810390e-04, -7.206933692422e-03, -2.921968648686e-01],
        [0.0, 0.0, 0.0, 1.0],
    ]
)


def load_raw_poses(pose_path: str) -> np.ndarray:
    """Parse a KITTI-format poses.txt into (N, 4, 4) float64 matrices."""
    rows = []
    with open(pose_path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            vals = np.array([float(v) for v in line.split()]).reshape(3, 4)
            rows.append(np.vstack([vals, [0.0, 0.0, 0.0, 1.0]]))
    return np.stack(rows)


def load_kitti_poses(pose_path: str, data_start: int) -> np.ndarray:
    """KITTI poses: apply T_velo2cam then rebase to ``poses[data_start+1]``.

    The reference performs the rebase in float32 (``torch.Tensor`` matmul,
    ipb2dmapping.py:583-589); we match that precision so ray origins agree.
    """
    poses = load_raw_poses(pose_path) @ T_VELO2CAM_KITTI
    t_start_inv = np.linalg.inv(poses[data_start + 1]).astype(np.float32)
    return (t_start_inv @ poses.astype(np.float32)).astype(np.float32)


def load_maicity_poses(pose_path: str) -> np.ndarray:
    """MaiCity poses: raw 4x4, cast to float32 as the reference does."""
    return load_raw_poses(pose_path).astype(np.float32)
