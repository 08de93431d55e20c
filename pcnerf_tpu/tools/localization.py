"""Monte-Carlo-localization support utilities (C35).

Reference: ``utils.py:16-237`` (2D MCL particle evaluation + APE metrics via
the ``evo`` package, inherited from ir-mcl).  Re-derived TPU-side-friendly:

  - particle -> pose reduction and trajectory estimation are vectorized
    numpy (the reference loops per frame and per statistic);
  - the APE metrics are computed directly (translation / yaw absolute pose
    error with nearest-timestamp association) instead of through ``evo``,
    which is not a dependency of this framework — same statistics:
    RMSE x 100, percent-within {5, 10, 20} cm, yaw RMSE in degrees.

The occupancy-field particle *scorer* itself is the framework's forward model
(models/nof.py + render.py) vmapped over particle poses; these helpers cover
the surrounding estimation/evaluation math that ``utils.py`` provides.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def particles_to_pose(particles: np.ndarray) -> np.ndarray:
    """Weighted mean pose of an (N, 4) ``[x, y, yaw, weight]`` particle set.

    Yaw is averaged on the unit circle (mean of cos/sin, then atan2) exactly
    as ``particles2pose`` does (utils.py:74-94).
    """
    w = particles[:, 3] / particles[:, 3].sum()
    xy = w @ particles[:, :2]
    c = w @ np.cos(particles[:, 2])
    s = w @ np.sin(particles[:, 2])
    return np.array([xy[0], xy[1], np.arctan2(s, c)])


def estimate_trajectory(all_particles: np.ndarray, start_idx: int,
                        ratio: float = 0.8) -> np.ndarray:
    """(F, 3) estimated poses from an (F, N, 4) particle history.

    Per frame: keep the top ``ratio`` of particles by weight, then reduce
    with :func:`particles_to_pose`; frames whose kept weights sum to zero are
    skipped (``get_est_poses``, utils.py:96-116).
    """
    out = []
    n_keep = int(ratio * all_particles.shape[1])
    for particles in all_particles[start_idx:]:
        idx = np.argsort(particles[:, 3])[::-1][:n_keep]
        kept = particles[idx]
        if kept[:, 3].sum() == 0:
            continue
        out.append(particles_to_pose(kept))
    return np.array(out)


def _associate(ts_est: np.ndarray, ts_gt: np.ndarray,
               max_diff: float) -> Tuple[np.ndarray, np.ndarray]:
    """Nearest-timestamp matching (evo ``sync.associate_trajectories``
    semantics: greedy nearest within ``max_diff``, each gt used once)."""
    j = np.searchsorted(ts_gt, ts_est)
    j = np.clip(j, 1, len(ts_gt) - 1)
    left_closer = np.abs(ts_est - ts_gt[j - 1]) <= np.abs(ts_est - ts_gt[j])
    j = np.where(left_closer, j - 1, j)
    ok = np.abs(ts_est - ts_gt[j]) <= max_diff
    return np.nonzero(ok)[0], j[ok]


def evaluate_ape(est_poses: np.ndarray, gt_poses: np.ndarray,
                 ts_est: np.ndarray | None = None,
                 ts_gt: np.ndarray | None = None,
                 max_diff: float = 0.01) -> dict:
    """Absolute-pose-error summary of (F, 3) ``[x, y, yaw]`` trajectories.

    Returns the statistics of ``evaluate_APE`` (utils.py:135-184):
    ``location_rmse`` (cm), ``location_ptc{5,10,20}`` (percent of frames with
    translation error under 5/10/20 cm), ``yaw_rmse`` (degrees).
    """
    if ts_est is not None and ts_gt is not None:
        i, j = _associate(np.asarray(ts_est, float), np.asarray(ts_gt, float),
                          max_diff)
        est_poses, gt_poses = est_poses[i], gt_poses[j]
    n = min(len(est_poses), len(gt_poses))
    est, gt = np.asarray(est_poses)[:n], np.asarray(gt_poses)[:n]
    terr = np.linalg.norm(est[:, :2] - gt[:, :2], axis=-1)
    # wrap yaw difference into (-pi, pi] before the norm
    dyaw = np.arctan2(np.sin(est[:, 2] - gt[:, 2]),
                      np.cos(est[:, 2] - gt[:, 2]))
    return {
        "location_rmse": float(np.sqrt(np.mean(terr ** 2)) * 100.0),
        "location_ptc5": float(np.mean(terr < 0.05) * 100.0),
        "location_ptc10": float(np.mean(terr < 0.10) * 100.0),
        "location_ptc20": float(np.mean(terr < 0.20) * 100.0),
        "yaw_rmse": float(np.degrees(np.sqrt(np.mean(dyaw ** 2)))),
        "frames": int(n),
    }


def poses_to_tum(timestamps: np.ndarray, poses: np.ndarray) -> np.ndarray:
    """(F, 8) TUM-format rows ``[t, x, y, 0, qx, qy, qz, qw]`` from (F, 3)
    planar poses (``convert2tum``, utils.py:118-133; z-rotation quaternion
    computed in closed form instead of via scipy)."""
    half = np.asarray(poses)[:, 2] / 2.0
    z = np.zeros_like(half)
    return np.column_stack([
        np.asarray(timestamps, float), poses[:, 0], poses[:, 1], z,
        z, z, np.sin(half), np.cos(half)])
