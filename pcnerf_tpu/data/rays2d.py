"""2D planar-scan ray helpers (C18).

Reference: ``nof/dataset/ray_utils.py:11-77`` (inherited from ir-mcl; used by
the localization utilities, not by the 3D LiDAR pipeline).  Vectorized,
framework-free: these run on host numpy by default and accept jax arrays
transparently (pure ufunc math), so the localization particle scorer can vmap
over them on device.

Conventions match the reference:
  - a scan is a fan of unit beams at angles ``angle_min + k * angle_res``
    for ``k = 0 .. ceil((angle_max - angle_min)/angle_res) - 1``
    (``torch.arange(angle_min, angle_max, angle_res)`` semantics: the end
    angle is exclusive);
  - a 2D pose is a 2x3 matrix ``[R | t]`` mapping lidar -> world;
  - ray origins are the pose translation, directions are re-normalized after
    rotation (ray_utils.py:63-69).
"""

from __future__ import annotations

import numpy as np


def ray_directions_2d(angle_min: float, angle_max: float, angle_res: float):
    """(N, 2) unit beam directions in the lidar frame.

    Reference ``get_ray_directions`` / ``get_ray_directions3D`` (the two are
    byte-identical there, ray_utils.py:11-47 — one symbol suffices here).
    """
    n = int(np.ceil((angle_max - angle_min) / angle_res - 1e-12))
    beams = angle_min + angle_res * np.arange(n)
    return np.stack([np.cos(beams), np.sin(beams)], axis=-1)


def rays_world_2d(directions, pose_w2l):
    """(origins (N, 2), unit directions (N, 2)) in the world frame.

    Reference ``get_rays`` (ray_utils.py:50-77): rotate the fan by the 2x2
    block of the 2x3 pose, re-normalize, and broadcast the translation column
    as the shared origin.
    """
    directions = np.asarray(directions)
    pose_w2l = np.asarray(pose_w2l)
    rays_d = directions @ pose_w2l[:, :2].T
    rays_d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = np.broadcast_to(pose_w2l[:, 2], rays_d.shape)
    return rays_o, rays_d


def pose2d_matrix(x: float, y: float, yaw: float) -> np.ndarray:
    """(2, 3) ``[R(yaw) | (x, y)]`` — the pose layout rays_world_2d expects."""
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, -s, x], [s, c, y]])
