"""Ray-buffer compiler: raw scans -> device-resident 15-column ray tensors.

Replaces the reference datasets' per-point Python loops
(``nof/dataset/ipb2dmapping.py:595-858`` kitti, ``:200-514`` maicity) with a
vectorized pipeline whose heavy stages (child assignment via top-k over
child-AABB centers, ray/AABB intersections) are jitted XLA programs — they
run on the TPU when one is attached, tiling the (points x children) distance
computation onto the MXU.

Column layout (ipb2dmapping.py:819-824)::

    0:3 o, 3:6 d, 6 parent_near(=0), 7 parent_far, 8 class(=3), 9 child_id,
    10 child_near, 11 child_far, 12 point_near, 13 point_far, 14 range

Reference quirks preserved:
  - column 13 ("point far") actually holds the *child* far bound
    (ipb2dmapping.py:815,:443);
  - parent_near is always 0 (the init value is never overwritten);
  - parent_far is clamped to >= child_far (:765-766);
  - child assignment = first containing box among the 10 nearest centers
    (``find_aabb_box``, :174-197) — a point whose 10 nearest centers contain
    none of its boxes is dropped;
  - KITTI drops points whose ray has no face-hit with the padded child box
    (0606 intersect flag, :752-756); MaiCity uses the first-two-hits variant.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from pcnerf_tpu.config import DataConfig
from pcnerf_tpu.data.pcd_io import pcd_aabb, read_pcd
from pcnerf_tpu.data.poses import load_kitti_poses, load_maicity_poses
from pcnerf_tpu.ops.aabb import (
    face_hit_first_two,
    face_hit_intersect,
    positive_plane_far,
)
from pcnerf_tpu.preprocess.fusion import corridor_mask


def load_child_aabbs(cfg: DataConfig) -> np.ndarray:
    """(C, 6) [min, max] child AABBs, padded by ``child_pad`` (0.025 m —
    ipb2dmapping.py:608-614).

    Prefers the pipeline's ``child_aabbs.npy``; falls back to scanning the
    ``{1..C}.pcd`` files like the reference.
    """
    npy = os.path.join(os.path.dirname(cfg.subnerf_path.rstrip("/")), "..",
                       "child_aabbs.npy")
    candidates = [
        os.path.join(cfg.result_path, "child_aabbs.npy") if cfg.result_path else "",
        os.path.normpath(npy),
    ]
    for c in candidates:
        if c and os.path.exists(c):
            aabbs = np.load(c)
            break
    else:
        aabbs = np.empty((cfg.sub_nerf_count, 6), np.float64)
        for i in range(cfg.sub_nerf_count):
            lo, hi = pcd_aabb(os.path.join(cfg.subnerf_path, f"{i + 1}.pcd"))
            aabbs[i, :3] = lo
            aabbs[i, 3:] = hi
    out = aabbs.astype(np.float32).copy()
    out[:, :3] -= cfg.child_pad
    out[:, 3:] += cfg.child_pad
    return out


@functools.partial(jax.jit, static_argnames=("k",))
def _assign_children(points, centers, box_lo, box_hi, k: int = 10):
    """First containing child box among the k nearest box centers.

    Vectorized ``find_aabb_box`` (ipb2dmapping.py:174-197): the sklearn
    KDTree query becomes a (points x children) distance computation on the
    MXU + ``top_k``; containment is then tested in nearest-first order.

    Returns (found (N,), child_index (N,)).
    """
    d2 = (jnp.sum(points * points, -1, keepdims=True)
          - 2.0 * points @ centers.T
          + jnp.sum(centers * centers, -1)[None, :])
    _, idx = jax.lax.top_k(-d2, k)                      # (N, k) nearest-first
    cand_lo = box_lo[idx]                               # (N, k, 3)
    cand_hi = box_hi[idx]
    inside = ((points[:, None, :] >= cand_lo)
              & (points[:, None, :] <= cand_hi)).all(-1)  # (N, k)
    first = jnp.argmax(inside, axis=-1)
    found = inside.any(axis=-1)
    return found, jnp.take_along_axis(idx, first[:, None], -1)[:, 0]


def assign_children(points, aabbs, chunk: int = 8192, k: int = 10):
    """Chunked host driver for :func:`_assign_children`."""
    centers = jnp.asarray((aabbs[:, :3] + aabbs[:, 3:]) * 0.5)
    lo = jnp.asarray(aabbs[:, :3])
    hi = jnp.asarray(aabbs[:, 3:])
    n = points.shape[0]
    found = np.empty(n, bool)
    child = np.empty(n, np.int32)
    for s in range(0, n, chunk):
        p = points[s:s + chunk]
        pad = chunk - p.shape[0]
        pj = jnp.asarray(np.pad(p, ((0, pad), (0, 0))) if pad else p)
        f, c = _assign_children(pj, centers, lo, hi, k)
        found[s:s + chunk] = np.asarray(f)[:p.shape[0]]
        child[s:s + chunk] = np.asarray(c)[:p.shape[0]]
    return found, child


@functools.partial(jax.jit, static_argnames=("kitti",))
def _ray_geometry(origin, dirs, c_lo, c_hi, p_lo, p_hi, surface_expand,
                  kitti: bool):
    """Fixed-shape chunk of per-ray bounds: child near/far (face-hit test),
    parent far (positive-plane min, clamped >= child far).  One compiled
    program regardless of frame size — callers pad to the chunk size."""
    o = jnp.broadcast_to(origin, dirs.shape)
    if kitti:
        ok, near_c, far_c = face_hit_intersect(o, dirs, c_lo, c_hi)
    else:
        ok, near_c, far_c = face_hit_first_two(o, dirs, c_lo, c_hi)
    near_c = near_c - surface_expand
    far_c = far_c + surface_expand
    far_p = positive_plane_far(o, dirs, p_lo, p_hi)
    far_p = jnp.maximum(far_p, far_c)
    return ok, near_c, far_c, far_p


def ray_geometry(origin, dirs, c_lo, c_hi, p_lo, p_hi, surface_expand,
                 kitti: bool, chunk: int = 8192):
    n = dirs.shape[0]
    outs = [np.empty(n, bool), np.empty(n, np.float32),
            np.empty(n, np.float32), np.empty(n, np.float32)]
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        pad = chunk - (e - s)
        def pad_to(a):
            return np.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1),
                          constant_values=1.0) if pad else a
        res = _ray_geometry(jnp.asarray(origin), jnp.asarray(pad_to(dirs[s:e])),
                            jnp.asarray(pad_to(c_lo[s:e])),
                            jnp.asarray(pad_to(c_hi[s:e])),
                            jnp.asarray(p_lo), jnp.asarray(p_hi),
                            surface_expand, kitti)
        for buf, r in zip(outs, res):
            buf[s:e] = np.asarray(r)[:e - s]
    return tuple(outs)


def _frame_points(cfg: DataConfig, j: int, poses: np.ndarray) -> np.ndarray:
    """Load scan j+1 and apply the per-dataset crops in reference order."""
    pts = read_pcd(os.path.join(cfg.root_dir, f"{j + 1}.pcd"))
    rx, ry, rz = cfg.range_delete
    keep = ((np.abs(pts[:, 0]) >= rx) | (np.abs(pts[:, 1]) >= ry)
            | (np.abs(pts[:, 2]) >= rz))
    pts = pts[keep]
    dist = np.linalg.norm(pts, axis=1)
    if cfg.dataset == "kitti":
        pts = pts[dist <= cfg.max_range]
        pts = pts[pts[:, 2] <= cfg.over_height]
        pts = pts[pts[:, 2] >= cfg.over_low]
        T = poses[j + 1]
    else:
        pts = pts[dist < cfg.max_range]
        T = poses[j]
    world = pts @ T[:3, :3].T + T[:3, 3]
    return world.astype(np.float32)


def parent_bounds(cfg: DataConfig):
    if cfg.dataset == "kitti":
        lo, hi = pcd_aabb(cfg.parentnerf_path)
        return np.asarray(lo, np.float32), np.asarray(hi, np.float32)
    return (np.asarray(cfg.parent_min, np.float32),
            np.asarray(cfg.parent_max, np.float32))


def build_ray_buffer(cfg: DataConfig, split: str, *,
                     aabbs: Optional[np.ndarray] = None,
                     verbose: bool = False, use_cpu: bool = True):
    """Compile the (N, 15) ray buffer + (N,) ranges for a split.

    ``use_cpu=True`` (default) pins the offline compilation to the host CPU:
    this is a one-time preprocessing pass, and on a *tunneled* accelerator
    the per-dispatch latency of its many small chunked programs dominates.
    On a directly-attached TPU host, pass False to run the child-assignment
    matmuls on the MXU.
    """
    if use_cpu:
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            return _build_ray_buffer(cfg, split, aabbs=aabbs, verbose=verbose)
    return _build_ray_buffer(cfg, split, aabbs=aabbs, verbose=verbose)


def _build_ray_buffer(cfg: DataConfig, split: str, *,
                      aabbs: Optional[np.ndarray] = None,
                      verbose: bool = False):
    if aabbs is None:
        aabbs = load_child_aabbs(cfg)
    p_lo, p_hi = parent_bounds(cfg)

    if cfg.dataset == "kitti":
        poses = load_kitti_poses(cfg.pose_path, cfg.data_start)
        positions = poses[:, :3, 3]
        traj_xy = positions[cfg.data_start + 1:cfg.data_end + 1, :2]
    else:
        poses = load_maicity_poses(cfg.pose_path)
        positions = poses[:, :3, 3]

    rows = []
    for j in range(cfg.data_start, cfg.data_end):
        if split == "train":
            if not cfg.split.is_train_frame(j, cfg.data_start):
                continue
        elif not cfg.split.is_val_frame(j, cfg.data_start):
            continue

        world = _frame_points(cfg, j, poses)
        if cfg.dataset == "kitti":
            keep = corridor_mask(world[:, :2], traj_xy,
                                 cfg.interest_x, cfg.interest_y)
            world = world[keep]
            origin = positions[j + 1]
        else:
            keep = ((world >= p_lo) & (world <= p_hi)).all(axis=1)
            world = world[keep]
            origin = positions[j]

        vec = world - origin[None, :]
        rng = np.linalg.norm(vec, axis=1)
        dirs = (vec / rng[:, None]).astype(np.float32)

        found, child = assign_children(world, aabbs)
        world, dirs, rng, child = (world[found], dirs[found], rng[found],
                                   child[found])

        c_lo = aabbs[child, :3]
        c_hi = aabbs[child, 3:]
        ok, near_c, far_c, far_p = ray_geometry(
            origin, dirs, c_lo, c_hi, p_lo, p_hi, cfg.surface_expand,
            kitti=(cfg.dataset == "kitti"))
        world, dirs, rng, child = (world[ok], dirs[ok], rng[ok], child[ok])
        near_c, far_c, far_p = near_c[ok], far_c[ok], far_p[ok]

        n = dirs.shape[0]
        frame = np.empty((n, 15), np.float32)
        frame[:, 0:3] = origin
        frame[:, 3:6] = dirs
        frame[:, 6] = 0.0
        frame[:, 7] = far_p
        frame[:, 8] = 3.0
        frame[:, 9] = child + 1          # 1-based ids
        frame[:, 10] = near_c
        frame[:, 11] = far_c
        frame[:, 12] = rng - cfg.surface_expand
        frame[:, 13] = far_c             # reference quirk: child far, not point far
        frame[:, 14] = rng
        rows.append(frame)
        if verbose:
            print(f"[raybuffer] frame {j + 1} ({split}): {n} rays", flush=True)

    rays = np.concatenate(rows, axis=0) if rows else np.zeros((0, 15), np.float32)
    return rays, rays[:, 14].copy()


def cache_paths(cfg: DataConfig, split: str):
    d = os.path.join(cfg.result_path, "save_npy", "split_child_nerf2_3")
    return (os.path.join(d, f"self_rays_{split}.npy"),
            os.path.join(d, f"self_ranges_{split}.npy"))


def load_or_build(cfg: DataConfig, split: str, *, rebuild: bool = False,
                  verbose: bool = False):
    """Cached ray buffer (the reference's ``re_loaddata`` npy cache,
    ipb2dmapping.py:827-848, path-compatible)."""
    rays_p, ranges_p = cache_paths(cfg, split)
    if not rebuild and os.path.exists(rays_p):
        return np.load(rays_p), np.load(ranges_p)
    rays, ranges = build_ray_buffer(cfg, split, verbose=verbose)
    os.makedirs(os.path.dirname(rays_p), exist_ok=True)
    np.save(rays_p, rays)
    np.save(ranges_p, ranges)
    return rays, ranges


def val_subsample(rays: np.ndarray, ranges: np.ndarray, cloud_size_val: int):
    """The reference's val subsampling: floor(linspace(1, N-2, size)) row
    picks (ipb2dmapping.py:860-887) — computed once, not per item fetch."""
    sel = np.floor(np.linspace(1.0, rays.shape[0] - 2, cloud_size_val,
                               dtype=np.float32)).astype(np.int64)
    return rays[sel], ranges[sel]
