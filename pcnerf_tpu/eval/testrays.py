"""Test-ray builder for evaluation: one row per (LiDAR ray x intersected
child NeRF), grouped.

Reference: ``multi_frame_kitti`` / ``multi_frame_maicity``
(``eval_kitti_render.py:538-881`` / ``:246-535``) — the per-ray Python loops
over candidate children become chunked vectorized passes:

1. per-frame crops + world transform (same order as the train loader's
   eval twin, including eval's *strict* < 120 m range crop);
2. parent far bound via the vectorized slab test (:675-677);
3. candidate prefilter: children whose AABB center lies within 0.65 m
   perpendicular distance of the ray (:691-693) — computed in ray-chunks
   against all child centers;
4. exactly-two-face-hit intersection (0429) per (ray, candidate) pair;
5. rays with no hit retry with cumulatively inflated candidate boxes
   (+0.05 per round for KITTI :737, +0.005 for MaiCity :405, giving up at
   extend_iter > 0.5) — all hits of the first successful round are kept;
6. per-ray groups sorted by child near bound, annotated with the intra-group
   row number and the group marker column (first row = groupsize-1, rest -1).

Output layout (13 columns, eval_kitti_render.py:866-868)::

    0:3 o, 3:6 d, 6 child_near, 7 child_far, 8 class(=3), 9 parent_near(=0),
    10 parent_far, 11 intra-group row#, 12 group marker

plus ``ranges`` (the measured range per row) and
``other_interest_sub_nerf_number`` (groupsize-1 on first row, 0 after).

KITTI quirks preserved: prefilter/intersection use the *unpadded* child
boxes (extend_tmp=0, :597), the per-row parent-far override when the child
far exceeds it (:721-722), and the ``true_in`` containment flags (:716-719).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from pcnerf_tpu.config import DataConfig, EvalConfig
from pcnerf_tpu.data.pcd_io import read_pcd, write_pcd
from pcnerf_tpu.data.poses import load_kitti_poses, load_maicity_poses
from pcnerf_tpu.data.raybuffer import parent_bounds
from pcnerf_tpu.preprocess.fusion import corridor_mask
import jax
import jax.numpy as jnp

from pcnerf_tpu.ops.aabb import face_hit_intersect, slab_far_distance


def _load_frame_points(cfg: DataConfig, j: int, poses):
    pts = read_pcd(os.path.join(cfg.root_dir, f"{j + 1}.pcd"))
    rx, ry, rz = cfg.range_delete
    keep = ((np.abs(pts[:, 0]) >= rx) | (np.abs(pts[:, 1]) >= ry)
            | (np.abs(pts[:, 2]) >= rz))
    pts = pts[keep]
    if cfg.dataset == "kitti":
        pts = pts[pts[:, 2] <= cfg.over_height]
        pts = pts[pts[:, 2] >= cfg.over_low]
    dist = np.linalg.norm(pts, axis=1)
    pts = pts[dist < 120.0]
    T = poses[j + 1] if cfg.dataset == "kitti" else poses[j]
    return (pts @ T[:3, :3].T + T[:3, 3]).astype(np.float32), T[:3, 3]


def _candidate_pairs(origin, dirs, centers, threshold=0.65, chunk=512):
    """Sparse (ray_idx, box_idx) pairs with perpendicular center-to-ray
    distance <= threshold (eval_kitti_render.py:691-693).

    NaN distances (near-collinear points, the reference's unclipped
    ``sqrt(1-cos^2)``) compare False, matching numpy semantics there.
    """
    v = centers - origin[None, :]
    dist = np.linalg.norm(v, axis=1)
    r_idx, b_idx = [], []
    for s in range(0, dirs.shape[0], chunk):
        d = dirs[s:s + chunk]
        cos = d @ v.T / dist[None, :]
        with np.errstate(invalid="ignore"):
            perp = dist[None, :] * np.sqrt(1.0 - cos * cos)
            rr, bb = np.nonzero(perp <= threshold)
        r_idx.append(rr + s)
        b_idx.append(bb)
    return np.concatenate(r_idx), np.concatenate(b_idx)


def _intersect_pairs(origin, dirs, ray_idx, box_lo, box_hi):
    """0429 exactly-two-hits test over flat (ray, box) pairs; jit-chunked."""
    n = ray_idx.shape[0]
    ok = np.empty(n, bool)
    near = np.empty(n, np.float32)
    far = np.empty(n, np.float32)
    CH = 16384
    for s in range(0, n, CH):
        e = min(s + CH, n)
        pad = CH - (e - s)
        def pad_to(a):
            return np.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1),
                          constant_values=1.0) if pad else a
        o = np.broadcast_to(origin, (e - s, 3))
        res = _intersect_jit(jnp.asarray(pad_to(o)),
                             jnp.asarray(pad_to(dirs[ray_idx[s:e]])),
                             jnp.asarray(pad_to(box_lo[s:e])),
                             jnp.asarray(pad_to(box_hi[s:e])))
        ok[s:e] = np.asarray(res[0])[:e - s]
        near[s:e] = np.asarray(res[1])[:e - s]
        far[s:e] = np.asarray(res[2])[:e - s]
    return ok, near, far


@jax.jit
def _intersect_jit(o, d, lo, hi):
    return face_hit_intersect(o, d, lo, hi, exactly_two=True)


def build_test_rays(cfg: DataConfig, view_frame: int, *,
                    depth_inference_method: int = 2,
                    aabbs_unpadded: Optional[np.ndarray] = None,
                    result_path: Optional[str] = None,
                    verbose: bool = True, use_cpu: bool = True):
    """Build (all_rays, all_ranges, other_counts, true_in, gt_points, origin)
    for one test frame (``view_frame`` = j+1 scan number).

    ``use_cpu`` pins the many small chunked intersection programs to the host
    (offline tool; see data/raybuffer.py for the rationale).
    """
    if use_cpu:
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            return _build_test_rays(
                cfg, view_frame, depth_inference_method=depth_inference_method,
                aabbs_unpadded=aabbs_unpadded, result_path=result_path,
                verbose=verbose)
    return _build_test_rays(
        cfg, view_frame, depth_inference_method=depth_inference_method,
        aabbs_unpadded=aabbs_unpadded, result_path=result_path,
        verbose=verbose)


def _build_test_rays(cfg: DataConfig, view_frame: int, *,
                     depth_inference_method: int = 2,
                     aabbs_unpadded: Optional[np.ndarray] = None,
                     result_path: Optional[str] = None,
                     verbose: bool = True):
    if aabbs_unpadded is None:
        aabbs_unpadded = np.load(os.path.join(cfg.result_path,
                                              "child_aabbs.npy")).astype(np.float32)
    kitti = cfg.dataset == "kitti"
    # KITTI eval uses extend 0 boxes; MaiCity pads both filter and larger
    # boxes by 0.025 (eval_kitti_render.py:597 vs :284-298)
    pad = 0.0 if kitti else 0.025
    boxes = aabbs_unpadded.copy()
    boxes[:, :3] -= pad
    boxes[:, 3:] += pad
    centers = (boxes[:, :3] + boxes[:, 3:]) * 0.5

    if kitti:
        poses = load_kitti_poses(cfg.pose_path, cfg.data_start)
    else:
        poses = load_maicity_poses(cfg.pose_path)
    j = view_frame - 1
    world, origin = _load_frame_points(cfg, j, poses)

    if kitti:
        traj_xy = poses[cfg.data_start + 1:cfg.data_end + 1, :3, 3][:, :2]
        world = world[corridor_mask(world[:, :2], traj_xy,
                                    cfg.interest_x, cfg.interest_y)]
    else:
        p_lo, p_hi = parent_bounds(cfg)
        world = world[((world >= p_lo) & (world <= p_hi)).all(axis=1)]

    vec = world - origin[None, :]
    rng = np.linalg.norm(vec, axis=1)
    dirs = (vec / rng[:, None]).astype(np.float32)
    R = dirs.shape[0]

    p_lo, p_hi = parent_bounds(cfg)
    par_far = np.asarray(slab_far_distance(origin, dirs, p_lo, p_hi),
                         np.float32)

    ray_idx, box_idx = _candidate_pairs(origin, dirs, centers)
    ok, near, far = _intersect_pairs(origin, dirs, ray_idx,
                                     boxes[box_idx, :3], boxes[box_idx, 3:])
    # candidate sets per ray, for the expansion fallback
    cand_of = {}
    for r, b in zip(ray_idx, box_idx):
        cand_of.setdefault(int(r), []).append(int(b))
    if verbose:
        print(f"[testrays] frame {view_frame}: {R} rays, "
              f"{ray_idx.shape[0]} candidate pairs, {ok.sum()} hits",
              flush=True)

    # group assembly: per ray, the hit rows sorted by near bound
    rows = {r: [] for r in range(R)}
    hit_any = np.zeros(R, bool)
    for k in np.flatnonzero(ok):
        r = ray_idx[k]
        hit_any[r] = True
        rows[r].append((near[k], far[k], box_idx[k], 0.0))

    # expansion fallback: inflate each no-hit ray's candidate boxes
    # cumulatively until any hit (or extend_iter > 0.5)
    step = 0.05 if kitti else 0.005
    misses = np.asarray([r for r in range(R)
                         if not hit_any[r] and r in cand_of])
    if misses.size:
        extend_iter, total = 0.0, 0.0
        active = misses
        while active.size and extend_iter <= 0.5:
            extend_iter += step
            total += extend_iter
            ridx, bidx = [], []
            for r in active:
                bs = cand_of[int(r)]
                ridx.extend([r] * len(bs))
                bidx.extend(bs)
            ridx = np.asarray(ridx, np.int64)
            bidx = np.asarray(bidx, np.int64)
            lo = boxes[bidx, :3] - total
            hi = boxes[bidx, 3:] + total
            ok2, near2, far2 = _intersect_pairs(origin, dirs, ridx, lo, hi)
            newly = set()
            for k in np.flatnonzero(ok2):
                r = ridx[k]
                hit_any[r] = True
                newly.add(r)
                rows[r].append((near2[k], far2[k], bidx[k], total))
            active = np.asarray([r for r in active if r not in newly])

    out_rows, out_ranges, out_counts, out_true = [], [], [], []
    gt_points = []
    for r in range(R):
        if not hit_any[r]:
            continue
        if depth_inference_method == 1:
            # one-step: the reference breaks at the FIRST hit in child-index
            # order (eval_kitti_render.py:726-729), before any sorting, and
            # the kitti parent-far override (:721-722) has already fired with
            # that child's ORIGINAL far bound when the near/far columns are
            # overwritten with the parent interval
            grp = rows[r][:1]
        else:
            grp = sorted(rows[r], key=lambda t: t[0])
        n = len(grp)
        for i, (nb, fb, b, infl) in enumerate(grp):
            pf = par_far[r]
            if kitti and par_far[r] < fb:
                pf = fb
            if depth_inference_method == 1:
                nb, fb = 0.0, par_far[r]
            out_rows.append([origin[0], origin[1], origin[2],
                             dirs[r, 0], dirs[r, 1], dirs[r, 2],
                             nb, fb, 3.0, 0.0, pf,
                             float(i + 1), float(n - 1 if i == 0 else -1)])
            out_ranges.append(rng[r])
            out_counts.append(n - 1 if i == 0 else 0)
            if kitti:
                lo = boxes[b, :3] - infl
                hi = boxes[b, 3:] + infl
                out_true.append(bool(((world[r] >= lo) & (world[r] <= hi)).all()))
        gt_points.append(world[r])

    all_rays = np.asarray(out_rows, np.float32)
    all_ranges = np.asarray(out_ranges, np.float32).reshape(-1, 1)
    counts = np.asarray(out_counts, np.int64).reshape(-1, 1)
    true_in = np.asarray(out_true, np.float32).reshape(-1, 1) if kitti else None
    gt = np.asarray(gt_points, np.float32)

    if result_path:
        sub = "two_step" if depth_inference_method == 2 else "one_step"
        d = os.path.join(result_path, sub, f"{view_frame}pcd",
                         "childnerf_ray_intersect")
        os.makedirs(d, exist_ok=True)
        np.save(os.path.join(d, "all_rays_child.npy"), all_rays)
        np.save(os.path.join(d, "all_ranges_child.npy"), all_ranges)
        np.save(os.path.join(d, "other_interest_sub_nerf_number_child.npy"),
                counts)
        if true_in is not None:
            np.save(os.path.join(d, "true_in_all_child.npy"), true_in)
        write_pcd(os.path.join(d, f"{view_frame}_source.pcd"), gt)
        write_pcd(os.path.join(d, f"{view_frame}_pose.pcd"),
                  origin.reshape(1, 3))
    return all_rays, all_ranges, counts, true_in, gt, origin
