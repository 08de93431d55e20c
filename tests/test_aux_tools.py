"""Tests for the auxiliary components: 2D ray helpers (C18), localization
utils (C35), headless AABB viewer (C32)."""

import numpy as np
import pytest

from pcnerf_tpu.data.rays2d import pose2d_matrix, ray_directions_2d, rays_world_2d
from pcnerf_tpu.tools.localization import (
    estimate_trajectory,
    evaluate_ape,
    particles_to_pose,
    poses_to_tum,
)
from pcnerf_tpu.tools.view_aabb import (
    box_corners,
    read_wireframe_ply,
    write_wireframe_ply,
)


# ---------------------------------------------------------------------------
# rays2d (C18) — oracle: the reference math re-executed in torch
# ---------------------------------------------------------------------------

def test_ray_directions_match_torch_arange_semantics():
    import torch
    amin, amax, res = -2.356194, 2.356194, 0.004363323
    ours = ray_directions_2d(amin, amax, res)
    beams = torch.arange(amin, amax, res)
    ref = torch.stack([torch.cos(beams), torch.sin(beams)], dim=-1).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_rays_world_2d():
    dirs = ray_directions_2d(0.0, np.pi, np.pi / 4)       # 4 beams
    pose = pose2d_matrix(1.0, -2.0, np.pi / 2)            # rotate 90°
    o, d = rays_world_2d(dirs, pose)
    np.testing.assert_allclose(o, np.broadcast_to([1.0, -2.0], d.shape))
    # beam at angle 0 rotated by 90° -> +y
    np.testing.assert_allclose(d[0], [0.0, 1.0], atol=1e-7)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-7)


# ---------------------------------------------------------------------------
# localization (C35)
# ---------------------------------------------------------------------------

def test_particles_to_pose_circular_mean():
    # two equal-weight particles straddling the ±pi wrap: naive mean yaw
    # would be 0; the circular mean is pi
    p = np.array([[1.0, 0.0, np.pi - 0.1, 0.5],
                  [3.0, 2.0, -np.pi + 0.1, 0.5]])
    pose = particles_to_pose(p)
    np.testing.assert_allclose(pose[:2], [2.0, 1.0])
    assert abs(abs(pose[2]) - np.pi) < 1e-6


def test_particles_to_pose_weighting():
    p = np.array([[0.0, 0.0, 0.0, 3.0], [4.0, 0.0, 0.0, 1.0]])
    np.testing.assert_allclose(particles_to_pose(p)[0], 1.0)


def test_estimate_trajectory_top_ratio():
    rng = np.random.default_rng(0)
    # 2 frames x 10 particles; one dominant particle per frame
    parts = np.zeros((2, 10, 4))
    parts[:, :, :2] = rng.normal(size=(2, 10, 2))
    parts[:, :, 3] = 1e-12
    parts[0, 3] = [5.0, 6.0, 0.3, 100.0]
    parts[1, 7] = [7.0, 8.0, -0.4, 100.0]
    traj = estimate_trajectory(parts, start_idx=0, ratio=0.8)
    assert traj.shape == (2, 3)
    np.testing.assert_allclose(traj[0, :2], [5.0, 6.0], atol=1e-8)
    np.testing.assert_allclose(traj[1, 2], -0.4, atol=1e-8)


def test_evaluate_ape_known_errors():
    gt = np.zeros((100, 3))
    est = gt.copy()
    est[:50, 0] = 0.04    # 4 cm error on half the frames
    est[50:, 0] = 0.15    # 15 cm on the rest
    r = evaluate_ape(est, gt)
    assert r["location_ptc5"] == 50.0
    assert r["location_ptc10"] == 50.0
    assert r["location_ptc20"] == 100.0
    rmse_cm = np.sqrt(np.mean([0.04**2] * 50 + [0.15**2] * 50)) * 100
    np.testing.assert_allclose(r["location_rmse"], rmse_cm, rtol=1e-6)
    assert r["yaw_rmse"] == 0.0


def test_evaluate_ape_association_and_yaw_wrap():
    ts_gt = np.arange(10.0)
    ts_est = ts_gt[::2] + 0.004          # within max_diff of every 2nd gt
    gt = np.zeros((10, 3))
    gt[:, 2] = np.pi - 0.05
    est = np.zeros((5, 3))
    est[:, 2] = -np.pi + 0.05            # true yaw error 0.1 rad, wrapped
    r = evaluate_ape(est, gt, ts_est=ts_est, ts_gt=ts_gt)
    assert r["frames"] == 5
    np.testing.assert_allclose(r["yaw_rmse"], np.degrees(0.1), rtol=1e-6)


def test_poses_to_tum_quaternion():
    poses = np.array([[1.0, 2.0, np.pi / 2]])
    row = poses_to_tum([3.5], poses)[0]
    np.testing.assert_allclose(row[:4], [3.5, 1.0, 2.0, 0.0])
    np.testing.assert_allclose(row[4:], [0, 0, np.sin(np.pi / 4),
                                         np.cos(np.pi / 4)], atol=1e-9)


# ---------------------------------------------------------------------------
# view_aabb (C32)
# ---------------------------------------------------------------------------

def test_box_corners():
    box = np.array([[0.0, 0.0, 0.0, 1.0, 2.0, 3.0]])
    c = box_corners(box)[0]
    assert c.shape == (8, 3)
    # all 8 distinct corners present
    expect = {(x, y, z) for x in (0.0, 1.0) for y in (0.0, 2.0)
              for z in (0.0, 3.0)}
    assert {tuple(p) for p in c} == expect


def test_wireframe_ply_roundtrip(tmp_path):
    aabbs = np.array([[0, 0, 0, 1, 1, 1], [2, 2, 2, 3.5, 4, 5]], float)
    path = str(tmp_path / "w.ply")
    write_wireframe_ply(path, aabbs)
    verts, edges = read_wireframe_ply(path)
    assert verts.shape == (16, 3)
    assert edges.shape == (24, 2)
    # every edge is axis-aligned with positive length
    d = verts[edges[:, 1]] - verts[edges[:, 0]]
    assert (np.sum(d != 0, axis=1) == 1).all()
    # second box edges index into the second 8 vertices
    assert edges[12:].min() == 8 and edges.max() == 15


def test_render_topdown(tmp_path):
    pytest.importorskip("matplotlib")
    from pcnerf_tpu.tools.view_aabb import render_topdown
    aabbs = np.array([[0, 0, 0, 1, 1, 1]], float)
    pts = np.random.default_rng(0).uniform(size=(100, 3))
    out = str(tmp_path / "t.png")
    render_topdown(out, aabbs, pts)
    import os
    assert os.path.getsize(out) > 1000
