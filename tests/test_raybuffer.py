"""Ray-buffer compiler on a hand-constructed synthetic scene."""

import numpy as np

from pcnerf_tpu.data.raybuffer import assign_children, ray_geometry, val_subsample


def test_assign_children_nearest_containing():
    # two overlapping boxes; the point is inside both; nearer center wins
    aabbs = np.array([
        [0.0, 0.0, 0.0, 2.0, 2.0, 2.0],    # center (1,1,1)
        [1.0, 1.0, 1.0, 3.0, 3.0, 3.0],    # center (2,2,2)
        [10.0, 10.0, 10.0, 11.0, 11.0, 11.0],
    ], np.float32)
    pts = np.array([
        [1.2, 1.2, 1.2],    # inside boxes 0 and 1; center 0 nearer
        [1.9, 1.9, 1.9],    # inside both; center 1 nearer
        [5.0, 5.0, 5.0],    # inside none
    ], np.float32)
    found, child = assign_children(pts, aabbs, chunk=8, k=3)
    assert found.tolist() == [True, True, False]
    assert child[0] == 0 and child[1] == 1


def test_ray_geometry_bounds():
    origin = np.zeros(3, np.float32)
    dirs = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32)
    c_lo = np.array([[5.0, -1.0, -1.0], [(-1.0), 5.0, -1.0]], np.float32)
    c_hi = np.array([[6.0, 1.0, 1.0], [1.0, 6.0, 1.0]], np.float32)
    p_lo = np.array([-10.0, -10.0, -10.0], np.float32)
    p_hi = np.array([20.0, 20.0, 20.0], np.float32)
    ok, near, far, far_p = ray_geometry(origin, dirs, c_lo, c_hi, p_lo, p_hi,
                                        0.05, kitti=True, chunk=8)
    assert ok.all()
    np.testing.assert_allclose(near, [5.0 - 0.05] * 2, rtol=1e-5)
    np.testing.assert_allclose(far, [6.0 + 0.05] * 2, rtol=1e-5)
    np.testing.assert_allclose(far_p, [20.0, 20.0], rtol=1e-5)
    # parent far clamps to child far when smaller
    p_hi2 = np.array([5.5, 5.5, 5.5], np.float32)
    ok, near, far, far_p = ray_geometry(origin, dirs, c_lo, c_hi, p_lo, p_hi2,
                                        0.05, kitti=True, chunk=8)
    np.testing.assert_allclose(far_p, far, rtol=1e-5)


def test_val_subsample_linspace_semantics():
    rays = np.arange(100, dtype=np.float32).reshape(-1, 1).repeat(15, 1)
    ranges = np.arange(100, dtype=np.float32)
    rv, gv = val_subsample(rays, ranges, 10)
    # floor(linspace(1, 98, 10)) row picks (ipb2dmapping.py:868-871)
    want = np.floor(np.linspace(1.0, 98.0, 10, dtype=np.float32)).astype(int)
    np.testing.assert_array_equal(gv, ranges[want])
