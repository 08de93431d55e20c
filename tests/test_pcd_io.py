"""PCD IO roundtrips + real reference artifacts."""

import os

import numpy as np

from pcnerf_tpu.data import pcd_aabb, read_pcd, write_pcd

REF = "/root/reference"


def test_roundtrip_binary(tmp_path):
    pts = np.random.default_rng(0).normal(size=(1000, 3)).astype(np.float32)
    p = str(tmp_path / "a.pcd")
    write_pcd(p, pts)
    back = read_pcd(p)
    np.testing.assert_array_equal(back, pts)


def test_roundtrip_ascii(tmp_path):
    pts = np.random.default_rng(1).normal(size=(100, 3)).astype(np.float32)
    p = str(tmp_path / "a.pcd")
    write_pcd(p, pts, binary=False)
    np.testing.assert_allclose(read_pcd(p), pts, rtol=1e-6)


def test_read_reference_cloud():
    path = os.path.join(REF, "data/kitti/00/pcd_remove_dynamic/1151.pcd")
    if not os.path.exists(path):
        return
    pts = read_pcd(path)
    assert pts.shape == (117594, 3)
    assert np.isfinite(pts).all()
    lo, hi = pcd_aabb(pts, pad=0.025)
    assert (hi > lo).all()
