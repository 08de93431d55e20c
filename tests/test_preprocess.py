"""Preprocessing components: ground filter, clustering, grid split, fusion."""

import numpy as np
import pytest

from pcnerf_tpu.native import ground_filter, native_available, nn_distances, region_grow
from pcnerf_tpu.preprocess.fusion import corridor_mask, crop_scan
from pcnerf_tpu.preprocess.split import grid_split_cluster, huafen_edges

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native lib unavailable")


def test_ground_filter_separates_plane():
    rng = np.random.default_rng(0)
    ground = np.c_[rng.uniform(-20, 20, (20000, 2)), rng.normal(0, 0.05, 20000)]
    walls = np.c_[rng.uniform(-20, 20, (3000, 1)),
                  rng.uniform(-20, 20, (3000, 1)),
                  rng.uniform(0.8, 3.0, (3000, 1))]
    pts = np.vstack([ground, walls]).astype(np.float32)
    g, ng = ground_filter(pts, sensor_height=0.0)
    assert g[:20000].mean() > 0.99
    assert g[20000:].mean() < 0.01
    assert ng[20000:].mean() > 0.99
    # clip_above drops z > 4.0
    high = np.array([[0, 0, 5.0]], np.float32)
    g2, ng2 = ground_filter(np.vstack([pts, high]), sensor_height=0.0)
    assert not ng2[-1] and not g2[-1]


def test_region_grow_matches_bruteforce():
    rng = np.random.default_rng(1)
    blobs = [rng.normal(c, 0.08, (40, 3)) for c in
             [(0, 0, 0), (3, 0, 0), (0, 3, 0), (5, 5, 1)]]
    noise = rng.uniform(8, 9, (5, 3))  # sparse, below min_cluster
    pts = np.vstack(blobs + [noise]).astype(np.float32)
    labels, k = region_grow(pts, radius=0.35, min_cluster=15)
    assert k == 4
    for b in range(4):
        seg = labels[b * 40:(b + 1) * 40]
        assert (seg == seg[0]).all() and seg[0] >= 0
    assert (labels[160:] == -1).all()


def test_nn_distances_exact():
    rng = np.random.default_rng(2)
    t = rng.uniform(-10, 10, (500, 3)).astype(np.float32)
    q = rng.uniform(-12, 12, (200, 3)).astype(np.float32)
    got = nn_distances(t, q, cell=0.5)
    d2 = ((q[:, None, :] - t[None, :, :]) ** 2).sum(-1)
    want = np.sqrt(d2.min(1))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_huafen_edges_reference_semantics():
    # length > 2*threshold, remainder <= half: int(len/th)+1 edges
    e = huafen_edges(2.4, 1.0, 0.0, 2.4)
    np.testing.assert_allclose(e, [0.0, 1.0, 2.45])
    # remainder > half: one more cell
    e = huafen_edges(2.6, 1.0, 0.0, 2.6)
    np.testing.assert_allclose(e, [0.0, 1.0, 2.0, 2.65])
    # short extent: single cell
    e = huafen_edges(1.5, 1.0, 0.0, 1.5)
    np.testing.assert_allclose(e, [0.0, 1.55])


def test_grid_split_covers_all_points():
    rng = np.random.default_rng(3)
    pts = rng.uniform(0, 5, (5000, 3)).astype(np.float32)
    cells = grid_split_cluster(pts, 1.0, 1.0)
    assert sum(c.shape[0] for c in cells) == 5000
    for c in cells:
        ext = c.max(0) - c.min(0)
        assert (ext <= 1.06).all()  # cell size + the 0.05 edge slack


def test_crop_and_corridor():
    pts = np.array([
        [0.1, 0.1, 0.1],     # inside body -> dropped
        [5.0, 0.0, 0.0],     # kept
        [0.0, 0.0, 130.0],   # beyond max range -> dropped
    ], np.float32)
    out = crop_scan(pts, (2, 1, 0.5), 120.0, None, None)
    assert out.shape == (1, 3)
    traj = np.array([[0.0, 0.0], [50.0, 0.0]])
    m = corridor_mask(np.array([[1.0, 1.0], [30.0, 25.0], [49.0, 19.0]]),
                      traj, 20.0, 20.0)
    assert m.tolist() == [True, False, True]
