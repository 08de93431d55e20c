"""Ray/AABB kernels vs. scalar reference-semantics oracles."""

import numpy as np
import pytest

from pcnerf_tpu.ops import (
    face_hit_first_two,
    face_hit_intersect,
    perpendicular_distance_to_ray,
    positive_plane_far,
    slab_far_distance,
)
from tests.oracle import face_hits_scalar, far_bound_scalar


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def _random_rays_boxes(rng, n=256):
    o = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    center = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    half = rng.uniform(0.2, 4.0, (n, 3)).astype(np.float32)
    return o, d, (center - half).astype(np.float32), (center + half).astype(np.float32)


def test_positive_plane_far(rng):
    o, d, bmin, bmax = _random_rays_boxes(rng)
    got = np.asarray(positive_plane_far(o, d, bmin, bmax))
    for i in range(o.shape[0]):
        want = far_bound_scalar(o[i], d[i], bmin[i], bmax[i])
        if np.isinf(want):
            assert np.isinf(got[i])
        else:
            np.testing.assert_allclose(got[i], want, rtol=1e-4)


def test_face_hit_intersect_0606(rng):
    o, d, bmin, bmax = _random_rays_boxes(rng)
    ok, near, far = (np.asarray(v) for v in face_hit_intersect(o, d, bmin, bmax))
    for i in range(o.shape[0]):
        hits = face_hits_scalar(o[i], d[i], bmin[i], bmax[i])
        assert ok[i] == (len(hits) > 0)
        if hits:
            np.testing.assert_allclose(near[i], min(hits), rtol=1e-4)
            np.testing.assert_allclose(far[i], max(hits), rtol=1e-4)


def test_face_hit_exactly_two_0429(rng):
    o, d, bmin, bmax = _random_rays_boxes(rng)
    ok, near, far = (np.asarray(v) for v in
                     face_hit_intersect(o, d, bmin, bmax, exactly_two=True))
    for i in range(o.shape[0]):
        hits = face_hits_scalar(o[i], d[i], bmin[i], bmax[i])
        assert ok[i] == (len(hits) == 2)
        if len(hits) == 2:
            np.testing.assert_allclose(near[i], min(hits), rtol=1e-4)


def test_face_hit_first_two_0406(rng):
    o, d, bmin, bmax = _random_rays_boxes(rng)
    ok, near, far = (np.asarray(v) for v in face_hit_first_two(o, d, bmin, bmax))
    for i in range(o.shape[0]):
        hits = face_hits_scalar(o[i], d[i], bmin[i], bmax[i])
        if len(hits) >= 2:
            assert ok[i]
            lo, hi = sorted(hits[:2])
            np.testing.assert_allclose(near[i], lo, rtol=1e-4)
            np.testing.assert_allclose(far[i], hi, rtol=1e-4)
        else:
            assert not ok[i]


def test_slab_matches_reference_formula(rng):
    o = rng.uniform(-5, 5, 3)
    d = rng.normal(size=(512, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    bmin, bmax = np.array([-10.0, -8.0, -2.0]), np.array([30.0, 8.0, 0.5])
    got = np.asarray(slab_far_distance(o, d, bmin, bmax))
    # independent slab computation
    t1 = (bmin[None] - o[None]) / d
    t2 = (bmax[None] - o[None]) / d
    tmin = np.minimum(t1, t2).max(-1)
    tmax = np.maximum(t1, t2).min(-1)
    want = np.where(tmax >= tmin, tmax, np.inf)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_perpendicular_distance(rng):
    o = np.zeros(3)
    d = np.array([1.0, 0.0, 0.0])
    pts = rng.uniform(-5, 5, (64, 3))
    got = np.asarray(perpendicular_distance_to_ray(o, d, pts))
    want = np.sqrt(pts[:, 1] ** 2 + pts[:, 2] ** 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
