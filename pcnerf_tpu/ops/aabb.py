"""Vectorized ray/AABB geometry.

The reference carries five scalar Python variants of ray-box intersection
(``nof/dataset/ipb2dmapping.py:36-172`` and ``eval_kitti_render.py:170-235``).
Here they collapse into three batched primitives whose *semantics* match the
originals bit-for-bit on their defined domains, but which evaluate a whole ray
batch in one fused XLA computation (no per-ray Python):

- :func:`positive_plane_far`   == ``compute_far_bound``      (parent far)
- :func:`face_hit_intersect`   == ``compute_far_bound0606`` / ``0429``
- :func:`face_hit_first_two`   == ``compute_far_bound0406``
- :func:`slab_far_distance`    == ``ray_aabb_distances``     (eval parent far)

All functions accept numpy or jax arrays and are jit-safe (static shapes, no
data-dependent control flow).
"""

from __future__ import annotations

import jax.numpy as jnp

_BIG = jnp.inf


def positive_plane_far(origins, dirs, box_min, box_max):
    """Minimum positive distance to any of the six AABB planes.

    Semantics of ``compute_far_bound`` (ipb2dmapping.py:36-77): for each axis
    with a nonzero direction component, compute the two plane distances, map
    negatives to +inf, and take the min over all six.  Returns +inf where no
    positive plane hit exists (the scalar original returned ``None``).

    Args:
      origins: (..., 3) ray origins.
      dirs:    (..., 3) ray directions (need not be normalized).
      box_min, box_max: (3,) or broadcastable box bounds.

    Returns:
      (...,) distances.
    """
    d = jnp.asarray(dirs)
    o = jnp.asarray(origins)
    bmin = jnp.broadcast_to(jnp.asarray(box_min), o.shape)
    bmax = jnp.broadcast_to(jnp.asarray(box_max), o.shape)
    nonzero = d != 0
    safe_d = jnp.where(nonzero, d, 1.0)
    t_lo = jnp.where(nonzero, (bmin - o) / safe_d, _BIG)
    t_hi = jnp.where(nonzero, (bmax - o) / safe_d, _BIG)
    t_lo = jnp.where(t_lo < 0, _BIG, t_lo)
    t_hi = jnp.where(t_hi < 0, _BIG, t_hi)
    return jnp.minimum(t_lo.min(-1), t_hi.min(-1))


def slab_far_distance(origin, dirs, box_min, box_max):
    """Classic slab test returning the far hit or +inf on miss.

    Matches ``ray_aabb_distances`` (eval_kitti_render.py:213-235), including
    its IEEE division behavior: a zero direction component produces +/-inf
    slab distances which flow through the min/max unchanged.

    Args:
      origin: (3,) shared ray origin.
      dirs:   (R, 3) directions.
      box_min, box_max: (3,).

    Returns:
      (R,) far distances (tmax) where tmax >= tmin else +inf.
    """
    o = jnp.asarray(origin).reshape(1, 3)
    d = jnp.asarray(dirs)
    t1 = (jnp.asarray(box_min).reshape(1, 3) - o) / d
    t2 = (jnp.asarray(box_max).reshape(1, 3) - o) / d
    tmin = jnp.minimum(t1, t2).max(-1)
    tmax = jnp.maximum(t1, t2).min(-1)
    return jnp.where(tmax >= tmin, tmax, _BIG)


def _face_hits(o, d, bmin, bmax):
    """Shared face-hit enumeration for the 04xx/0606 family.

    For each of the six faces (axis-ordered: x_min, x_max, y_min, y_max,
    z_min, z_max) a hit is *effective* iff the ray moves toward the plane
    (``d[i]*(plane - o[i]) > 0``) and the hit point lies inside the face
    rectangle on both other axes (count >= 2) — ipb2dmapping.py:82-114.

    Returns (eff, t): boolean (..., 6) and float (..., 6).
    """
    o = jnp.asarray(o)
    d = jnp.asarray(d)
    bmin = jnp.broadcast_to(jnp.asarray(bmin), o.shape)
    bmax = jnp.broadcast_to(jnp.asarray(bmax), o.shape)

    effs, ts = [], []
    for axis in range(3):
        for plane in (bmin[..., axis], bmax[..., axis]):
            toward = d[..., axis] * (plane - o[..., axis]) > 0
            safe = jnp.where(d[..., axis] != 0, d[..., axis], 1.0)
            t = (plane - o[..., axis]) / safe
            p_end = o + t[..., None] * d
            inside = (p_end >= bmin) & (p_end <= bmax)
            count = (inside.sum(-1) - inside[..., axis].astype(jnp.int32))
            effs.append(toward & (count >= 2))
            ts.append(t)
    return jnp.stack(effs, -1), jnp.stack(ts, -1)


def face_hit_intersect(origins, dirs, box_min, box_max, *, exactly_two=False):
    """Face-hit intersection with 0/1/2/>2-hit handling.

    With ``exactly_two=False`` this is ``compute_far_bound0606``
    (ipb2dmapping.py:119-172): intersect iff any effective face hit; near/far
    are the min/max effective distances (a single hit yields near == far).

    With ``exactly_two=True`` this is ``compute_far_bound0429``
    (eval_kitti_render.py:170-211): intersect iff exactly two effective hits.

    Returns (intersect, near, far); near/far are 0 where not intersecting
    (matching the scalar originals).
    """
    eff, t = _face_hits(origins, dirs, box_min, box_max)
    n = eff.sum(-1)
    near = jnp.where(eff, t, _BIG).min(-1)
    far = jnp.where(eff, t, -_BIG).max(-1)
    if exactly_two:
        ok = n == 2
    else:
        ok = n > 0
    near = jnp.where(ok, near, 0.0)
    far = jnp.where(ok, far, 0.0)
    return ok, near, far


def face_hit_first_two(origins, dirs, box_min, box_max):
    """``compute_far_bound0406`` (ipb2dmapping.py:82-114): takes the *first
    two* effective hits in face-enumeration order and sorts them.  The scalar
    original raises on fewer than two hits; here rays with < 2 hits return
    (False, 0, 0) so callers can mask.
    """
    eff, t = _face_hits(origins, dirs, box_min, box_max)
    order = jnp.arange(6)
    key = jnp.where(eff, order, 99)
    first = key.min(-1)
    key2 = jnp.where(key == first[..., None], 99, key)
    second = key2.min(-1)
    ok = second < 99
    t_first = jnp.take_along_axis(t, jnp.minimum(first, 5)[..., None], -1)[..., 0]
    t_second = jnp.take_along_axis(t, jnp.minimum(second, 5)[..., None], -1)[..., 0]
    near = jnp.minimum(t_first, t_second)
    far = jnp.maximum(t_first, t_second)
    near = jnp.where(ok, near, 0.0)
    far = jnp.where(ok, far, 0.0)
    return ok, near, far


def perpendicular_distance_to_ray(origin, direction, points):
    """Perpendicular point-to-ray distance via dist*sin(angle).

    Matches ``distance_to_ray`` (eval_kitti_render.py:237-244) including its
    numerics: no clipping of the cosine, so points nearly collinear with the
    ray can produce NaN (which the <= threshold comparisons then exclude,
    exactly as in the reference).
    """
    v = jnp.asarray(points) - jnp.asarray(origin).reshape(1, 3)
    dist = jnp.sqrt((v * v).sum(-1))
    cos = (v * jnp.asarray(direction).reshape(1, 3)).sum(-1) / dist
    sin = jnp.sqrt(1.0 - cos * cos)
    return dist * sin
