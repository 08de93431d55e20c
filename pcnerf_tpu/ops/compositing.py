"""Volume compositing: occupancy -> transmittance weights -> depth, plus the
child-interval masks and segment-reduced child losses.

Reference semantics:

- weights/depth pipeline:       ``nof/render.py:51-61`` (train),
  ``:25-34`` (val), ``:205-221`` (legacy with opacity regularizer)
- adaptive child-mask expansion: ``nof/render.py:75-99`` (train),
  ``:251-263`` (eval, strict inequalities)
- child free / depth losses:     ``nof/render.py:102-159`` and the per-child
  grouping loops, re-expressed as ``segment_sum`` over child ids
  (no Python loop over the 15k children).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Transmittance weights
# ---------------------------------------------------------------------------

def occupancy_to_weights(prob_occ):
    """w_i = prod_{j<i}(1 - p_j) * p_i  (shifted-cumprod transmittance).

    render.py:52-55: prob_free shifted by a leading 1 column, cumprod, trimmed.
    """
    prob_free = 1.0 - prob_occ
    shifted = jnp.concatenate(
        [jnp.ones_like(prob_free[:, :1]), prob_free[:, :-1]], axis=-1)
    transmittance = jnp.cumprod(shifted, axis=-1)
    return transmittance * prob_occ


def normalize_weights(weights, epsilon: float = 1e-10):
    """w / (sum(w) + eps) per ray (render.py:60)."""
    return weights / (jnp.sum(weights, axis=-1, keepdims=True) + epsilon)


def add_weight_noise(key, weights, noise_std: float):
    """Gaussian perturbation of the raw weights (render.py:57-58).

    The shipped configs run with noise_std == 0; the branch is compiled away
    in that case.
    """
    if noise_std == 0:
        return weights
    return weights + noise_std * jax.random.normal(key, weights.shape, weights.dtype)


def composite_depth(weights, z_vals):
    return jnp.sum(weights * z_vals, axis=-1)


def opacity_regularizer(prob_occ):
    """mean(log(0.1+p) + log(0.1+1-p) + 2.20727) — render.py:224."""
    return jnp.mean(
        jnp.log(0.1 + prob_occ) + jnp.log(0.1 + 1.0 - prob_occ) + 2.20727)


# ---------------------------------------------------------------------------
# Child-interval masks (closed-form gamma expansion)
# ---------------------------------------------------------------------------

def child_mask(z_vals, near_child, far_child, *, gamma0: float,
               gamma_step: float = 0.01, strict: bool = False):
    """Per-ray sample mask for the (expanded) child interval.

    The reference grows ``expand_threshold`` from ``gamma0`` in ``gamma_step``
    increments, per ray, in a Python ``while`` loop until at least one sample
    falls inside [near-g, far+g] (render.py:77-99 with <=, :251-263 with <).
    Here the final gamma is computed in closed form: the smallest needed
    expansion over samples is ``g* = min_z max(near - z, z - far)`` and the
    loop's terminating threshold is ``gamma0 + step * ceil((g* - gamma0) /
    step)`` — one vectorized pass, no data-dependent control flow.

    Args:
      z_vals: (R, S); near_child/far_child: (R,).
      strict: use strict inequalities (the eval path, render.py:255).

    Returns (mask (R, S) bool, gamma (R,) the final per-ray expansion).
    """
    near = near_child[:, None]
    far = far_child[:, None]
    needed = jnp.max(jnp.stack([near - z_vals, z_vals - far], -1), -1)  # (R,S,2)->(R,S)
    g_star = jnp.min(needed, axis=-1)  # smallest expansion capturing >=1 sample
    k = jnp.ceil((g_star - gamma0) / gamma_step)
    # strict bounds need the sample strictly inside: if g* lands exactly on a
    # step boundary the loop would still take one more step (z == bound fails
    # the < test), hence the nextafter nudge before ceil under strict mode.
    if strict:
        k = jnp.floor((g_star - gamma0) / gamma_step) + 1.0
    gamma = gamma0 + gamma_step * jnp.maximum(k, 0.0)
    if strict:
        mask = (near - gamma[:, None] < z_vals) & (z_vals < far + gamma[:, None])
    else:
        mask = (near - gamma[:, None] <= z_vals) & (z_vals <= far + gamma[:, None])
    return mask, gamma


# ---------------------------------------------------------------------------
# Child losses (segment-reduced)
# ---------------------------------------------------------------------------

def _smooth_l1(pred, target):
    d = jnp.abs(pred - target)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def segment_sums_counts(values, child_ids, n_segments: int, axis_name=None):
    """Per-child (sum, count) of ``values``; global over the dp axis when
    ``axis_name`` is set (one psum over the (n_segments,) pair — counts ride
    the same all-reduce as sums)."""
    seg = jnp.round(child_ids).astype(jnp.int32)
    sums = jax.ops.segment_sum(values, seg, num_segments=n_segments)
    counts = jax.ops.segment_sum(jnp.ones_like(values), seg,
                                 num_segments=n_segments)
    if axis_name is not None:
        sums, counts = jax.lax.psum((sums, counts), axis_name)
    return sums, counts


def grad_psum_compensate(x, axis_name):
    """Make a globally-valued (replicated) loss compose with a pmean-of-grads
    train step.

    A divide loss built from psum'd segment sums already *equals* the global
    loss on every shard, but each shard's gradient only carries its local
    rays' contribution — the step's ``pmean`` over dp would then shrink the
    true gradient by 1/n_dp.  Returning ``n*x - (n-1)*stop_grad(x)`` keeps
    the value at ``x`` while scaling the gradient by ``n``, so
    pmean(grads) == the exact single-chip gradient.
    """
    if axis_name is None:
        return x
    n = jax.lax.psum(1, axis_name)
    return x * n - jax.lax.stop_gradient(x) * (n - 1)


def child_free_loss(weights, free_mask, child_ids, sub_nerf_count: int,
                    *, divide: bool, n_total=None, axis_name=None):
    """Mean squared out-of-child weight mass (render.py:102-125).

    Non-divide: sum(square(w_outside)) / N_rays.
    Divide: per child id c, sum over that child's rays of square(w_outside)
    divided by the ray count, summed over children with >= 1 ray — the
    reference's O(sub_nerf_count) Python loop as one ``segment_sum``.  Under
    dp (``axis_name``) the segment sums and counts are psum'd first, so the
    grouping is over the *global* batch exactly as on a single chip.
    """
    w_free = weights * (~free_mask).astype(weights.dtype)
    per_ray = jnp.sum(w_free * w_free, axis=-1)
    if not divide:
        # local sum over LOCAL count: sum_local/n_local pmean-reduces to the
        # reference's sum_global/free_num (render.py:121) under equal shards
        return jnp.sum(per_ray) / weights.shape[0]
    sums, counts = segment_sums_counts(per_ray, child_ids,
                                       sub_nerf_count + 1, axis_name)
    valid = counts >= 1
    out = jnp.sum(jnp.where(valid, sums / jnp.maximum(counts, 1.0), 0.0)[1:])
    return grad_psum_compensate(out, axis_name)


def child_depth_loss(weights, depth_mask, z_vals, ranges, child_ids,
                     sub_nerf_count: int, *, divide: bool,
                     epsilon: float = 1e-10, n_total=None, axis_name=None):
    """Child-masked renormalized depth vs. measured range (render.py:127-159).

    depth_c = sum(normalize(w * mask) * z * mask); loss contribution is
    0.1/N * SmoothL1(10*depth_c, 10*range) (mean semantics preserved in both
    grouping modes; divide mode groups over the global batch under dp).
    """
    m = depth_mask.astype(weights.dtype)
    w_child = weights * m
    w_child = w_child / (jnp.sum(w_child, axis=-1, keepdims=True) + epsilon)
    depth_c = jnp.sum(w_child * z_vals * m, axis=-1)
    elems = _smooth_l1(10.0 * depth_c, 10.0 * ranges)
    n = n_total or weights.shape[0]
    if not divide:
        # 1/near_num uses the GLOBAL batch size (render.py:131,:155); the
        # local mean is over local rays, whose pmean is the global mean
        return 0.1 / n * jnp.mean(elems)
    sums, counts = segment_sums_counts(elems, child_ids,
                                       sub_nerf_count + 1, axis_name)
    valid = counts >= 1
    # reference: (1/count) * 0.1 * mean over the group == 0.1 * sum / count^2
    per_child = jnp.where(valid, 0.1 * sums / jnp.maximum(counts, 1.0) ** 2, 0.0)
    return grad_psum_compensate(jnp.sum(per_child[1:]), axis_name)
