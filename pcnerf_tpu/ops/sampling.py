"""Ray sampling: stratified / segmented z generation, perturbation, and
inverse-CDF importance sampling.

Reference semantics:

- stratified + segmented sampling: ``nof/render.py:429-442``
- perturbation within strata:      ``nof/render.py:448-454``
- ``sample_pdf`` importance:       ``nof/render.py:371-412``

All functions are jit-safe with static shapes.  Randomness uses ``jax.random``
with explicit keys (the torch originals draw from global RNG state; parity
tests run with perturb=0 / det=True where both are deterministic).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stratified_z(near, far, n_samples: int):
    """Uniform z in [near, far]: ``z = near*(1-s) + far*s``, s=linspace(0,1)."""
    steps = jnp.linspace(0.0, 1.0, n_samples, dtype=jnp.float32)
    return near[:, None] * (1.0 - steps) + far[:, None] * steps


def segmented_z(near, far, near_child, far_child, n_samples: int, child_ratio: float):
    """Parent/child segmented sampling (render.py:433-442).

    ``int(N*(1-ratio))`` samples span the parent interval and the remainder
    the child interval; the union is sorted per ray.
    """
    parent_n = int(n_samples * (1.0 - child_ratio))
    child_n = n_samples - parent_n
    zp = stratified_z(near, far, parent_n)
    zc = stratified_z(near_child, far_child, child_n)
    return jnp.sort(jnp.concatenate([zp, zc], axis=-1), axis=-1)


def perturb_z(key, z_vals, perturb: float):
    """Jitter each sample within its stratum (render.py:448-454)."""
    mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
    upper = jnp.concatenate([mid, z_vals[:, -1:]], axis=-1)
    lower = jnp.concatenate([z_vals[:, :1], mid], axis=-1)
    u = perturb * jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
    return lower + (upper - lower) * u


def sample_pdf(key, bins, weights, n_samples: int, det: bool):
    """Inverse-CDF sampling of ``n_samples`` new z values per ray.

    Exact port of the classic NeRF ``sample_pdf`` as specialized in
    render.py:371-412 (which hardcoded its device move at :397): +1e-5
    stabilizer, right-sided searchsorted, flat-bin degenerate handling
    (denom < 1e-5 -> 1).

    Args:
      bins:    (R, M) sorted midpoints.
      weights: (R, M-1) unnormalized weights (callers pass w[..., 1:-1]).
      det:     deterministic (linspace) u values; used when perturb == 0.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (R, M)

    if det:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
        # u is a fixed uniform grid, so right-searchsorted reduces to a
        # bucket histogram + cumsum: inds_k = #{cdf_i <= k/(n-1)} and
        # #{cdf_i <= k/(n-1)} == cumsum(bincount(ceil(cdf*(n-1))))_k.
        # (On TPU the generic searchsorted lowerings cost 0.9-5.9 s at eval
        # sizes; this is a few ms.)  Boundary ties follow the float rounding
        # of cdf*(n-1), matching the comparison to within one ulp.
        buckets = jnp.ceil(cdf * (n_samples - 1)).astype(jnp.int32)
        buckets = jnp.clip(buckets, 0, n_samples)
        hist = jax.vmap(lambda b: jnp.zeros(n_samples + 1, jnp.int32).at[b].add(1))(buckets)
        inds = jnp.cumsum(hist[..., :-1], axis=-1)
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,), dtype=cdf.dtype)
        # method='sort' ranks u against cdf via one fused sort instead of a
        # binary-search scan of dynamic gathers: on TPU the scan lowering
        # costs ~5.9 s for a (5120, 4095)x8192 batch vs ~0.9 s for the sort
        # (measured on v5e; identical integer results)
        inds = jax.vmap(
            lambda c, v: jnp.searchsorted(c, v, side="right", method="sort"))(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    bins_b = jnp.take_along_axis(bins, below, axis=-1)
    bins_a = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)


def merge_sorted(z_vals, z_new):
    """Sorted union of base and importance samples (render.py:467)."""
    return jnp.sort(jnp.concatenate([z_vals, z_new], axis=-1), axis=-1)
