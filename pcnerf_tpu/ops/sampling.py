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


def _ranks(keys):
    """Per-row rank of every element under a stable ascending sort.

    Two ``lax.sort`` calls (sort + inverse permutation) — the TPU-fast way
    to rank: sorts run on well-tiled vector hardware while per-element
    scatter/gather lowerings serialize (measured on v5e at eval sizes,
    (5120, 12289): 128 ms here vs 903 ms for vmapped
    ``searchsorted(method='sort')``, ~3 s for a scatter histogram, 6.4 s for
    a gather binary search — all producing identical integers).
    """
    iota = jax.lax.broadcasted_iota(jnp.int32, keys.shape, keys.ndim - 1)
    _, order = jax.lax.sort((keys, iota), num_keys=1, is_stable=True)
    _, ranks = jax.lax.sort((order, iota), num_keys=1)
    return ranks


def searchsorted_right(cdf, u, u_is_sorted: bool):
    """Batched ``searchsorted(cdf, u, side='right')`` via merge-ranking.

    Rank u's elements inside the merged [cdf, u] row (stable, cdf first, so
    equal cdf entries count as <= — exactly torch's right-side semantics):
    ``#{cdf_i <= u_k} = rank_in_merge(u_k) - rank_among_u(u_k)``.  When u is
    already sorted per row its internal rank is just arange, saving a sort.
    """
    m = cdf.shape[-1]
    merged_ranks = _ranks(jnp.concatenate([cdf, u], axis=-1))[..., m:]
    if u_is_sorted:
        u_ranks = jnp.arange(u.shape[-1], dtype=jnp.int32)
    else:
        u_ranks = _ranks(u)
    return merged_ranks - u_ranks


def inverse_cdf_interp(cdf, bins, u):
    """Piecewise-linear inverse-CDF evaluation, sort-native (no gathers).

    Classic NeRF ``sample_pdf`` interpolation: bracket each u between
    cdf[below]/cdf[above] (right-side searchsorted semantics) and lerp the
    corresponding ``bins``.  The textbook formulation is searchsorted + four
    ``take_along_axis`` gathers; on TPU big minor-axis gathers serialize
    (~0.5 s each at (5120, 8192) from (5120, 4097) on v5e, ~2 s of the
    reference-shape eval batch).  Instead:

    1. stable-sort the merged [cdf | u] row, carrying (is_u, bin, tag)
       payloads — equal values keep concat order, so ties count the cdf
       entry as <= u, exactly torch's right-side searchsorted;
    2. the bracketing values are forward/backward fills over the sorted
       row (cummax / reversed-cummin of masked values — cdf and bins are
       ascending), giving cdf_b/bin_b/cdf_a/bin_a with no indexing at all;
    3. interpolate elementwise, then one more stable sort by tag returns
       u's results to caller order.

    Two sorts + four scans, ~10x faster than the gather formulation at eval
    sizes, numerically identical (same bracketing indices, same arithmetic).
    Clipping semantics match ``below = max(inds-1, 0)``/``above =
    min(inds, M-1)``: cdf[0] == 0 <= u guarantees inds >= 1, and the
    backward fill's +inf tail (u beyond the last cdf) falls back to the last
    cdf/bin column.
    """
    r, m = cdf.shape
    k = u.shape[-1]
    dt = cdf.dtype
    keys = jnp.concatenate([cdf, u], axis=-1)
    is_cdf = jnp.concatenate([jnp.ones((r, m), jnp.int32),
                              jnp.zeros((r, k), jnp.int32)], axis=-1)
    binv = jnp.concatenate([bins, jnp.zeros((r, k), bins.dtype)], axis=-1)
    tag = jnp.concatenate([jnp.full((r, m), k, jnp.int32),
                           jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32),
                                            (r, k))], axis=-1)
    skey, smask, sbin, stag = jax.lax.sort((keys, is_cdf, binv, tag),
                                           num_keys=1, is_stable=True)
    mask = smask == 1
    neg = jnp.asarray(-jnp.inf, dt)
    pos = jnp.asarray(jnp.inf, dt)
    cdf_b = jax.lax.cummax(jnp.where(mask, skey, neg), axis=1)
    bin_b = jax.lax.cummax(jnp.where(mask, sbin, neg), axis=1)
    cdf_a = jnp.flip(jax.lax.cummin(
        jnp.flip(jnp.where(mask, skey, pos), 1), axis=1), 1)
    bin_a = jnp.flip(jax.lax.cummin(
        jnp.flip(jnp.where(mask, sbin, pos), 1), axis=1), 1)
    # u beyond the last cdf entry: above clips to the last column
    cdf_a = jnp.where(jnp.isposinf(cdf_a), cdf[:, -1:], cdf_a)
    bin_a = jnp.where(jnp.isposinf(bin_a), bins[:, -1:], bin_a)
    # unreachable when cdf[:,0] <= min(u), kept for robustness
    cdf_b = jnp.where(jnp.isneginf(cdf_b), cdf[:, :1], cdf_b)
    bin_b = jnp.where(jnp.isneginf(bin_b), bins[:, :1], bin_b)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (skey - cdf_b) / denom
    out = bin_b + t * (bin_a - bin_b)
    _, out_u = jax.lax.sort((stag, out), num_keys=1, is_stable=True)
    return out_u[:, :k]


def sample_pdf(key, bins, weights, n_samples: int, det: bool):
    """Inverse-CDF sampling of ``n_samples`` new z values per ray.

    Exact port of the classic NeRF ``sample_pdf`` as specialized in
    render.py:371-412 (which hardcoded its device move at :397): +1e-5
    stabilizer, right-sided searchsorted, flat-bin degenerate handling
    (denom < 1e-5 -> 1).  Index bracketing + interpolation run sort-native
    on TPU (:func:`inverse_cdf_interp`).

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
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,), dtype=cdf.dtype)
    return inverse_cdf_interp(cdf, bins, u)


def merge_sorted(z_vals, z_new):
    """Sorted union of base and importance samples (render.py:467)."""
    return jnp.sort(jnp.concatenate([z_vals, z_new], axis=-1), axis=-1)


def _dense_brackets(cdf, bins, u):
    """Right-side searchsorted brackets via dense masked reductions.

    For each u: ``cdf_b = max{cdf_i : cdf_i <= u}`` (ties included — exactly
    torch's right-side semantics), ``cdf_a = min{cdf_i : cdf_i > u}``, and
    the bin brackets ride the same masks (cdf and bins are both ascending in
    i, so the masked max/min of bins IS the bin at the bracketing index).
    These are the SAME four values the stable-sort + cummax-fill path
    produces (ops above), bit for bit — but computed in ONE fused
    broadcast-compare reduction pass over the (K, M) pair grid instead of a
    ~log^2(M+K)-pass compare-exchange sort network.  (Round-5 trace note:
    at TRAIN shapes the sorts are only ~2.8 ms of the 31 ms step — PERF.md
    "trace + knockouts" — so neither form is a train bottleneck; at EVAL
    shapes the bracketing sort is the dominant batch cost and the dense
    pass's O(M*K) compute is still worse.)  The dense pass is
    VPU-compute-bound with O(R) HBM traffic, which can win only when M*K
    is small (train shapes: 766 x 1536 per ray; measured 0.87x — declined).
    """
    dt = cdf.dtype
    neg = jnp.asarray(-jnp.inf, dt)
    pos = jnp.asarray(jnp.inf, dt)
    le = cdf[:, None, :] <= u[:, :, None]            # (R, K, M), fused below
    cdf_b = jnp.max(jnp.where(le, cdf[:, None, :], neg), axis=-1)
    bin_b = jnp.max(jnp.where(le, bins[:, None, :], neg), axis=-1)
    cdf_a = jnp.min(jnp.where(le, pos, cdf[:, None, :]), axis=-1)
    bin_a = jnp.min(jnp.where(le, pos, bins[:, None, :]), axis=-1)
    # clipping identical to the sort path: u beyond the last cdf entry falls
    # back to the last column; u below cdf[0] (unreachable, cdf[0] == 0) to
    # the first
    cdf_a = jnp.where(jnp.isposinf(cdf_a), cdf[:, -1:], cdf_a)
    bin_a = jnp.where(jnp.isposinf(bin_a), bins[:, -1:], bin_a)
    cdf_b = jnp.where(jnp.isneginf(cdf_b), cdf[:, :1], cdf_b)
    bin_b = jnp.where(jnp.isneginf(bin_b), bins[:, :1], bin_b)
    return cdf_b, bin_b, cdf_a, bin_a


def sample_pdf_merged_auto(key, z_vals, bins, weights, n_samples: int,
                           det: bool, mode: str = "auto"):
    """Dispatch between the sort-native and dense-reduction forms of
    ``sample_pdf_merged`` (bit-identical outputs — tests/test_sampling.py).

    ``auto`` picks dense when the per-ray (M x K) compare grid is small
    enough to be VPU-compute-cheap (train shapes; measured on v5e by
    scripts/pdf_dense_bench.py) and the sort network otherwise (eval
    shapes, where O(M*K) compute dwarfs the sort's bandwidth cost).

    The threshold is a COMPUTE dispatch rule, deliberately R-independent:
    dense mode's (R, K, M) where/reduce chain never materializes when XLA
    fuses it (verified at train shapes R=1024, M*K~1.2e6 on v5e), so peak
    memory is O(R*(M+K)) like the sort path.  It is NOT a memory-safety
    bound — a caller that breaks the fusion around ``_dense_brackets``
    (e.g. jnp.save of an intermediate, or donating it to a multi-consumer
    graph) reintroduces O(R*M*K) temporaries at large batch."""
    if mode == "auto":
        mode = ("dense" if bins.shape[-1] * n_samples <= 2_000_000
                else "sort")
    fn = sample_pdf_merged_dense if mode == "dense" else sample_pdf_merged
    return fn(key, z_vals, bins, weights, n_samples, det)


def sample_pdf_merged_dense(key, z_vals, bins, weights, n_samples: int,
                            det: bool):
    """``sample_pdf_merged`` with dense-reduction bracketing (see
    :func:`_dense_brackets`): bit-identical output, no bracketing sort.
    The only remaining sort is the final merge of ``[z_vals | out]`` —
    (R, N+K) wide, 1 array, vs the sort path's (R, M+K) 2-array bracketing
    sort + (R, N+M+K) merge.  tests/test_sampling.py asserts equality."""
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)

    if det:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,),
                               dtype=cdf.dtype)

    cdf_b, bin_b, cdf_a, bin_a = _dense_brackets(cdf, bins, u)
    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_b) / denom
    out = bin_b + t * (bin_a - bin_b)
    return jnp.sort(jnp.concatenate([z_vals, out], axis=-1), axis=-1)


def sample_pdf_merged(key, z_vals, bins, weights, n_samples: int, det: bool):
    """``merge_sorted(z_vals, sample_pdf(key, bins, weights, ...))`` fused.

    Every renderer merge-sorts the importance samples into the base z
    immediately, so the caller-order restore inside
    :func:`inverse_cdf_interp` (a (R, M+K) 2-payload sort) and the separate
    merge sort are wasted work.  Fused layout:

    1. the bracketing sort runs WITHOUT the ``tag`` payload (3 arrays wide
       instead of 4) — interpolation happens in sorted-by-u order;
    2. since cdf and bins are ascending, the interpolant is monotone in u,
       so the interpolated values at u-positions are ALREADY ascending along
       the sorted row; cdf positions are masked to +inf;
    3. one single-payload sort of ``[z_vals | masked_row]`` then yields the
       sorted union in its first ``len(z_vals) + n_samples`` columns (the
       +inf fillers sort to the tail).

    Sort traffic per fine pass drops ~40% vs the unfused chain (TPU sorts
    are multi-pass compare-exchange networks; cost ~ width x payload count).
    Exactness vs the unfused path (same key, both det modes) is asserted by
    tests/test_sampling.py.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)

    if det:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,),
                               dtype=cdf.dtype)

    r, m = cdf.shape
    k = n_samples
    dt = cdf.dtype
    keys = jnp.concatenate([cdf, u], axis=-1)
    # One payload instead of two: the is_cdf flag rides the payload with -inf
    # marking u rows — a value no finite bin can take, so bins may be ANY
    # finite z (near_child = near_c - surface_expand can dip slightly below 0
    # for rays entering a child AABB near the origin; a sign-based sentinel
    # would silently misclassify those rows — advisor r3, medium).  TPU
    # variadic sort cost scales with the number of arrays carried through the
    # compare-exchange network; 3 -> 2 arrays cuts the big (R, M+K) sort's
    # traffic by a third (measured: the pdf+merge stage is >half the train
    # step).  The sort is stable on the same single key as before, so the
    # permutation — and every downstream value — is bit-identical.
    binv = jnp.concatenate(
        [bins, jnp.full((r, k), -jnp.inf, bins.dtype)], axis=-1)
    skey, sbin = jax.lax.sort((keys, binv), num_keys=1, is_stable=True)
    mask = ~jnp.isneginf(sbin)
    neg = jnp.asarray(-jnp.inf, dt)
    pos = jnp.asarray(jnp.inf, dt)
    cdf_b = jax.lax.cummax(jnp.where(mask, skey, neg), axis=1)
    bin_b = jax.lax.cummax(jnp.where(mask, sbin, neg), axis=1)
    cdf_a = jnp.flip(jax.lax.cummin(
        jnp.flip(jnp.where(mask, skey, pos), 1), axis=1), 1)
    bin_a = jnp.flip(jax.lax.cummin(
        jnp.flip(jnp.where(mask, sbin, pos), 1), axis=1), 1)
    cdf_a = jnp.where(jnp.isposinf(cdf_a), cdf[:, -1:], cdf_a)
    bin_a = jnp.where(jnp.isposinf(bin_a), bins[:, -1:], bin_a)
    cdf_b = jnp.where(jnp.isneginf(cdf_b), cdf[:, :1], cdf_b)
    bin_b = jnp.where(jnp.isneginf(bin_b), bins[:, :1], bin_b)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (skey - cdf_b) / denom
    out = bin_b + t * (bin_a - bin_b)

    masked = jnp.where(mask, pos, out)          # u-interps only, cdf -> +inf
    merged = jnp.sort(jnp.concatenate([z_vals, masked], axis=-1), axis=-1)
    return merged[:, :z_vals.shape[-1] + k]
