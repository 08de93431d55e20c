"""Point-cloud metrics: Chamfer distance + F-score, computed on device.

Reference: ``nof/criteria/pointcloud_metrics.py`` (Open3D KDTreeFlann,
per-point Python loop — C12) and the offline
``logs/*/render_result/print_metrics.py``.  Here the bidirectional
nearest-neighbor search is a tiled distance computation on the MXU with a
running (min, argmin) over target tiles — no host round-trips.

Numerical design (the round-1 version was wrong here): the expanded square
``|q-t|^2 = |q|^2 - 2 q.t + |t|^2`` cancels catastrophically when points sit
tens of meters from the origin and true distances are centimeters — and the
TPU's default-bf16 matmul made the per-candidate noise O(1) m², so the min
over ~1e5 candidates was biased hard toward zero.  Three fixes compose:

  1. both clouds are centered on the target centroid (distances are
     translation-invariant), shrinking ``|q|^2``/``|t|^2``;
  2. the matmul runs at ``Precision.HIGHEST`` (true f32 accumulate);
  3. the matmul is only trusted to pick the *argmin*; the returned distance
     is recomputed exactly at that argmin as ``sum((q - t)^2)`` — direct
     subtraction, no cancellation.

The result matches the exact CPU path (``native.nn_distances``) to f32
rounding; ``tests/test_metrics_device.py`` enforces equality on the
reference's own shipped artifacts and reproduction of BASELINE.md.

Semantics preserved exactly (pointcloud_metrics.py:37-49):
  dist1 = NN distance of each *gt* point into pred, dist2 = each pred point
  into gt; precision = mean(dist1 < thr), recall = mean(dist2 < thr);
  F = 2pr/(p+r); CD = mean(dist1) + mean(dist2).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

_Q_TILE = 4096
_T_TILE = 16384


@functools.partial(jax.jit, static_argnames=("t_valid",))
def _nn_exact_d2(query, target, t_valid: int):
    """(Q,) exact min squared distance from each query row to
    target[:t_valid].  Argmin via tiled HIGHEST-precision matmul, value via
    exact recompute at the argmin."""
    q2 = jnp.sum(query * query, axis=-1, keepdims=True)           # (Q, 1)
    n_tiles = target.shape[0] // _T_TILE

    def body(i, carry):
        best_d2, best_idx = carry
        t = jax.lax.dynamic_slice(target, (i * _T_TILE, 0), (_T_TILE, 3))
        t2 = jnp.sum(t * t, axis=-1)[None, :]
        qt = jax.lax.dot_general(
            query, t.T, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
        d2 = q2 - 2.0 * qt + t2                                   # (Q, T_TILE)
        col = i * _T_TILE + jnp.arange(_T_TILE)[None, :]
        d2 = jnp.where(col < t_valid, d2, jnp.inf)
        tile_min = d2.min(axis=-1)
        tile_arg = i * _T_TILE + jnp.argmin(d2, axis=-1)
        take = tile_min < best_d2
        return (jnp.where(take, tile_min, best_d2),
                jnp.where(take, tile_arg, best_idx))

    init = (jnp.full((query.shape[0],), jnp.inf, query.dtype),
            jnp.zeros((query.shape[0],), jnp.int32))
    _, best_idx = jax.lax.fori_loop(0, n_tiles, body, init)
    nearest = jnp.take(target, best_idx, axis=0)                  # (Q, 3)
    diff = query - nearest
    return jnp.sum(diff * diff, axis=-1)


def nn_dists_device(target: np.ndarray, query: np.ndarray) -> np.ndarray:
    """Exact NN distance from each query point to the target set (device)."""
    t = np.asarray(target, np.float32)
    q = np.asarray(query, np.float32)
    nt, nq = t.shape[0], q.shape[0]
    center = t.mean(axis=0, dtype=np.float64).astype(np.float32)
    t = t - center
    q = q - center
    t_pad = -(-nt // _T_TILE) * _T_TILE
    tj = jnp.asarray(np.pad(t, ((0, t_pad - nt), (0, 0))))
    out = np.empty(nq, np.float32)
    for s in range(0, nq, _Q_TILE):
        e = min(s + _Q_TILE, nq)
        qc = np.pad(q[s:e], ((0, _Q_TILE - (e - s)), (0, 0)))
        d2 = _nn_exact_d2(jnp.asarray(qc), tj, nt)
        out[s:e] = np.asarray(d2)[:e - s]
    return np.sqrt(out)


def chamfer_fscore(pred: np.ndarray, gt: np.ndarray, threshold: float = 0.2,
                   *, use_device: bool = True):
    """(cd, fscore) with the reference's exact formula."""
    if pred.shape[0] == 0 or gt.shape[0] == 0:
        return float("nan"), float("nan")
    if use_device:
        dist1 = nn_dists_device(pred, gt)   # gt -> pred
        dist2 = nn_dists_device(gt, pred)   # pred -> gt
    else:
        from pcnerf_tpu.native import nn_distances
        dist1 = nn_distances(pred, gt)
        dist2 = nn_distances(gt, pred)
    precision = float((dist1 < threshold).mean())
    recall = float((dist2 < threshold).mean())
    f = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    cd = float(dist1.mean() + dist2.mean())
    return cd, f
