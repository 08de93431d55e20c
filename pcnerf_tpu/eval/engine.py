"""Batched one/two-step depth inference engine — fully on device.

Reference: ``inference_0525_2`` + ``render_rays_view_0525_2_2``
(``nof/render.py:229-368, 614-699``).  The reference's per-ray CPU round
trips (scipy ``gaussian_filter`` per ray at :302-307, Python group walks at
:317-340, per-ray point reconstruction at :674-684) are re-derived as one
jitted XLA program:

- Gaussian smoothing of the weight rows = a single depthwise convolution
  with scipy's exact sigma=5 kernel (radius = int(4*sigma + 0.5), reflect
  padding);
- the sequential candidate-group walk = segment reductions over group ids:
  "first row whose smoothed argmax falls inside its child mask, else the
  first row of maximal in-child weight mass" (render.py:317-340);
- child masks use the closed-form strict gamma expansion (gamma0 = 0.01).

Batch rows are padded to a static shape; padding rows form singleton groups
marked invalid.  BatchNorm is folded into the Linear weights (eval mode), so
the MLP is 9 matmuls with VMEM-resident weights; sample points are processed
in ray-chunks via ``lax.map`` to bound activation memory (the reference's
``chunk`` flag, render.py:236-239, now an internal tiling detail).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from pcnerf_tpu.config import EvalConfig, ModelConfig
from pcnerf_tpu.models import collapse_active, collapse_folded_params, embed_positions, nof_apply_folded
from pcnerf_tpu.models.embedding import embedded_dot
from pcnerf_tpu.ops import compositing as C
from pcnerf_tpu.ops import sampling as S


def scipy_gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """scipy.ndimage's order-0 gaussian kernel, bit-for-bit."""
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1)
    phi = np.exp(-0.5 / (sigma * sigma) * x * x)
    return (phi / phi.sum()).astype(np.float32)


def _smooth_rows(w, kernel):
    """Per-row 1-D convolution with reflect padding (scipy 'reflect')."""
    r = (kernel.shape[0] - 1) // 2
    left = w[:, :r][:, ::-1]
    right = w[:, -r:][:, ::-1]
    padded = jnp.concatenate([left, w, right], axis=-1)[:, None, :]
    out = jax.lax.conv_general_dilated(
        padded, kernel[None, None, :], window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"))
    return out[:, 0, :]


def _occupancy_chunked(folded, origins, dirs, z_vals, mcfg: ModelConfig,
                       ray_chunk: int):
    """(R, S) occupancy via lax.map over ray chunks (bounded activations)."""
    R, Ns = z_vals.shape

    def one_chunk(args):
        o, d, z = args
        pts = o[:, None, :] + d[:, None, :] * z[..., None]
        emb = embed_positions(pts.reshape(-1, 3), mcfg.n_freq, mcfg.logscale)
        return nof_apply_folded(folded, emb, mcfg).reshape(z.shape)

    n_chunks = R // ray_chunk
    o = origins.reshape(n_chunks, ray_chunk, 3)
    d = dirs.reshape(n_chunks, ray_chunk, 3)
    z = z_vals.reshape(n_chunks, ray_chunk, Ns)
    occ = jax.lax.map(one_chunk, (o, d, z))
    return occ.reshape(R, Ns)


def _occupancy_collapsed(model, origins, dirs, z_vals, mcfg: ModelConfig):
    """(R, S) occupancy via the affine-collapsed single-logit evaluation.

    One fused elementwise pass over the sample points (band-wise weighted
    sin/cos sum, ``embedded_dot``) — no chunking needed: nothing larger than
    the (R, S) occupancy itself is materialized.
    """
    w_eff, b_eff = model["w_eff"], model["b_eff"]
    pts = origins[:, None, :] + dirs[:, None, :] * z_vals[..., None]
    logits = embedded_dot(pts, w_eff, mcfg.n_freq, mcfg.logscale)
    return jax.nn.sigmoid(logits + b_eff.reshape(()))


# Above this many sample points the fused path's (3, N) f32 coordinate
# materialization (12 bytes/point, ~2 HBM copies live) stops paying:
# KITTI two-step batches are 64.5M points (0.8 GB — fused, measured 1.21x
# the XLA frame), MaiCity's 18432-row batches are 344M (4.1 GB, which
# OOM'd a 15.75G chip alongside the sort chain's buffers —
# logs_bg/eval_mai_s90_e1_r5.log).  The XLA band-wise form materializes
# nothing, so it takes over at sizes where HBM is the binding constraint.
FUSED_EVAL_MAX_POINTS = 100_000_000


def _occupancy_collapsed_fused(model, origins, dirs, z_vals, mcfg: ModelConfig):
    """Collapsed occupancy via the Pallas fused-embedding matvec
    (``ops/pallas_train.py:embed_affine``): 5x fewer transcendentals than
    the XLA band-wise form (the eval-frame profile's dominant occupancy
    cost, PERF.md) via the power-of-two sin/cos recurrence.  Falls back
    to the XLA form above ``FUSED_EVAL_MAX_POINTS`` (static shape check)."""
    r, s = z_vals.shape
    if r * s > FUSED_EVAL_MAX_POINTS:
        return _occupancy_collapsed(model, origins, dirs, z_vals, mcfg)
    from pcnerf_tpu.ops import pallas_train as PT
    w_eff, b_eff = model["w_eff"], model["b_eff"]
    pts = origins[:, None, :] + dirs[:, None, :] * z_vals[..., None]
    x_t, n_valid = PT.pad_points_t(pts.reshape(r * s, 3))
    rows = PT._rows(mcfg.n_freq)
    d = w_eff.shape[0]
    w_aug = jnp.zeros((rows, 1), jnp.float32)
    w_aug = w_aug.at[:d, 0].set(w_eff[:, 0]).at[d, 0].set(b_eff.reshape(()))
    logits = PT.embed_affine(x_t, w_aug, mcfg.n_freq)[0, :n_valid]
    return jax.nn.sigmoid(logits).reshape(r, s)


def _pass(folded, origins, dirs, z_vals, near_c, far_c, seg_id, n_groups,
          valid, kernel, mcfg, epsilon, method, ray_chunk, mlp_mode):
    """One coarse-or-fine pass: occupancy -> weights -> peak select -> depth.

    Returns (depth, weights, flag) — the ``inference_0525_2`` triple.
    """
    if mlp_mode == "collapsed_fused":
        occ = _occupancy_collapsed_fused(folded, origins, dirs, z_vals, mcfg)
    elif mlp_mode == "collapsed":
        occ = _occupancy_collapsed(folded, origins, dirs, z_vals, mcfg)
    elif mlp_mode == "pallas":
        from pcnerf_tpu.ops.pallas_kernels import fused_occupancy
        occ = fused_occupancy(folded, origins, dirs, z_vals, mcfg)
    else:
        occ = _occupancy_chunked(folded, origins, dirs, z_vals, mcfg, ray_chunk)
    return pass_from_occ(occ, z_vals, near_c, far_c, seg_id, n_groups, valid,
                         kernel, epsilon, method)


def pass_from_occ(occ, z_vals, near_c, far_c, seg_id, n_groups, valid,
                  kernel, epsilon, method):
    """``inference_0525_2`` (render.py:229-368) from precomputed occupancy;
    exposed separately for oracle parity tests."""
    w = C.occupancy_to_weights(occ)
    w = C.normalize_weights(w, epsilon)

    mask_child, _ = C.child_mask(z_vals, near_c, far_c, gamma0=0.01,
                                 strict=True)

    # peak search (render.py:302-340)
    smoothed = _smooth_rows(w, kernel)
    peak_idx = jnp.argmax(smoothed, axis=-1)
    peak_in_child = jnp.take_along_axis(
        mask_child, peak_idx[:, None], axis=-1)[:, 0] & valid
    mass = jnp.where(valid, jnp.sum(w * mask_child, axis=-1), -jnp.inf)

    n_rows = w.shape[0]
    row = jnp.arange(n_rows)
    big = jnp.int32(n_rows + 1)
    # first row in each group whose peak lies inside its child interval
    peak_row = jax.ops.segment_min(jnp.where(peak_in_child, row, big), seg_id,
                                   num_segments=n_groups)
    has_peak = peak_row < big
    # else: first row of maximal child weight mass (strict-greater update ==
    # earliest argmax, render.py:334-336)
    gmax = jax.ops.segment_max(mass, seg_id, num_segments=n_groups)
    is_max = mass == gmax[seg_id]
    max_row = jax.ops.segment_min(jnp.where(is_max, row, big), seg_id,
                                  num_segments=n_groups)
    sel = jnp.where(has_peak, peak_row, max_row)
    flag = (row == sel[seg_id]) & valid

    if method == 2:
        w_child = w * mask_child.astype(w.dtype)
        w_child = w_child / (jnp.sum(w_child, -1, keepdims=True) + epsilon)
        depth = jnp.sum(w_child * z_vals, axis=-1)
    else:
        depth = jnp.sum(w * z_vals, axis=-1)
    return depth, w, flag


@functools.partial(
    jax.jit,
    static_argnames=("mcfg", "n_samples", "n_importance", "method",
                     "n_groups", "ray_chunk", "mlp_mode"))
def infer_batch(folded_coarse, folded_fine, rays, seg_id, valid, kernel,
                *, mcfg: ModelConfig, n_samples: int, n_importance: int,
                method: int, n_groups: int, ray_chunk: int = 64,
                mlp_mode: str = "folded"):
    """Full coarse->importance->fine inference over one padded batch.

    rays: (B, 13) test-ray rows (see eval/testrays.py layout);
    seg_id: (B,) group ids; valid: (B,) real-row mask.
    Returns (points_fine (B,3), flag_fine (B,), depth_fine, depth_coarse).
    """
    origins, dirs = rays[:, 0:3], rays[:, 3:6]
    near_c, far_c = rays[:, 6], rays[:, 7]
    near_p, far_p = rays[:, 9], rays[:, 10]
    epsilon = 1e-10

    z = S.stratified_z(near_p, far_p, n_samples)
    depth_c, w_c, _ = _pass(folded_coarse, origins, dirs, z, near_c, far_c,
                            seg_id, n_groups, valid, kernel, mcfg, epsilon,
                            method, ray_chunk, mlp_mode)

    mids = 0.5 * (z[..., 1:] + z[..., :-1])
    z_fine = S.sample_pdf_merged(jax.random.PRNGKey(0), z, mids,
                                 w_c[..., 1:-1], n_importance, det=True)

    depth_f, _, flag_f = _pass(folded_fine, origins, dirs, z_fine, near_c,
                               far_c, seg_id, n_groups, valid, kernel, mcfg,
                               epsilon, method, ray_chunk, mlp_mode)
    points_f = origins + depth_f[:, None] * dirs
    return points_f, flag_f, depth_f, depth_c


class GroupBatcher(NamedTuple):
    """Group-aware batch slicing (eval_kitti_render.py:1116-1136): extend the
    nominal batch until the current group's trailing -1 markers are included,
    then pad to a static shape."""

    rays: np.ndarray
    counts: np.ndarray  # other_interest (first row = groupsize-1)

    def batches(self, batch_size: int, pad_to: int, pad_to_tail: int):
        n = self.rays.shape[0]
        markers = self.rays[:, 12]
        i = 0
        while i < n:
            if i == n - 1:
                break
            if i + batch_size < n - 0.5 * batch_size:
                e = i + batch_size
                while e < n and markers[e] < -0.5:
                    e += 1
                yield self._pad(self.rays[i:e], pad_to)
            else:
                e = n
                yield self._pad(self.rays[i:e], pad_to_tail)
            i = e

    @staticmethod
    def _pad(rows: np.ndarray, pad_to: int):
        b = rows.shape[0]
        assert b <= pad_to, f"batch {b} exceeds pad size {pad_to}"
        markers = rows[:, 12]
        seg = np.cumsum(markers > -0.5) - 1   # group starts have marker >= 0
        seg = np.maximum(seg, 0)
        n_real_groups = int(seg[-1]) + 1 if b else 0
        pad = pad_to - b
        rays_p = np.zeros((pad_to, rows.shape[1]), np.float32)
        rays_p[:b] = rows
        rays_p[b:, 7] = 1.0   # benign child interval for padding rows
        rays_p[b:, 10] = 2.0  # parent far > near
        seg_p = np.concatenate([seg, n_real_groups + np.arange(pad)])
        valid = np.zeros(pad_to, bool)
        valid[:b] = True
        return rays_p, seg_p.astype(np.int32), valid, b


def run_inference(eval_cfg: EvalConfig, folded_coarse, folded_fine,
                  rays: np.ndarray, counts: np.ndarray, *, verbose=False,
                  use_pallas: bool | None = None):
    """Drive all batches of one frame; returns kept fine points (M, 3)."""
    mcfg = eval_cfg.model
    if use_pallas is None:
        # the fused PE+MLP kernel is the default whenever the affine
        # collapse cannot apply (negative_slope != 1): it keeps the weights
        # and a ray tile's activations VMEM-resident across the 9 matmuls
        use_pallas = eval_cfg.use_pallas or not collapse_active(mcfg)
    if collapse_active(mcfg):
        # affine collapse beats any full-MLP evaluation (one fused
        # elementwise pass per sample) — it wins over the pallas kernel too.
        # With ModelConfig.fused_embed on, the matvec itself runs as the
        # Pallas recurrence kernel (5x fewer transcendentals).
        from pcnerf_tpu.models import fused_embed_active
        mlp_mode = ("collapsed_fused" if fused_embed_active(mcfg)
                    else "collapsed")
        wc, bc = collapse_folded_params(folded_coarse, mcfg)
        wf, bf = collapse_folded_params(folded_fine, mcfg)
        folded_coarse = {"w_eff": wc, "b_eff": bc}
        folded_fine = {"w_eff": wf, "b_eff": bf}
    elif use_pallas:
        from pcnerf_tpu.ops.pallas_kernels import pad_folded_params
        mlp_mode = "pallas"
        folded_coarse = pad_folded_params(folded_coarse, mcfg)
        folded_fine = pad_folded_params(folded_fine, mcfg)
    else:
        mlp_mode = "folded"
    kernel = jnp.asarray(scipy_gaussian_kernel1d(eval_cfg.smooth_sigma))
    bs = eval_cfg.batch_size
    # two static shapes: regular batches pad to bs + group-overflow slack;
    # the reference's tail batch can reach 1.5x the nominal size
    # (eval_kitti_render.py:1120 takes all remaining rows when fewer than 1.5
    # batches remain) and gets its own padded size.  Rounded to the ray-chunk
    # multiple so lax.map / the pallas grid tile evenly.
    pad_to = -(-int(bs + 1024) // 64) * 64
    pad_to_tail = -(-int(1.5 * bs + 1024) // 64) * 64
    batcher = GroupBatcher(rays, counts)
    fc = jax.tree.map(jnp.asarray, folded_coarse)
    ff = jax.tree.map(jnp.asarray, folded_fine)
    # Dispatch every batch before fetching any result: jit dispatch is
    # async, so the host-side padding + H2D of batch i+1 overlaps batch i's
    # compute, and on the tunneled backend the per-batch D2H latency is paid
    # once at the end instead of serializing every iteration.  Outputs are
    # (pad_to, 3) points + a bool flag per batch — trivially small to hold.
    pending = []
    for rays_p, seg, valid, n_real in batcher.batches(bs, pad_to, pad_to_tail):
        pts, flag, _, _ = infer_batch(
            fc, ff,
            jnp.asarray(rays_p), jnp.asarray(seg), jnp.asarray(valid), kernel,
            mcfg=mcfg, n_samples=eval_cfg.n_samples,
            n_importance=eval_cfg.n_importance,
            method=eval_cfg.depth_inference_method, n_groups=rays_p.shape[0],
            mlp_mode=mlp_mode)
        pending.append((pts, flag, n_real))
    kept = []
    for pts, flag, n_real in pending:
        pts = np.asarray(pts)[:n_real]
        flag = np.asarray(flag)[:n_real]
        kept.append(pts[flag])
        if verbose:
            print(f"[infer] batch {n_real} rows -> {int(flag.sum())} kept",
                  flush=True)
    return np.concatenate(kept, axis=0) if kept else np.zeros((0, 3), np.float32)
