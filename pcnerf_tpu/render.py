"""Top-level ray renderers: the jit-compiled coarse->fine pipelines.

Reference: ``nof/render.py:416-536`` (``render_rays_train`` /
``render_rays_val``).  Each renderer is a pure function over (params,
bn_state, rays, rng) — the chunked Python loop of the reference
(render.py:46-49) is replaced by whole-batch evaluation that XLA tiles onto
the MXU; the per-ray/per-child Python loops by the vectorized mask and
segment ops in :mod:`pcnerf_tpu.ops.compositing`.

Train ray buffer layout (15 columns, ipb2dmapping.py:819-824)::

    0:3   ray origin            8     ray class (3)
    3:6   ray direction         9     child id (1-based)
    6     parent near           10,11 child near/far
    7     parent far            12,13 point near/far (col 13 actually holds
    14    measured range               the child far — reference quirk)
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from pcnerf_tpu.config import LossConfig, ModelConfig, RenderConfig
from pcnerf_tpu import models as M
from pcnerf_tpu.models import embed_positions, nof_apply, nof_apply_train
from pcnerf_tpu.ops import compositing as C
from pcnerf_tpu.ops import sampling as S


class RayBatch(NamedTuple):
    origins: jnp.ndarray      # (R, 3)
    dirs: jnp.ndarray         # (R, 3)
    near: jnp.ndarray         # (R,) parent near
    far: jnp.ndarray          # (R,) parent far
    child_id: jnp.ndarray     # (R,)
    near_child: jnp.ndarray   # (R,)
    far_child: jnp.ndarray    # (R,)
    ranges: jnp.ndarray       # (R,)


def decode_rays(rays: jnp.ndarray) -> RayBatch:
    return RayBatch(
        origins=rays[:, 0:3], dirs=rays[:, 3:6],
        near=rays[:, 6], far=rays[:, 7],
        child_id=rays[:, 9], near_child=rays[:, 10], far_child=rays[:, 11],
        ranges=rays[:, 14],
    )


def _eval_occupancy(params, bn_state, points, mcfg: ModelConfig, *,
                    train: bool, axis_name=None, tp_axis=None):
    """Embed + MLP over an (R, S, 3) sample grid, flattened to one batch.

    With identity activations (the reference's slope-1 quirk) the MLP is
    routed through the affine-collapse fast path — identical math, one
    matvec instead of nine activation matmuls (see models/nof.py).
    """
    r, s, _ = points.shape
    flat = points.reshape(r * s, 3)
    if train and M.fused_embed_active(mcfg):
        # Pallas fused collapse: moments + matvec from raw coordinates,
        # no (r*s, 63) embedding materialization (ops/pallas_train.py)
        occ, new_bn = M.nof_apply_train_collapsed_fused(
            params, bn_state, flat, mcfg, axis_name=axis_name,
            tp_axis=tp_axis)
        return occ.reshape(r, s), new_bn
    if not train and M.fused_embed_active(mcfg):
        w_eff, b_eff = M.collapse_eval_params(params, bn_state, mcfg)
        occ = M.nof_apply_collapsed_fused(w_eff, b_eff, flat, mcfg)
        return occ.reshape(r, s), bn_state
    emb = embed_positions(flat, mcfg.n_freq, mcfg.logscale)
    if train:
        apply_train = (M.nof_apply_train_collapsed if M.collapse_active(mcfg)
                       else nof_apply_train)

        def run(p, b, e):
            return apply_train(p, b, e, mcfg, axis_name=axis_name,
                               tp_axis=tp_axis)
        if mcfg.remat_mlp and not M.collapse_active(mcfg):
            # recompute the 9-layer activations in the backward instead of
            # storing 9 x (r*s, 256) in HBM (see ModelConfig.remat_mlp)
            run = jax.checkpoint(run)
        occ, new_bn = run(params, bn_state, emb)
        return occ.reshape(r, s), new_bn
    if M.collapse_active(mcfg):
        w_eff, b_eff = M.collapse_eval_params(params, bn_state, mcfg)
        return M.nof_apply_collapsed(w_eff, b_eff, emb, mcfg).reshape(r, s), bn_state
    return nof_apply(params, bn_state, emb, mcfg).reshape(r, s), bn_state


def _composite_train(params, bn_state, rb: RayBatch, z_vals, key,
                     mcfg: ModelConfig, rcfg: RenderConfig, lcfg: LossConfig,
                     *, train_bn: bool, axis_name=None, tp_axis=None):
    """One model pass: occupancy -> weights -> depth + child losses.

    Mirrors ``inference_train`` (render.py:38-163).
    """
    points = rb.origins[:, None, :] + rb.dirs[:, None, :] * z_vals[..., None]
    occ, new_bn = _eval_occupancy(params, bn_state, points, mcfg,
                                  train=train_bn, axis_name=axis_name,
                                  tp_axis=tp_axis)
    w = C.occupancy_to_weights(occ)
    w = C.add_weight_noise(key, w, rcfg.noise_std)
    w = C.normalize_weights(w, rcfg.epsilon)
    depth = C.composite_depth(w, z_vals)

    if lcfg.use_child_nerf_loss:
        n_total = z_vals.shape[0]
        if axis_name is not None:
            n_total = n_total * jax.lax.psum(1, axis_name)
        free_mask, _ = C.child_mask(
            z_vals, rb.near_child, rb.far_child,
            gamma0=rcfg.child_mask_gamma0_free, gamma_step=rcfg.child_mask_gamma_step)
        depth_mask, _ = C.child_mask(
            z_vals, rb.near_child, rb.far_child,
            gamma0=rcfg.child_mask_gamma0, gamma_step=rcfg.child_mask_gamma_step)
        free = C.child_free_loss(w, free_mask, rb.child_id, lcfg.sub_nerf_count,
                                 divide=lcfg.use_child_nerf_divide,
                                 n_total=n_total, axis_name=axis_name)
        depth_l = C.child_depth_loss(w, depth_mask, z_vals, rb.ranges,
                                     rb.child_id, lcfg.sub_nerf_count,
                                     divide=lcfg.use_child_nerf_divide,
                                     epsilon=rcfg.epsilon, n_total=n_total,
                                     axis_name=axis_name)
    else:
        free = jnp.zeros((), jnp.float32)
        depth_l = jnp.zeros((), jnp.float32)
    # opacity regularizer (render.py:224): only traced into the graph when
    # its weight is nonzero, so default configs compile the exact round-3 HLO
    opac = (C.opacity_regularizer(occ) if lcfg.lambda_opacity != 0.0
            else jnp.zeros((), jnp.float32))
    return {"depth": depth, "weights": w, "free": free, "depth_loss": depth_l,
            "opacity": opac, "bn": new_bn}


def render_rays_train(params_coarse, bn_coarse, params_fine, bn_fine,
                      rays, key, mcfg: ModelConfig, rcfg: RenderConfig,
                      lcfg: LossConfig, *, axis_name=None,
                      tp_axis=None) -> Dict[str, jnp.ndarray]:
    """Coarse -> importance -> fine training render (render.py:416-482)."""
    rb = decode_rays(rays)
    k_pert, k_noise_c, k_pdf, k_noise_f = jax.random.split(key, 4)

    if rcfg.use_segmented_sample:
        z_vals = S.segmented_z(rb.near, rb.far, rb.near_child, rb.far_child,
                               rcfg.n_samples, rcfg.child_ratio)
    else:
        z_vals = S.stratified_z(rb.near, rb.far, rcfg.n_samples)
    if rcfg.perturb > 0:
        z_vals = S.perturb_z(k_pert, z_vals, rcfg.perturb)

    coarse = _composite_train(params_coarse, bn_coarse, rb, z_vals, k_noise_c,
                              mcfg, rcfg, lcfg, train_bn=True,
                              axis_name=axis_name, tp_axis=tp_axis)

    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    z_fine = S.sample_pdf_merged_auto(
        k_pdf, z_vals, mids,
        jax.lax.stop_gradient(coarse["weights"][..., 1:-1]),
        rcfg.n_importance, det=(rcfg.perturb == 0.0), mode=rcfg.pdf_bracket)

    fine = _composite_train(params_fine, bn_fine, rb, z_fine, k_noise_f,
                            mcfg, rcfg, lcfg, train_bn=True,
                            axis_name=axis_name, tp_axis=tp_axis)

    return {
        "depth": coarse["depth"], "depth_fine": fine["depth"],
        "child_free_loss": coarse["free"], "child_free_loss_fine": fine["free"],
        "child_depth_loss": coarse["depth_loss"],
        "child_depth_loss_fine": fine["depth_loss"],
        "opacity": coarse["opacity"], "opacity_fine": fine["opacity"],
        "bn_coarse": coarse["bn"], "bn_fine": fine["bn"],
    }


def render_rays_val(params_coarse, bn_coarse, params_fine, bn_fine,
                    rays, key, mcfg: ModelConfig, rcfg: RenderConfig,
                    ) -> Dict[str, jnp.ndarray]:
    """Validation render: uniform z, eval-mode BN, no child losses
    (render.py:485-536)."""
    rb = decode_rays(rays)
    k_pert, k_noise_c, k_pdf, k_noise_f = jax.random.split(key, 4)

    z_vals = S.stratified_z(rb.near, rb.far, rcfg.n_samples)
    if rcfg.perturb > 0:
        z_vals = S.perturb_z(k_pert, z_vals, rcfg.perturb)

    def one_pass(params, bn, z, k):
        points = rb.origins[:, None, :] + rb.dirs[:, None, :] * z[..., None]
        occ, _ = _eval_occupancy(params, bn, points, mcfg, train=False)
        w = C.occupancy_to_weights(occ)
        w = C.add_weight_noise(k, w, rcfg.noise_std)
        w = C.normalize_weights(w, rcfg.epsilon)
        return C.composite_depth(w, z), w

    depth, w = one_pass(params_coarse, bn_coarse, z_vals, k_noise_c)
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    z_fine = S.sample_pdf_merged_auto(k_pdf, z_vals, mids, w[..., 1:-1],
                                      rcfg.n_importance,
                                      det=(rcfg.perturb == 0.0),
                                      mode=rcfg.pdf_bracket)
    depth_fine, _ = one_pass(params_fine, bn_fine, z_fine, k_noise_f)
    return {"depth": depth, "depth_fine": depth_fine}


def render_rays_legacy(params_coarse, bn_coarse, params_fine, bn_fine,
                       rays, key, mcfg: ModelConfig, rcfg: RenderConfig,
                       *, use_disp: bool = False, isval: bool = False,
                       ) -> Dict[str, jnp.ndarray]:
    """Legacy original-NeRF path (``render_rays`` + ``inference``,
    render.py:166-226, 538-611): optional disparity-space sampling, opacity
    regularizer, weight normalization skipped when ``isval``, and the
    argmax-sample ``depth2`` output."""
    rb = decode_rays(rays)
    k_pert, k_noise_c, k_pdf, k_noise_f = jax.random.split(key, 4)

    steps = jnp.linspace(0.0, 1.0, rcfg.n_samples, dtype=jnp.float32)
    if use_disp:
        z_vals = 1.0 / (1.0 / rb.near[:, None] * (1.0 - steps)
                        + 1.0 / rb.far[:, None] * steps)
    else:
        z_vals = rb.near[:, None] * (1.0 - steps) + rb.far[:, None] * steps
    if rcfg.perturb > 0:
        z_vals = S.perturb_z(k_pert, z_vals, rcfg.perturb)

    def one_pass(params, bn, z, k):
        points = rb.origins[:, None, :] + rb.dirs[:, None, :] * z[..., None]
        occ, _ = _eval_occupancy(params, bn, points, mcfg, train=False)
        w = C.occupancy_to_weights(occ)
        w = C.add_weight_noise(k, w, rcfg.noise_std)
        if not isval:
            w = C.normalize_weights(w, rcfg.epsilon)
        return C.composite_depth(w, z), w, C.opacity_regularizer(occ)

    depth, w, opacity = one_pass(params_coarse, bn_coarse, z_vals, k_noise_c)
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    z_fine = S.sample_pdf_merged_auto(k_pdf, z_vals, mids, w[..., 1:-1],
                                      rcfg.n_importance,
                                      det=(rcfg.perturb == 0.0),
                                      mode=rcfg.pdf_bracket)
    depth_fine, w_fine, opacity_fine = one_pass(params_fine, bn_fine, z_fine,
                                                k_noise_f)
    # depth2: the z of each ray's max-weight sample (render.py:598-600)
    depth2 = jnp.take_along_axis(z_fine, jnp.argmax(w_fine, -1)[:, None],
                                 -1)[:, 0]
    return {"depth": depth, "depth_fine": depth_fine, "weights": w_fine,
            "opacity": opacity, "opacity_fine": opacity_fine,
            "z_vals": z_fine, "depth2": depth2}
