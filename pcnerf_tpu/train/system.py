"""Training system: jitted train/val steps, optimizer, LR schedule.

Reference: ``train_kitti.py:20-258`` (``NOFSystem``).  The PyTorch-Lightning
module becomes a pure ``train_step(state, batch, key, lr) -> (state, metrics)``
compiled once by XLA; coarse+fine render, three-level loss, backward, and the
Adam update all live in a single fused device program (no host sync per step).

Optimizer parity: torch ``Adam(lr, eps=1e-8, weight_decay)`` adds
``wd * param`` to the gradient *before* the moment updates
(``nof_utils.py:162-173``), which is ``optax.add_decayed_weights`` ->
``scale_by_adam`` here.  The LR schedule is the reference's hardcoded
``MultiStepLR(milestones=[5, 120, 256])`` stepped per epoch
(train_kitti.py:113).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from pcnerf_tpu.config import TrainConfig
from pcnerf_tpu.losses import abs_error, acc_thres, nof_loss
from pcnerf_tpu.models import init_nof
from pcnerf_tpu.render import render_rays_train, render_rays_val


class TrainState(NamedTuple):
    params: Dict[str, Any]      # {"coarse": ..., "fine": ...}
    bn: Dict[str, Any]          # running BatchNorm stats per model
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(cfg: TrainConfig):
    o = cfg.optim
    if o.optimizer == "adam":
        return optax.chain(
            optax.add_decayed_weights(o.weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=o.adam_eps),
        )
    if o.optimizer == "sgd":
        return optax.chain(
            optax.add_decayed_weights(o.weight_decay),
            optax.trace(decay=o.momentum),
        )
    raise ValueError(f"optimizer not recognized: {o.optimizer}")


def lr_at_epoch(cfg: TrainConfig, epoch: int) -> float:
    """MultiStepLR: lr * gamma^(#milestones passed)."""
    k = sum(1 for m in cfg.optim.decay_milestones if epoch >= m)
    return cfg.optim.lr * (cfg.optim.decay_gamma ** k)


def init_train_state(key, cfg: TrainConfig) -> TrainState:
    kc, kf = jax.random.split(key)
    pc, bc = init_nof(kc, cfg.model)
    pf, bf = init_nof(kf, cfg.model)
    params = {"coarse": pc, "fine": pf}
    tx = make_optimizer(cfg)
    return TrainState(params=params, bn={"coarse": bc, "fine": bf},
                      opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def _scene_range_loss(pred, pred_fine, gt, child_ids, cfg: TrainConfig,
                      axis_name=None):
    """Scene-level depth losses (train_kitti.py:127-146).

    Non-divide quirk preserved: the fine branch is weighted by ``lambda_loss``
    (not ``lambda_loss_fine``) exactly as in train_kitti.py:146.  The divide
    path groups over the *global* batch under dp (psum'd segment sums, with
    the grad-scale compensation so pmean(grads) stays exact — see
    ops/compositing.py).
    """
    from pcnerf_tpu.ops.compositing import (grad_psum_compensate,
                                            segment_sums_counts)
    loss_fn = nof_loss[cfg.loss.loss_type]
    L = cfg.loss
    if not L.use_child_nerf_divide:
        lr_ = 0.1 * L.lambda_loss * loss_fn(10.0 * pred, 10.0 * gt)
        lrf = 0.1 * L.lambda_loss * loss_fn(10.0 * pred_fine, 10.0 * gt)
        return lr_, lrf

    n_seg = L.sub_nerf_count + 1

    def grouped(p):
        d = jnp.abs(10.0 * p - 10.0 * gt)
        e = jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)   # smoothl1 elements
        sums, counts = segment_sums_counts(e, child_ids, n_seg, axis_name)
        means = jnp.where(counts >= 1, sums / jnp.maximum(counts, 1.0), 0.0)
        return grad_psum_compensate(jnp.sum(means[1:]), axis_name)

    lr_ = 0.1 * L.lambda_loss * grouped(pred)
    lrf = 0.1 * L.lambda_loss_fine * grouped(pred_fine)
    return lr_, lrf


def make_train_step(cfg: TrainConfig, *, axis_name=None, tp_axis=None,
                    donate: bool = True, jit: bool = True):
    """Build the jitted train step.  With ``axis_name`` set, gradients and BN
    statistics are psum/pmean-reduced over that mesh axis; ``tp_axis``
    additionally runs the MLP tensor-parallel (for use under ``shard_map``;
    see pcnerf_tpu/parallel).  ``jit=False`` returns the raw function (for
    wrapping in a mesh-annotated jit, parallel/gspmd.py)."""
    tx = make_optimizer(cfg)

    def loss_and_metrics(params, bn, rays, gt, key):
        out = render_rays_train(params["coarse"], bn["coarse"],
                                params["fine"], bn["fine"], rays, key,
                                cfg.model, cfg.render, cfg.loss,
                                axis_name=axis_name, tp_axis=tp_axis)
        child_ids = rays[:, 9]
        lr_, lrf = _scene_range_loss(out["depth"], out["depth_fine"], gt,
                                     child_ids, cfg, axis_name)
        L = cfg.loss
        total = (lr_ + lrf
                 + L.lambda_child_free * (out["child_free_loss"]
                                          + out["child_free_loss_fine"])
                 + L.lambda_child_depth * (out["child_depth_loss"]
                                           + out["child_depth_loss_fine"]))
        if L.lambda_opacity != 0.0:
            total = total + L.lambda_opacity * (out["opacity"]
                                                + out["opacity_fine"])
        new_bn = {"coarse": out["bn_coarse"], "fine": out["bn_fine"]}
        metrics = {
            "loss": total,
            "loss_range": lr_, "loss_range_fine": lrf,
            "child_free_loss": out["child_free_loss"],
            "child_free_loss_fine": out["child_free_loss_fine"],
            "child_depth_loss": out["child_depth_loss"],
            "child_depth_loss_fine": out["child_depth_loss_fine"],
            "avg_error": abs_error(out["depth"], gt),
            "acc_thres": acc_thres(out["depth"], gt),
        }
        if L.lambda_opacity != 0.0:
            metrics["opacity_reg"] = out["opacity"] + out["opacity_fine"]
        return total, (new_bn, metrics)

    def train_step(state: TrainState, rays, gt, key, lr) -> Tuple[TrainState, Dict]:
        grad_fn = jax.value_and_grad(loss_and_metrics, has_aux=True)
        (_, (new_bn, metrics)), grads = grad_fn(state.params, state.bn, rays,
                                                gt, key)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p - lr * u, state.params, updates)
        return TrainState(new_params, new_bn, opt_state, state.step + 1), metrics

    if axis_name is None:
        if not jit:
            return train_step
        return jax.jit(train_step, donate_argnums=(0,) if donate else ())
    return train_step


def make_train_scan(cfg: TrainConfig, *, donate: bool = True,
                    jit: bool = True):
    """K training steps fused into ONE device program via ``lax.scan``.

    ``(state, rays (K,B,15), gt (K,B), base_key, lr, step0) ->
    (state, metrics-of-(K,)-arrays)``.

    Why: at the reference's batch size (256 rays, train_kitti.py bash) a
    single step is ~1 ms of MXU work but pays a full host dispatch round
    trip — tens of ms through a tunneled backend.  Scanning ``K`` steps per
    dispatch amortizes that to 1/K while keeping the math identical: the
    inner RNG key for global step ``step0+i`` is ``fold_in(base_key,
    step0+i)``, exactly the per-step path's key sequence, and the carried
    (params, BN, opt state) update chain is the same program as
    :func:`make_train_step`'s body.
    """
    step_fn = make_train_step(cfg, jit=False)

    def scan_fn(state, rays_k, gt_k, base_key, lr, step0):
        idx = step0 + jnp.arange(rays_k.shape[0], dtype=jnp.int32)

        def body(st, xs):
            i, rays, gt = xs
            return step_fn(st, rays, gt, jax.random.fold_in(base_key, i), lr)

        return jax.lax.scan(body, state, (idx, rays_k, gt_k))

    if not jit:
        return scan_fn
    return jax.jit(scan_fn, donate_argnums=(0,) if donate else ())


def make_val_step(cfg: TrainConfig, *, jit: bool = True):
    """Validation step: fine depth, loss/abs/acc (train_kitti.py:208-258).
    CD/F-score are computed separately by :mod:`pcnerf_tpu.eval.metrics`
    on-device."""

    loss_fn = nof_loss[cfg.loss.loss_type]

    def val_step(state: TrainState, rays, gt, key):
        out = render_rays_val(state.params["coarse"], state.bn["coarse"],
                              state.params["fine"], state.bn["fine"],
                              rays, key, cfg.model, cfg.render)
        pred = out["depth_fine"]
        metrics = {
            "loss": loss_fn(pred, gt),
            "avg_error": abs_error(pred, gt),
            "acc_thres": acc_thres(pred, gt),
        }
        rb_o, rb_d = rays[:, 0:3], rays[:, 3:6]
        pred_pts = rb_o + rb_d * pred[:, None]
        gt_pts = rb_o + rb_d * gt[:, None]
        return metrics, pred_pts, gt_pts

    return jax.jit(val_step) if jit else val_step
