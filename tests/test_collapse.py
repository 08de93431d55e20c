"""Exactness of the affine-collapse fast path vs. the generic MLP.

The collapse (models/nof.py) is a mathematical identity when the activations
are the identity (the reference's ``nn.LeakyReLU(True)`` slope-1 quirk,
models.py:72,92): Linear+BatchNorm chains are affine in the embedding, so the
whole network folds to one 63->1 linear, with batch statistics derived exactly
from the embedding's batch moments.  These tests enforce that identity on the
forward pass, the gradients, and the BatchNorm running-stat updates, in both
train and eval modes — i.e. the fast path is not an approximation.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pcnerf_tpu.config import ModelConfig
from pcnerf_tpu.models import (
    collapse_active,
    collapse_eval_params,
    embed_positions,
    init_nof,
    nof_apply,
    nof_apply_collapsed,
    nof_apply_train,
    nof_apply_train_collapsed,
)

CFG = ModelConfig(compute_dtype="float32")


def _setup(batch=512, seed=0, warm_bn=False):
    params, bn = init_nof(jax.random.PRNGKey(seed), CFG)
    if warm_bn:
        rng = np.random.default_rng(seed + 1)
        bn = {
            "mean": [jnp.asarray(rng.normal(0, 0.3, m.shape).astype(np.float32))
                     for m in bn["mean"]],
            "var": [jnp.asarray(rng.uniform(0.5, 2.0, v.shape).astype(np.float32))
                    for v in bn["var"]],
        }
    x = np.random.default_rng(seed).uniform(-40, 40, (batch, 3)).astype(np.float32)
    emb = embed_positions(jnp.asarray(x), CFG.n_freq)
    return params, bn, emb


def test_collapse_auto_gating():
    assert collapse_active(ModelConfig())                      # slope 1.0
    assert not collapse_active(ModelConfig(negative_slope=0.01))
    assert collapse_active(ModelConfig(negative_slope=0.01, collapse_affine="on"))
    assert not collapse_active(ModelConfig(collapse_affine="off"))


def test_train_forward_and_bn_match_generic():
    params, bn, emb = _setup()
    occ_g, bn_g = nof_apply_train(params, bn, emb, CFG)
    occ_c, bn_c = nof_apply_train_collapsed(params, bn, emb, CFG)
    np.testing.assert_allclose(np.asarray(occ_c), np.asarray(occ_g),
                               atol=2e-5, rtol=1e-4)
    for i in range(8):
        np.testing.assert_allclose(np.asarray(bn_c["mean"][i]),
                                   np.asarray(bn_g["mean"][i]),
                                   atol=2e-4, rtol=1e-3,
                                   err_msg=f"bn mean layer {i}")
        np.testing.assert_allclose(np.asarray(bn_c["var"][i]),
                                   np.asarray(bn_g["var"][i]),
                                   atol=2e-4, rtol=1e-3,
                                   err_msg=f"bn var layer {i}")


def test_train_gradients_match_generic():
    params, bn, emb = _setup()
    coefs = jnp.asarray(
        np.random.default_rng(7).normal(size=(emb.shape[0],)).astype(np.float32))

    def loss(p, fn):
        occ, _ = fn(p, bn, emb, CFG)
        return jnp.sum(occ * coefs) + jnp.sum(occ * occ)

    lg, gg = jax.value_and_grad(lambda p: loss(p, nof_apply_train))(params)
    lc, gc = jax.value_and_grad(
        lambda p: loss(p, nof_apply_train_collapsed))(params)
    np.testing.assert_allclose(float(lc), float(lg), rtol=1e-4)
    for i in (0, 3, 4, 7):
        for k in ("w", "b", "scale", "bias"):
            np.testing.assert_allclose(
                np.asarray(gc["layers"][i][k]), np.asarray(gg["layers"][i][k]),
                atol=3e-4, rtol=2e-3, err_msg=f"layer {i} {k} grad")
    np.testing.assert_allclose(np.asarray(gc["head"]["w"]),
                               np.asarray(gg["head"]["w"]),
                               atol=3e-4, rtol=2e-3)


def test_eval_forward_matches_generic():
    params, bn, emb = _setup(warm_bn=True)
    occ_g = np.asarray(nof_apply(params, bn, emb, CFG))
    w_eff, b_eff = collapse_eval_params(params, bn, CFG)
    occ_c = np.asarray(nof_apply_collapsed(w_eff, b_eff, emb, CFG))
    np.testing.assert_allclose(occ_c, occ_g, atol=1e-5)


def test_collapsed_render_matches_generic_render():
    """End-to-end: render_rays_train with collapse on vs off."""
    from pcnerf_tpu.config import LossConfig, RenderConfig
    from pcnerf_tpu.render import render_rays_train

    rng = np.random.default_rng(3)
    n = 64
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    r = rng.uniform(5, 30, n).astype(np.float32)
    rays = np.zeros((n, 15), np.float32)
    rays[:, 3:6] = dirs
    rays[:, 7] = 40.0
    rays[:, 9] = rng.integers(1, 9, n)
    rays[:, 10] = r - 1.0
    rays[:, 11] = r + 1.0
    rays[:, 14] = r
    rays = jnp.asarray(rays)

    rcfg = RenderConfig(n_samples=32, n_importance=64, perturb=0.0)
    lcfg = LossConfig(sub_nerf_count=8)
    key = jax.random.PRNGKey(0)

    outs = {}
    for mode in ("off", "auto"):
        mcfg = ModelConfig(feature_size=64, n_freq=4, collapse_affine=mode)
        params_c, bn_c = init_nof(jax.random.PRNGKey(1), mcfg)
        params_f, bn_f = init_nof(jax.random.PRNGKey(2), mcfg)
        outs[mode] = render_rays_train(params_c, bn_c, params_f, bn_f,
                                       rays, key, mcfg, rcfg, lcfg)
    for k in ("depth", "depth_fine", "child_free_loss", "child_depth_loss_fine"):
        np.testing.assert_allclose(np.asarray(outs["auto"][k]),
                                   np.asarray(outs["off"][k]),
                                   atol=1e-4, rtol=1e-3, err_msg=k)
