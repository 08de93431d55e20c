"""Tests for the Pallas fused-embedding collapse train path
(``ops/pallas_train.py``) — run in interpret mode on the CPU test backend,
the same code path the kernels take under ``fused_embed="on"`` off-TPU.

Tolerances: the power-of-two double-angle recurrence (re-seeded every
SEED_EVERY bands) deviates from direct sin/cos at the 1e-4 level on the
highest bands — a documented tolerance-level deviation of the fused path
(ModelConfig.fused_embed); the bounds asserted here are what PERF.md cites.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcnerf_tpu.config import ModelConfig
from pcnerf_tpu import models as M
from pcnerf_tpu.models.embedding import embed_positions, freq_bands
from pcnerf_tpu.ops import pallas_train as PT


def _coords(n, seed=0, scale=120.0):
    """Realistic KITTI-scale raw sample coordinates (+-120 m)."""
    rng = np.random.default_rng(seed)
    return (rng.uniform(-scale, scale, size=(n, 3))).astype(np.float32)


def _embed_f64(x):
    """Ground-truth embedding in float64 (numpy)."""
    x = np.asarray(x, np.float64)
    bands = freq_bands(10).astype(np.float64)
    scaled = x[:, None, :] * bands[:, None]            # (N, F, 3)
    sc = np.concatenate([np.sin(scaled)[:, :, None, :],
                         np.cos(scaled)[:, :, None, :]], axis=2)
    return np.concatenate([x, sc.reshape(x.shape[0], -1)], axis=1)


def test_recurrence_accuracy_vs_f64():
    """The recurrence embedding is as accurate as direct f32 evaluation:
    max abs error vs f64 ground truth stays below 5e-4 at +-120 m coords
    (direct XLA f32 sin of the 512x band is itself ~1e-4-class here)."""
    x = _coords(4096)
    pieces = PT._emb_pieces(jnp.asarray(x.T), 10)
    e = np.asarray(jnp.concatenate(pieces, axis=0)).T     # (N, 63)
    ref = _embed_f64(x)
    err = np.abs(e - ref).max()
    assert err < 5e-4, err
    # direct f32 evaluation error of the same channels, for scale
    direct = np.asarray(embed_positions(jnp.asarray(x), 10))
    derr = np.abs(direct - ref).max()
    # recurrence must stay within ~25x of the direct-evaluation error
    assert err < max(25 * derr, 2e-4), (err, derr)


def test_embed_moments_matches_xla():
    n = 5000                               # not a TILE multiple: pad path
    x = _coords(n, seed=1)
    x_t, n_valid = PT.pad_points_t(jnp.asarray(x))
    assert n_valid == n and x_t.shape[1] % PT.TILE == 0
    mu, sigma, cnt = PT.embed_moments(x_t, 10, n_valid)
    emb = np.asarray(embed_positions(jnp.asarray(x), 10), np.float64)
    mu_ref = emb.mean(axis=0)
    xc = emb - mu_ref
    sigma_ref = (xc.T @ xc) / n
    assert float(cnt) == n
    np.testing.assert_allclose(np.asarray(mu), mu_ref, atol=2e-4)
    np.testing.assert_allclose(np.asarray(sigma), sigma_ref,
                               atol=5e-3, rtol=2e-3)


def test_embed_affine_forward_and_grad():
    n = 4096
    x = _coords(n, seed=2)
    rng = np.random.default_rng(3)
    w = rng.normal(size=(63, 1)).astype(np.float32) * 0.1
    b = np.float32(0.7)
    x_t, n_valid = PT.pad_points_t(jnp.asarray(x))
    rows = PT._rows(10)
    w_aug = jnp.zeros((rows, 1), jnp.float32)
    w_aug = w_aug.at[:63, 0].set(w[:, 0]).at[63, 0].set(b)

    logits = PT.embed_affine(x_t, w_aug, 10)[0, :n_valid]
    emb = _embed_f64(x)
    ref = emb @ np.asarray(w, np.float64)[:, 0] + b
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(logits), ref,
                               atol=5e-4 * max(scale, 1.0))

    # VJP: d/dw sum(r * logits) == E^T r (+ sum(r) for the bias row)
    r = jnp.asarray(rng.normal(size=(n_valid,)).astype(np.float32))

    def f(wa):
        return jnp.sum(PT.embed_affine(x_t, wa, 10)[0, :n_valid] * r)

    dw = jax.grad(f)(w_aug)
    dw_ref = emb.T @ np.asarray(r, np.float64)
    db_ref = float(np.sum(np.asarray(r, np.float64)))
    gscale = max(np.abs(dw_ref).max(), abs(db_ref), 1.0)
    np.testing.assert_allclose(np.asarray(dw[:63, 0]), dw_ref,
                               atol=1e-3 * gscale, rtol=2e-3)
    np.testing.assert_allclose(float(dw[63, 0]), db_ref,
                               atol=1e-3 * gscale)


def test_fused_collapsed_apply_parity():
    """Fused vs XLA collapsed train forward on the real model: occupancy,
    BN statistics and parameter gradients agree to fused-path tolerance."""
    cfg = ModelConfig(fused_embed="on")
    cfg_off = ModelConfig(fused_embed="off")
    params, bn = M.init_nof(jax.random.PRNGKey(0), cfg)
    n = 6000
    x = _coords(n, seed=4, scale=60.0)
    emb = embed_positions(jnp.asarray(x), 10)

    occ_f, bn_f = M.nof_apply_train_collapsed_fused(params, bn, jnp.asarray(x), cfg)
    occ_x, bn_x = M.nof_apply_train_collapsed(params, bn, emb, cfg_off)
    np.testing.assert_allclose(np.asarray(occ_f), np.asarray(occ_x),
                               atol=2e-3)
    for i in range(8):
        np.testing.assert_allclose(np.asarray(bn_f["mean"][i]),
                                   np.asarray(bn_x["mean"][i]),
                                   atol=2e-3, rtol=2e-3)
        np.testing.assert_allclose(np.asarray(bn_f["var"][i]),
                                   np.asarray(bn_x["var"][i]),
                                   atol=2e-3, rtol=2e-3)

    def loss_fused(p):
        occ, _ = M.nof_apply_train_collapsed_fused(p, bn, jnp.asarray(x), cfg)
        return jnp.mean((occ - 0.3) ** 2)

    def loss_xla(p):
        occ, _ = M.nof_apply_train_collapsed(p, bn, emb, cfg_off)
        return jnp.mean((occ - 0.3) ** 2)

    gf = jax.grad(loss_fused)(params)
    gx = jax.grad(loss_xla)(params)
    for i in range(8):
        for k in ("w", "b", "scale", "bias"):
            a, bb = np.asarray(gf["layers"][i][k]), np.asarray(gx["layers"][i][k])
            sc = max(np.abs(bb).max(), 1e-8)
            np.testing.assert_allclose(a, bb, atol=5e-3 * sc, rtol=5e-2,
                                       err_msg=f"layer {i} {k}")
    np.testing.assert_allclose(np.asarray(gf["head"]["w"]),
                               np.asarray(gx["head"]["w"]),
                               atol=5e-3 * max(np.abs(np.asarray(gx["head"]["w"])).max(), 1e-8),
                               rtol=5e-2)


def test_fused_render_step_dispatch():
    """The render-path dispatch picks the fused kernel under
    fused_embed='on' and produces a finite, XLA-close composited depth."""
    from pcnerf_tpu.render import _eval_occupancy
    rng = np.random.default_rng(7)
    pts = jnp.asarray(rng.uniform(-50, 50, size=(16, 96, 3)).astype(np.float32))
    cfg_on = ModelConfig(fused_embed="on")
    cfg_off = ModelConfig(fused_embed="off")
    params, bn = M.init_nof(jax.random.PRNGKey(1), cfg_on)
    occ_on, _ = _eval_occupancy(params, bn, pts, cfg_on, train=True)
    occ_off, _ = _eval_occupancy(params, bn, pts, cfg_off, train=True)
    assert occ_on.shape == (16, 96)
    np.testing.assert_allclose(np.asarray(occ_on), np.asarray(occ_off),
                               atol=2e-3)


def test_embed_moments_dp_psum():
    """Sharded moments under shard_map(dp=2) equal the single-device global
    moments: the pmean'd shift + psum'd augmented Gram reproduce sync-BN
    statistics exactly (the dp contract of the fused path)."""
    from jax.sharding import Mesh, PartitionSpec as P

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    n = 2 * PT.TILE
    x = jnp.asarray(_coords(n, seed=9, scale=80.0))

    def local(xs):
        x_t, n_valid = PT.pad_points_t(xs)
        return PT.embed_moments(x_t, 10, n_valid, axis_name="dp")

    # check_vma=False matches the production shard_map step
    # (parallel/sharded.py:87); pallas outputs carry no vma annotation
    def shard_map(f, mesh, in_specs, out_specs):
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)

    mesh = Mesh(np.array(jax.devices()[:2]), ("dp",))
    mu_s, sig_s, n_s = jax.jit(shard_map(
        local, mesh=mesh, in_specs=P("dp"), out_specs=P()))(x)

    x_t, n_valid = PT.pad_points_t(x)
    mu_g, sig_g, n_g = PT.embed_moments(x_t, 10, n_valid)
    assert float(n_s) == float(n_g) == n
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_g), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sig_s), np.asarray(sig_g),
                               atol=1e-4, rtol=1e-4)
