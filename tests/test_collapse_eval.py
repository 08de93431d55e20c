"""Collapsed eval-mode occupancy == folded 9-matmul MLP, through the engine.

Covers: ``collapse_folded_params`` (Linear-chain folding of BN-folded
params), ``embedded_dot`` (band-wise embedding contraction that never
materializes the (..., 63) embedding), and the ``infer_batch`` mlp_mode
routing.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pcnerf_tpu.config import ModelConfig
from pcnerf_tpu.eval.engine import infer_batch, scipy_gaussian_kernel1d
from pcnerf_tpu.models import (
    collapse_folded_params,
    embed_positions,
    fold_batchnorm,
    init_nof,
    nof_apply_folded,
)
from pcnerf_tpu.models.embedding import embedded_dot

CFG = ModelConfig(compute_dtype="float32")


def _folded(seed):
    params, bn = init_nof(jax.random.PRNGKey(seed), CFG)
    rng = np.random.default_rng(seed)
    bn = {
        "mean": [jnp.asarray(rng.normal(0, 0.3, m.shape).astype(np.float32))
                 for m in bn["mean"]],
        "var": [jnp.asarray(rng.uniform(0.5, 2.0, v.shape).astype(np.float32))
                for v in bn["var"]],
    }
    return fold_batchnorm(params, bn, CFG)


def test_embedded_dot_matches_materialized():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-30, 30, (257, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(63, 1)).astype(np.float32))
    want = embed_positions(x, CFG.n_freq) @ w
    got = embedded_dot(x, w, CFG.n_freq)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want)[:, 0],
                               atol=1e-3, rtol=1e-5)


def test_collapse_folded_matches_folded_forward():
    folded = _folded(1)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-30, 30, (512, 3)).astype(np.float32))
    emb = embed_positions(x, CFG.n_freq)
    want = np.asarray(nof_apply_folded(folded, emb, CFG))
    w_eff, b_eff = collapse_folded_params(folded, CFG)
    logits = embedded_dot(x, w_eff, CFG.n_freq) + b_eff.reshape(())
    got = np.asarray(jax.nn.sigmoid(logits))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_infer_batch_collapsed_matches_folded_mode():
    rng = np.random.default_rng(3)
    n = 64
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rays = np.zeros((n, 13), np.float32)
    rays[:, 3:6] = dirs
    a = rng.uniform(5, 25, n).astype(np.float32)
    rays[:, 6] = a
    rays[:, 7] = a + rng.uniform(0.5, 2.0, n).astype(np.float32)
    rays[:, 9] = 0.0
    rays[:, 10] = 40.0
    seg = jnp.arange(n, dtype=jnp.int32)
    valid = jnp.ones(n, bool)
    kernel = jnp.asarray(scipy_gaussian_kernel1d(5.0))
    fc, ff = _folded(4), _folded(5)

    def run(mode, fc_m, ff_m):
        return infer_batch(fc_m, ff_m, jnp.asarray(rays), seg, valid, kernel,
                           mcfg=CFG, n_samples=128, n_importance=256,
                           method=2, n_groups=n, mlp_mode=mode)

    pts_f, flag_f, df, dc = run("folded", fc, ff)
    wc, bc = collapse_folded_params(fc, CFG)
    wf, bf = collapse_folded_params(ff, CFG)
    pts_c, flag_c, df_c, dc_c = run(
        "collapsed", {"w_eff": wc, "b_eff": bc}, {"w_eff": wf, "b_eff": bf})
    np.testing.assert_allclose(np.asarray(dc_c), np.asarray(dc),
                               atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(df_c), np.asarray(df),
                               atol=1e-3, rtol=1e-4)
    assert (np.asarray(flag_c) == np.asarray(flag_f)).all()
    np.testing.assert_allclose(np.asarray(pts_c), np.asarray(pts_f),
                               atol=2e-3)
