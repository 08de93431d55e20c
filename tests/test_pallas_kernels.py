"""Fused Pallas occupancy kernel vs the XLA folded-apply (interpret mode on
CPU; the compiled path runs on real TPU in eval)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcnerf_tpu.config import ModelConfig
from pcnerf_tpu.models import (
    embed_positions,
    fold_batchnorm,
    init_nof,
    nof_apply_folded,
)


@pytest.mark.parametrize("slope", [1.0, 0.01])
def test_fused_occupancy_matches_folded_apply(monkeypatch, slope):
    """slope=1.0 is the shipped quirk network; slope=0.01 is the
    presumably-intended LeakyReLU network, where this kernel is the live
    eval fast path (collapse cannot apply)."""
    from jax.experimental import pallas as pl
    import pcnerf_tpu.ops.pallas_kernels as K
    # interpret mode for CPU testing
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        lambda *a, **kw: orig(*a, interpret=True, **kw))

    cfg = ModelConfig(negative_slope=slope)
    params, bn = init_nof(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    bn = {"mean": [jnp.asarray(rng.normal(0, 0.3, m.shape).astype(np.float32))
                   for m in bn["mean"]],
          "var": [jnp.asarray(rng.uniform(0.5, 2.0, v.shape).astype(np.float32))
                  for v in bn["var"]]}
    folded = fold_batchnorm(params, bn, cfg)
    padded = K.pad_folded_params(folded, cfg)

    R, S = K.TILE_R * 2, K.CHUNK_S
    origins = jnp.asarray(rng.normal(0, 1, (R, 3)).astype(np.float32))
    dirs = rng.normal(size=(R, 3))
    dirs = jnp.asarray((dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
                        ).astype(np.float32))
    z = jnp.asarray(np.sort(rng.uniform(1, 40, (R, S)).astype(np.float32), -1))

    occ_k = K.fused_occupancy(padded, origins, dirs, z, cfg)

    pts = origins[:, None, :] + dirs[:, None, :] * z[..., None]
    emb = embed_positions(pts.reshape(-1, 3), cfg.n_freq)
    occ_ref = nof_apply_folded(folded, emb, cfg).reshape(R, S)

    np.testing.assert_allclose(np.asarray(occ_k), np.asarray(occ_ref),
                               atol=2e-5)


@pytest.mark.parametrize("slope", [0.01])
def test_fused_occupancy_weights_matches_compositing(monkeypatch, slope):
    """fuse_weights=True must reproduce occupancy_to_weights(occ) — the
    compositing cumprod fused into the kernel (log-space MXU prefix
    product + cross-chunk transmittance carry)."""
    from jax.experimental import pallas as pl
    import pcnerf_tpu.ops.pallas_kernels as K
    from pcnerf_tpu.ops.compositing import occupancy_to_weights
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        lambda *a, **kw: orig(*a, interpret=True, **kw))

    cfg = ModelConfig(negative_slope=slope)
    params, bn = init_nof(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(4)
    bn = {"mean": [jnp.asarray(rng.normal(0, 0.3, m.shape).astype(np.float32))
                   for m in bn["mean"]],
          "var": [jnp.asarray(rng.uniform(0.5, 2.0, v.shape).astype(np.float32))
                  for v in bn["var"]]}
    folded = fold_batchnorm(params, bn, cfg)
    padded = K.pad_folded_params(folded, cfg)

    R, S = K.TILE_R, K.CHUNK_S * 2   # 2 chunks: exercises the carry
    origins = jnp.asarray(rng.normal(0, 1, (R, 3)).astype(np.float32))
    dirs = rng.normal(size=(R, 3))
    dirs = jnp.asarray((dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
                        ).astype(np.float32))
    z = jnp.asarray(np.sort(rng.uniform(1, 40, (R, S)).astype(np.float32), -1))

    occ = K.fused_occupancy(padded, origins, dirs, z, cfg)
    w_want = occupancy_to_weights(occ)
    w_got = K.fused_occupancy(padded, origins, dirs, z, cfg,
                              fuse_weights=True)
    np.testing.assert_allclose(np.asarray(w_got), np.asarray(w_want),
                               atol=3e-6)
