"""Weights pipeline + child losses vs. the torch oracle (noise_std = 0)."""

import jax.numpy as jnp
import numpy as np
import torch

from pcnerf_tpu.ops import compositing as C
from tests import oracle


def _setup(r=48, s=64, seed=5):
    rng = np.random.default_rng(seed)
    occ = rng.uniform(0.01, 0.99, (r, s)).astype(np.float32)
    z = np.sort(rng.uniform(0.5, 60, (r, s)).astype(np.float32), axis=-1)
    nc = rng.uniform(5, 40, r).astype(np.float32)
    fc = nc + rng.uniform(0.5, 3.0, r).astype(np.float32)
    ranges = ((nc + fc) / 2).astype(np.float32)
    ids = rng.integers(1, 9, r).astype(np.float32)
    return occ, z, nc, fc, ranges, ids


def test_weights_and_depth_parity():
    occ, z, *_ = _setup()
    w_j = np.asarray(C.normalize_weights(C.occupancy_to_weights(jnp.asarray(occ))))
    w_t = oracle.weights_from_occ(torch.tensor(occ)).numpy()
    np.testing.assert_allclose(w_j, w_t, atol=1e-6)
    d_j = np.asarray(C.composite_depth(jnp.asarray(w_j), jnp.asarray(z)))
    np.testing.assert_allclose(d_j, (w_t * z).sum(-1), rtol=1e-5)


def test_child_losses_parity_nodivide():
    occ, z, nc, fc, ranges, ids = _setup()
    w = C.normalize_weights(C.occupancy_to_weights(jnp.asarray(occ)))
    free_mask, _ = C.child_mask(jnp.asarray(z), jnp.asarray(nc), jnp.asarray(fc),
                                gamma0=0.0)
    depth_mask, _ = C.child_mask(jnp.asarray(z), jnp.asarray(nc), jnp.asarray(fc),
                                 gamma0=2.0)
    free_j = float(C.child_free_loss(w, free_mask, jnp.asarray(ids), 8, divide=False))
    depth_j = float(C.child_depth_loss(w, depth_mask, jnp.asarray(z),
                                       jnp.asarray(ranges), jnp.asarray(ids), 8,
                                       divide=False))
    w_t = oracle.weights_from_occ(torch.tensor(occ))
    free_t, depth_t = oracle.child_losses_loop(
        w_t, torch.tensor(z), torch.tensor(nc), torch.tensor(fc),
        torch.tensor(ranges), torch.tensor(ids), 8, divide=False)
    np.testing.assert_allclose(free_j, float(free_t), rtol=1e-5)
    np.testing.assert_allclose(depth_j, float(depth_t), rtol=1e-5)


def test_child_losses_parity_divide():
    occ, z, nc, fc, ranges, ids = _setup(seed=6)
    w = C.normalize_weights(C.occupancy_to_weights(jnp.asarray(occ)))
    free_mask, _ = C.child_mask(jnp.asarray(z), jnp.asarray(nc), jnp.asarray(fc),
                                gamma0=0.0)
    depth_mask, _ = C.child_mask(jnp.asarray(z), jnp.asarray(nc), jnp.asarray(fc),
                                 gamma0=2.0)
    free_j = float(C.child_free_loss(w, free_mask, jnp.asarray(ids), 8, divide=True))
    depth_j = float(C.child_depth_loss(w, depth_mask, jnp.asarray(z),
                                       jnp.asarray(ranges), jnp.asarray(ids), 8,
                                       divide=True))
    w_t = oracle.weights_from_occ(torch.tensor(occ))
    free_t, depth_t = oracle.child_losses_loop(
        w_t, torch.tensor(z), torch.tensor(nc), torch.tensor(fc),
        torch.tensor(ranges), torch.tensor(ids), 8, divide=True)
    np.testing.assert_allclose(free_j, float(free_t), rtol=1e-5)
    np.testing.assert_allclose(depth_j, float(depth_t), rtol=1e-5)


def test_opacity_regularizer():
    occ, *_ = _setup()
    got = float(C.opacity_regularizer(jnp.asarray(occ)))
    p = torch.tensor(occ)
    want = float((torch.log(0.1 + p) + torch.log(1.1 - p) + 2.20727).mean())
    np.testing.assert_allclose(got, want, rtol=1e-5)
