"""Two-step inference parity vs the literal torch/scipy oracle, plus the
group-aware batcher and the gaussian kernel."""

import numpy as np
import jax.numpy as jnp
import pytest

from pcnerf_tpu.eval.engine import (
    GroupBatcher,
    pass_from_occ,
    scipy_gaussian_kernel1d,
)
from tests import oracle


def _scene(seed=0, n_groups=40, n_samples=256):
    """Synthetic grouped test rays with occupancy bumps."""
    rng = np.random.default_rng(seed)
    occ_rows, z_rows, nc, fc, counts = [], [], [], [], []
    for g in range(n_groups):
        size = int(rng.integers(1, 5))
        far_p = rng.uniform(30, 60)
        z = np.linspace(0.0, far_p, n_samples).astype(np.float32)
        for i in range(size):
            occ = rng.uniform(0.0, 0.02, n_samples).astype(np.float32)
            # a couple of occupancy bumps at random depths
            for _ in range(int(rng.integers(1, 4))):
                c = rng.integers(10, n_samples - 10)
                occ[c - 4:c + 4] += rng.uniform(0.3, 0.9)
            occ = np.clip(occ, 0, 0.98)
            a = rng.uniform(2, far_p - 3)
            occ_rows.append(occ)
            z_rows.append(z)
            nc.append(a)
            fc.append(a + rng.uniform(0.3, 2.0))
            counts.append(size - 1 if i == 0 else 0)
    return (np.stack(occ_rows), np.stack(z_rows), np.asarray(nc, np.float32),
            np.asarray(fc, np.float32), np.asarray(counts))


@pytest.mark.parametrize("method", [1, 2])
def test_pass_parity_vs_oracle(method):
    occ, z, nc, fc, counts = _scene()
    n = occ.shape[0]
    seg = np.zeros(n, np.int32)
    gid, i = 0, 0
    while i < n:
        size = counts[i] + 1
        seg[i:i + size] = gid
        gid += 1
        i += size
    kernel = jnp.asarray(scipy_gaussian_kernel1d(5.0))
    depth_j, _, flag_j = pass_from_occ(
        jnp.asarray(occ), jnp.asarray(z), jnp.asarray(nc), jnp.asarray(fc),
        jnp.asarray(seg), gid, jnp.ones(n, bool), kernel, 1e-10, method)
    depth_o, flag_o = oracle.inference_0525_2_oracle(occ, z, counts, nc, fc,
                                                     method=method)
    np.testing.assert_allclose(np.asarray(depth_j), depth_o, rtol=2e-4,
                               atol=2e-4)
    assert (np.asarray(flag_j) == flag_o).all()


def test_gaussian_kernel_matches_scipy():
    scipy = pytest.importorskip("scipy.ndimage")
    k = scipy_gaussian_kernel1d(5.0)
    x = np.zeros(101, np.float32)
    x[50] = 1.0
    want = scipy.gaussian_filter(x, sigma=5.0)
    got = np.convolve(x, k, mode="same")
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_group_batcher_respects_groups():
    rng = np.random.default_rng(1)
    rows = []
    counts = []
    while len(rows) < 3000:
        size = int(rng.integers(1, 6))
        for i in range(size):
            r = np.zeros(13, np.float32)
            r[12] = size - 1 if i == 0 else -1
            rows.append(r)
            counts.append(size - 1 if i == 0 else 0)
    rays = np.stack(rows)
    b = GroupBatcher(rays, np.asarray(counts))
    seen = 0
    for rays_p, seg, valid, n_real in b.batches(512, 1024, 1536):
        # every batch must start with a group-start row
        assert rays_p[0, 12] >= -0.5
        # last real row's group must be complete: trailing row count check
        first_rows = np.flatnonzero(rays_p[:n_real, 12] >= -0.5)
        last_start = first_rows[-1]
        assert last_start + int(rays_p[last_start, 12]) + 1 <= n_real
        seen += n_real
    # the reference's loop skips a trailing single row (:1117); allow <= 1 lost
    assert rays.shape[0] - seen <= 1


def test_occupancy_collapsed_fused_matches_xla():
    """Eval-path fused matvec (mlp_mode='collapsed_fused') equals the XLA
    band-wise collapsed occupancy (interpret-mode kernels on CPU)."""
    from pcnerf_tpu.config import ModelConfig
    from pcnerf_tpu.eval.engine import (_occupancy_collapsed,
                                        _occupancy_collapsed_fused)
    rng = np.random.default_rng(11)
    R, S = 32, 160
    origins = jnp.asarray(rng.uniform(-5, 5, (R, 3)).astype(np.float32))
    dirs = rng.normal(size=(R, 3))
    dirs = jnp.asarray((dirs / np.linalg.norm(dirs, axis=-1, keepdims=True))
                       .astype(np.float32))
    z = jnp.asarray(np.sort(rng.uniform(0.5, 80, (R, S))
                            .astype(np.float32), axis=1))
    w = jnp.asarray((rng.normal(size=(63, 1)) * 0.05).astype(np.float32))
    b = jnp.asarray(np.float32([0.2]))
    model = {"w_eff": w, "b_eff": b}
    mcfg = ModelConfig(fused_embed="on")
    occ_f = _occupancy_collapsed_fused(model, origins, dirs, z, mcfg)
    occ_x = _occupancy_collapsed(model, origins, dirs, z, mcfg)
    assert occ_f.shape == (R, S)
    np.testing.assert_allclose(np.asarray(occ_f), np.asarray(occ_x),
                               atol=2e-3)
