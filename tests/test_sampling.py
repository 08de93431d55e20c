"""Sampling kernels vs. reference-semantics oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from pcnerf_tpu.ops import compositing as C
from pcnerf_tpu.ops import sampling as S
from tests import oracle


def test_stratified_matches_linspace():
    near = jnp.asarray([0.0, 1.0, 2.5])
    far = jnp.asarray([10.0, 5.0, 3.5])
    z = np.asarray(S.stratified_z(near, far, 8))
    for i in range(3):
        np.testing.assert_allclose(
            z[i], np.linspace(float(near[i]), float(far[i]), 8), rtol=1e-6)


def test_segmented_sampling_counts_and_sorted():
    rng = np.random.default_rng(0)
    n = 16
    near = jnp.zeros(n)
    far = jnp.full((n,), 50.0)
    nc = jnp.asarray(rng.uniform(5, 20, n).astype(np.float32))
    fc = nc + jnp.asarray(rng.uniform(1, 5, n).astype(np.float32))
    z = np.asarray(S.segmented_z(near, far, nc, fc, 100, 0.1))
    assert z.shape == (n, 100)
    assert (np.diff(z, axis=-1) >= 0).all()
    # int(100*0.9)=90 parent + 10 child samples; child ones inside [nc, fc]
    for i in range(n):
        inside = ((z[i] >= float(nc[i]) - 1e-5) & (z[i] <= float(fc[i]) + 1e-5)).sum()
        assert inside >= 10


def test_perturb_stays_within_strata():
    near = jnp.zeros(4)
    far = jnp.full((4,), 1.0)
    z = S.stratified_z(near, far, 32)
    zp = np.asarray(S.perturb_z(jax.random.PRNGKey(0), z, 1.0))
    z = np.asarray(z)
    mids = 0.5 * (z[:, :-1] + z[:, 1:])
    lower = np.concatenate([z[:, :1], mids], -1)
    upper = np.concatenate([mids, z[:, -1:]], -1)
    assert (zp >= lower - 1e-7).all() and (zp <= upper + 1e-7).all()


def test_sample_pdf_deterministic_parity():
    rng = np.random.default_rng(3)
    r, m = 32, 63
    bins = np.sort(rng.uniform(0, 50, (r, m)).astype(np.float32), axis=-1)
    w = rng.uniform(0, 1, (r, m - 1)).astype(np.float32)
    got = np.asarray(S.sample_pdf(jax.random.PRNGKey(0), jnp.asarray(bins),
                                  jnp.asarray(w), 128, det=True))
    want = oracle.sample_pdf_det(torch.tensor(bins), torch.tensor(w), 128).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_gamma_mask_closed_form_vs_loop():
    rng = np.random.default_rng(4)
    r, s = 64, 96
    z = np.sort(rng.uniform(0, 60, (r, s)).astype(np.float32), axis=-1)
    nc = rng.uniform(0, 55, r).astype(np.float32)
    fc = nc + rng.uniform(0.01, 3.0, r).astype(np.float32)
    # include rays whose interval contains no sample (forces expansion)
    nc[:8] = 70.0
    fc[:8] = 70.5

    for gamma0, strict in [(0.0, False), (2.0, False), (0.01, True)]:
        got, _ = C.child_mask(jnp.asarray(z), jnp.asarray(nc), jnp.asarray(fc),
                              gamma0=gamma0, strict=strict)
        want = oracle.gamma_mask_loop(torch.tensor(z), torch.tensor(nc),
                                      torch.tensor(fc), gamma0, strict=strict)
        got = np.asarray(got)
        # the loop accumulates 0.01 in float; allow <=1 sample differences on
        # exact boundary ties, but require every ray to have >=1 inside sample
        mismatch = (got != want.numpy()).sum(axis=-1)
        assert (mismatch <= 1).all(), f"gamma0={gamma0}: {mismatch.max()}"
        assert (got.sum(axis=-1) >= 1).all()


def test_searchsorted_right_matches_numpy():
    from pcnerf_tpu.ops.sampling import searchsorted_right

    rng = np.random.default_rng(11)
    cdf = np.sort(rng.uniform(0, 1, (8, 65)), axis=-1).astype(np.float32)
    cdf[:, 0] = 0.0
    # include exact ties to pin the right-side semantics
    u_sorted = rng.uniform(0, 1, (8, 33)).astype(np.float32)
    u_sorted[:, 5] = cdf[:, 10]
    u_sorted = np.sort(u_sorted, axis=-1)
    got = np.asarray(searchsorted_right(jnp.asarray(cdf), jnp.asarray(u_sorted),
                                        u_is_sorted=True))
    want = np.stack([np.searchsorted(c, v, side="right")
                     for c, v in zip(cdf, u_sorted)])
    np.testing.assert_array_equal(got, want)

    u_rand = rng.uniform(0, 1, (8, 33)).astype(np.float32)
    u_rand[:, 7] = cdf[:, 3]
    got = np.asarray(searchsorted_right(jnp.asarray(cdf), jnp.asarray(u_rand),
                                        u_is_sorted=False))
    want = np.stack([np.searchsorted(c, v, side="right")
                     for c, v in zip(cdf, u_rand)])
    np.testing.assert_array_equal(got, want)


def test_inverse_cdf_interp_matches_gather_formulation():
    """Sort-native interpolation == the textbook searchsorted+gather one."""
    from pcnerf_tpu.ops.sampling import inverse_cdf_interp

    rng = np.random.default_rng(5)
    R, M, K = 16, 65, 129
    w = rng.uniform(0.0, 1.0, (R, M - 1)).astype(np.float32) + 1e-5
    # flat regions to exercise the denom<1e-5 branch and duplicate cdf ties
    w[:, 20:30] = 1e-12
    pdf = w / w.sum(-1, keepdims=True)
    cdf = np.concatenate([np.zeros((R, 1), np.float32),
                          np.cumsum(pdf, -1)], -1)
    bins = np.sort(rng.uniform(0, 50, (R, M)), -1).astype(np.float32)
    for u in (np.broadcast_to(np.linspace(0, 1, K, dtype=np.float32), (R, K)),
              rng.uniform(0, 1, (R, K)).astype(np.float32)):
        inds = np.stack([np.searchsorted(c, v, side="right")
                         for c, v in zip(cdf, u)])
        below = np.maximum(inds - 1, 0)
        above = np.minimum(inds, M - 1)
        cdf_b = np.take_along_axis(cdf, below, -1)
        cdf_a = np.take_along_axis(cdf, above, -1)
        bin_b = np.take_along_axis(bins, below, -1)
        bin_a = np.take_along_axis(bins, above, -1)
        denom = cdf_a - cdf_b
        denom[denom < 1e-5] = 1.0
        want = bin_b + (u - cdf_b) / denom * (bin_a - bin_b)
        got = np.asarray(inverse_cdf_interp(jnp.asarray(cdf),
                                            jnp.asarray(bins),
                                            jnp.asarray(u)))
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_sample_pdf_merged_equals_unfused_chain():
    """sample_pdf_merged == merge_sorted(z, sample_pdf(...)) bit-for-bit,
    both det modes, same key."""
    import jax
    from pcnerf_tpu.ops.sampling import (merge_sorted, sample_pdf,
                                         sample_pdf_merged)

    rng = np.random.default_rng(7)
    R, N, K = 12, 65, 130
    z = np.sort(rng.uniform(0.5, 60.0, (R, N)), -1).astype(np.float32)
    mids = 0.5 * (z[:, 1:] + z[:, :-1])
    w = rng.uniform(0, 1, (R, N - 2)).astype(np.float32)
    w[:, 30:40] = 0.0  # flat-cdf ties
    key = jax.random.PRNGKey(3)
    for det in (True, False):
        z_new = sample_pdf(key, jnp.asarray(mids), jnp.asarray(w), K, det)
        want = np.asarray(merge_sorted(jnp.asarray(z), z_new))
        got = np.asarray(sample_pdf_merged(key, jnp.asarray(z),
                                           jnp.asarray(mids),
                                           jnp.asarray(w), K, det))
        assert got.shape == (R, N + K)
        np.testing.assert_array_equal(got, want)


def test_sample_pdf_merged_negative_bins():
    """Slightly-negative bins (near_child = near - surface_expand can dip
    below 0 for rays entering a child AABB near the origin) must NOT be
    misclassified as u rows: the sentinel is -inf, not a sign test
    (advisor r3, medium).  The fused path must still match the unfused
    chain bit-for-bit."""
    import jax
    from pcnerf_tpu.ops.sampling import (merge_sorted, sample_pdf,
                                         sample_pdf_merged)

    rng = np.random.default_rng(11)
    R, N, K = 8, 33, 64
    # z spans a window that starts below zero
    z = np.sort(rng.uniform(-0.05, 4.0, (R, N)), -1).astype(np.float32)
    z[:, 0] = -0.04  # force a negative bin in every row
    mids = 0.5 * (z[:, 1:] + z[:, :-1])
    w = rng.uniform(0, 1, (R, N - 2)).astype(np.float32)
    key = jax.random.PRNGKey(5)
    for det in (True, False):
        z_new = sample_pdf(key, jnp.asarray(mids), jnp.asarray(w), K, det)
        want = np.asarray(merge_sorted(jnp.asarray(z), z_new))
        got = np.asarray(sample_pdf_merged(key, jnp.asarray(z),
                                           jnp.asarray(mids),
                                           jnp.asarray(w), K, det))
        np.testing.assert_array_equal(got, want)
        # the first bin is negative and must appear in the merged output
        assert (got <= 0).any()


def test_sample_pdf_merged_dense_bit_identical():
    """The dense-reduction bracketing path must reproduce the sort path
    BIT-FOR-BIT (same brackets incl. right-side tie semantics, flat-cdf
    degenerates, and the beyond-last-cdf clip), both det modes."""
    import jax
    from pcnerf_tpu.ops.sampling import (sample_pdf_merged,
                                         sample_pdf_merged_dense)

    rng = np.random.default_rng(17)
    R, N, K = 16, 65, 130
    z = np.sort(rng.uniform(0.5, 60.0, (R, N)), -1).astype(np.float32)
    mids = 0.5 * (z[:, 1:] + z[:, :-1])
    w = rng.uniform(0, 1, (R, N - 2)).astype(np.float32)
    w[:, 20:30] = 0.0      # flat-cdf ties
    w[:, -5:] = 0.0        # flat tail: u == 1 lands beyond the last rise
    key = jax.random.PRNGKey(23)
    for det in (True, False):
        want = np.asarray(sample_pdf_merged(key, jnp.asarray(z),
                                            jnp.asarray(mids),
                                            jnp.asarray(w), K, det))
        got = np.asarray(sample_pdf_merged_dense(key, jnp.asarray(z),
                                                 jnp.asarray(mids),
                                                 jnp.asarray(w), K, det))
        np.testing.assert_array_equal(got, want)
