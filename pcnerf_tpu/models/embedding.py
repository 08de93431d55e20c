"""Sinusoidal positional embedding.

Reference: ``nof/networks/models.py:4-41`` (class ``Embedding``).  The output
layout is [x, sin(f0*x), cos(f0*x), sin(f1*x), cos(f1*x), ...] with
``f_k = 2**k`` for logscale (``2**linspace(0, N-1, N)``), giving
3 + 3*2*N_freq channels (63 for N_freq=10).

Implemented as a single fused computation: one (B, 3, N_freq) broadcast
multiply + sin/cos, then a reshape — no Python loop over frequency bands, so
XLA fuses it straight into the first matmul's operand.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def embedding_dim(n_freq: int, in_channels: int = 3) -> int:
    return in_channels + in_channels * 2 * n_freq


def freq_bands(n_freq: int, logscale: bool = True) -> np.ndarray:
    if logscale:
        return 2.0 ** np.linspace(0.0, n_freq - 1, n_freq)
    return np.linspace(1.0, 3.0 ** (n_freq - 1), n_freq)


def embedded_dot(x: jnp.ndarray, w_eff: jnp.ndarray, n_freq: int,
                 logscale: bool = True) -> jnp.ndarray:
    """``embed_positions(x) @ w_eff`` computed band-wise.

    Used by the affine-collapse inference path: the (..., 63) embedding is
    never materialized — XLA fuses the per-band sin/cos multiply-adds into
    one elementwise pass over the points, which matters at eval scale
    (5120 rays x 12288 samples => a 16 GB embedding otherwise).
    """
    bands = jnp.asarray(freq_bands(n_freq, logscale), dtype=x.dtype)
    w = w_eff.reshape(-1)
    w_x = w[: x.shape[-1]]
    w_sc = w[x.shape[-1]:].reshape(n_freq, 2, x.shape[-1])
    scaled = x[..., None, :] * bands[:, None]            # (..., F, 3)
    acc = x @ w_x
    acc = acc + jnp.sum(jnp.sin(scaled) * w_sc[:, 0], axis=(-2, -1))
    acc = acc + jnp.sum(jnp.cos(scaled) * w_sc[:, 1], axis=(-2, -1))
    return acc


def _lane_constants(n_freq: int, in_ch: int, logscale: bool):
    """Per-output-lane (scale, raw/sin/cos masks) for the final channel
    order [x, sin_0, cos_0, sin_1, cos_1, ...] (each block ``in_ch`` wide)."""
    bands = freq_bands(n_freq, logscale)
    dim = in_ch + 2 * n_freq * in_ch
    scale = np.ones(dim, np.float32)
    raw_m = np.zeros(dim, np.float32)
    sin_m = np.zeros(dim, np.float32)
    cos_m = np.zeros(dim, np.float32)
    raw_m[:in_ch] = 1.0
    for j in range(in_ch, dim):
        band = (j - in_ch) // (2 * in_ch)
        is_cos = ((j - in_ch) // in_ch) % 2
        scale[j] = bands[band]
        (cos_m if is_cos else sin_m)[j] = 1.0
    return scale, raw_m, sin_m, cos_m


def embed_positions(x: jnp.ndarray, n_freq: int, logscale: bool = True) -> jnp.ndarray:
    """Embed (..., 3) positions to (..., 3 + 6*n_freq).

    Channel order matches the reference exactly: the raw position first, then
    per frequency band a sin block and a cos block (each 3 channels).

    Layout note (measured, round 5): a lane-major reformulation (tile x to
    (..., 63) and mask-select raw/sin/cos, the pallas kernel's form) is
    bit-identical but compiles 3x SLOWER under XLA at the train step's
    shapes (100.8 vs 31.5 ms/step, `logs_bg/bench_newemb_r5.log`): with the
    63-wide embedding on the lane dimension XLA pads lanes 63->128 and
    loses the batch-major tiling this form gets (the sin/cos fusion runs
    with the 2.36M batch dim on lanes).  The band-shaped assembly +
    reshape is what XLA handles best outside a hand-written kernel.
    """
    bands = jnp.asarray(freq_bands(n_freq, logscale), dtype=x.dtype)
    # (..., n_freq, 3): scaled coordinates per band
    scaled = x[..., None, :] * bands[:, None]
    sin = jnp.sin(scaled)
    cos = jnp.cos(scaled)
    # interleave per band: [sin_k (3), cos_k (3)] for k = 0..n_freq-1
    sc = jnp.concatenate([sin[..., None, :], cos[..., None, :]], axis=-2)
    sc = sc.reshape(*x.shape[:-1], 2 * n_freq * x.shape[-1])
    return jnp.concatenate([x, sc], axis=-1)
