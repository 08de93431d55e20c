"""Pallas TPU kernels: fused positional-encoding + MLP occupancy evaluation.

The hot op of every render pass is "sample point -> sinusoidal embedding ->
9-layer 256-wide MLP -> sigmoid" over tens of millions of points
(reference: the chunked Embedding+model loop, ``nof/render.py:46-49``).
Under plain XLA each layer's (points, 256) activation round-trips HBM —
~9 x points x 256 x dtype bytes per pass.  This kernel keeps the whole
BN-folded weight set (~1 MB bf16) and the activations of a ray tile resident
in VMEM: HBM traffic drops to the sample coordinates in and one occupancy
scalar per sample out.

Layout notes:
  - the 63-dim embedding is padded to 64 (one zero channel) so every matmul
    K dim is lane-aligned; the first skip-layer weight gets a matching zero
    row (``pad_folded_params``);
  - the skip concat [emb(64) | h(256)] makes layer 4's K = 320 (2.5 tiles);
  - the grid runs over ray tiles; each program evaluates TILE_R rays x all
    S samples in sample-chunks of CHUNK_S, flattening (TILE_R*CHUNK_S, 64)
    onto the MXU.

Forward-only (eval path: BN folded), with the reference's LeakyReLU topology
(including the 4 stray activations) for any ``negative_slope`` — at the
shipped slope 1.0 the affine collapse supersedes this kernel, so its live
role is the ``negative_slope != 1`` ("presumably-intended") network, where
``eval/engine.run_inference`` picks it by default.

The TRAINING step stays on the XLA path deliberately: exact reference
semantics make train-mode BatchNorm statistics a global-batch reduction
between every pair of matmuls, so a cross-layer fused kernel is impossible
without changing the math, and within a layer XLA already fuses the
normalize/activation chain into the matmuls.  The remaining knob — trading
HBM activation traffic for recompute — is ``ModelConfig.remat_mlp``
(jax.checkpoint over the MLP apply), benchmarked in PERF.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pcnerf_tpu.config import ModelConfig
from pcnerf_tpu.models.embedding import freq_bands

TILE_R = 8        # rays per grid program
CHUNK_S = 512     # samples processed per inner step (TILE_R*CHUNK_S = 4096 pts)


def pad_folded_params(folded, mcfg: ModelConfig):
    """Pad a BN-folded param pytree for the kernel (embedding dim 63 -> 64).

    Returns a dict of stacked dense matrices:
      w0 (64, 256), w_mid (3, 256, 256)  [layers 1..3]
      w_skip (320, 256)                  [layer 4; zero row at channel 63]
      w_tail (3, 256, 256)               [layers 5..7]
      head_w (256, 1) -> padded to (256, 128) col 0 real
      biases b (8, 256), head_b (128,)
    """
    L = folded["layers"]
    d_emb = mcfg.in_channels            # 63
    w0 = jnp.zeros((64, mcfg.feature_size), jnp.float32)
    w0 = w0.at[:d_emb].set(L[0]["w"])
    w_mid = jnp.stack([L[i]["w"] for i in range(1, 4)])
    w_skip = jnp.zeros((64 + mcfg.feature_size, mcfg.feature_size), jnp.float32)
    w_skip = w_skip.at[:d_emb].set(L[4]["w"][:d_emb])
    w_skip = w_skip.at[64:].set(L[4]["w"][d_emb:])
    w_tail = jnp.stack([L[i]["w"] for i in range(5, 8)])
    head_w = jnp.zeros((mcfg.feature_size, 128), jnp.float32)
    head_w = head_w.at[:, 0].set(folded["head"]["w"][:, 0])
    b = jnp.stack([L[i]["b"] for i in range(8)])
    head_b = jnp.zeros((128,), jnp.float32).at[0].set(folded["head"]["b"][0])
    return {"w0": w0, "w_mid": w_mid, "w_skip": w_skip, "w_tail": w_tail,
            "head_w": head_w, "b": b, "head_b": head_b}


def _occ_kernel(o_ref, d_ref, z_ref, w0_ref, wmid_ref, wskip_ref, wtail_ref,
                headw_ref, b_ref, headb_ref, bands_ref, occ_ref, *,
                n_samples: int, n_freq: int, compute_dtype, slope: float):
    f32 = jnp.float32
    cast = (lambda x: x.astype(jnp.bfloat16)) if compute_dtype == "bfloat16" \
        else (lambda x: x)

    def act(h):
        # LeakyReLU on the VPU; slope == 1.0 (the reference quirk) is the
        # identity and emits nothing
        if slope == 1.0:
            return h
        return jnp.where(h >= 0, h, slope * h)

    n_chunks = n_samples // CHUNK_S

    def chunk_body(c, _):
        zs = z_ref[:, pl.ds(c * CHUNK_S, CHUNK_S)]              # (TILE_R, CS)
        # points: (TILE_R, CS, 3) -> flattened (TILE_R*CS, 3)
        o = o_ref[:]                                            # (TILE_R, 3)
        d = d_ref[:]
        pts = o[:, None, :] + d[:, None, :] * zs[..., None]
        flat = pts.reshape(TILE_R * CHUNK_S, 3)
        # embedding: [x(3), {sin,cos}(3*n_freq each interleaved)] + 1 pad -> 64
        bands = bands_ref[0, :n_freq]                           # (n_freq,)
        scaled = flat[:, None, :] * bands[:, None]              # (P, F, 3)
        sin = jnp.sin(scaled)
        cos = jnp.cos(scaled)
        sc = jnp.concatenate([sin[:, :, None, :], cos[:, :, None, :]], axis=2)
        emb = jnp.concatenate(
            [flat, sc.reshape(TILE_R * CHUNK_S, 2 * n_freq * 3),
             jnp.zeros((TILE_R * CHUNK_S, 1), f32)], axis=-1)   # (P, 64)

        h = jnp.dot(cast(emb), cast(w0_ref[:]), preferred_element_type=f32)
        h = act(h + b_ref[0, :])
        for i in range(3):
            h = act(jnp.dot(cast(h), cast(wmid_ref[i]),
                            preferred_element_type=f32) + b_ref[i + 1, :])
        # the 4 stray LeakyReLUs the reference appends to layer1
        # (models.py:92,172): slope^4 on the negatives
        for _ in range(4):
            h = act(h)
        skip = jnp.concatenate([emb, h], axis=-1)               # (P, 320)
        h = jnp.dot(cast(skip), cast(wskip_ref[:]),
                    preferred_element_type=f32) + b_ref[4, :]
        for i in range(3):
            h = jnp.dot(cast(h), cast(wtail_ref[i]),
                        preferred_element_type=f32) + b_ref[i + 5, :]
        logit = jnp.dot(cast(h), cast(headw_ref[:]),
                        preferred_element_type=f32)[:, 0] + headb_ref[0, 0]
        occ = jax.nn.sigmoid(logit).reshape(TILE_R, CHUNK_S)
        occ_ref[:, pl.ds(c * CHUNK_S, CHUNK_S)] = occ
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)


@functools.partial(jax.jit, static_argnames=("mcfg",))
def fused_occupancy(padded, origins, dirs, z_vals, mcfg: ModelConfig):
    """(R, S) occupancy via the fused Pallas kernel.

    R must be a multiple of TILE_R and S of CHUNK_S.
    """
    R, S = z_vals.shape
    assert R % TILE_R == 0 and S % CHUNK_S == 0, (R, S)
    bands = jnp.zeros((1, 128), jnp.float32).at[0, :mcfg.n_freq].set(
        jnp.asarray(freq_bands(mcfg.n_freq, mcfg.logscale), jnp.float32))
    grid = (R // TILE_R,)

    kernel = functools.partial(_occ_kernel, n_samples=S, n_freq=mcfg.n_freq,
                               compute_dtype=mcfg.compute_dtype,
                               slope=mcfg.negative_slope)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_R, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 256, 256), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((320, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 256, 256), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_R, S), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, S), jnp.float32),
    )(origins, dirs, z_vals, padded["w0"], padded["w_mid"], padded["w_skip"],
      padded["w_tail"], padded["head_w"], padded["b"],
      padded["head_b"].reshape(1, 128), bands)
