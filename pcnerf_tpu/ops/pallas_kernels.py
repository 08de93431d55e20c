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

The GENERIC (slope != 1) training step stays on the XLA path deliberately:
exact reference semantics make train-mode BatchNorm statistics a
global-batch reduction between every pair of matmuls, so a cross-layer
fused kernel is impossible without changing the math, and within a layer
XLA already fuses the normalize/activation chain into the matmuls.  The
remaining knob there — trading HBM activation traffic for recompute — is
``ModelConfig.remat_mlp`` (jax.checkpoint over the MLP apply), benchmarked
in PERF.md.  The COLLAPSED (slope-1 quirk) training step, whose cost is
embedding materialization rather than matmuls, has its own fused kernels
in ``ops/pallas_train.py`` (round 5): moments + matvec grid passes with a
custom VJP, behind ``ModelConfig.fused_embed``.
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
      head_w (1, 256) row                [consumed by a VPU lane reduction]
      biases b (8, 256), head_b (128,) col 0 real
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
    # head as a (1, 256) row: consumed by a lane reduction in the kernel
    head_w = folded["head"]["w"][:, 0].reshape(1, mcfg.feature_size)
    b = jnp.stack([L[i]["b"] for i in range(8)])
    head_b = jnp.zeros((128,), jnp.float32).at[0].set(folded["head"]["b"][0])
    return {"w0": w0, "w_mid": w_mid, "w_skip": w_skip, "w_tail": w_tail,
            "head_w": head_w, "b": b, "head_b": head_b}


def _occ_kernel(o_ref, d_ref, z_ref, w0_ref, wmid_ref, wskip_ref, wtail_ref,
                headw_ref, b_ref, headb_ref, emb_const_ref, *refs,
                n_samples: int, n_freq: int, compute_dtype, slope: float,
                fuse_weights: bool = False):
    """Mosaic-legal layout: every vector keeps a 64/128/256-lane minor dim.

    The naive formulation (materialize (P, F, 2, 3) sin/cos then reshape to
    (P, 60)) dies in Mosaic's infer-vector-layout ("unsupported shape cast"
    — lane-dim reshapes are not implemented on real TPUs; interpret mode
    happily accepts them, which is why only a hardware compile caught it).
    Instead the embedding is computed directly in its final 64-lane layout:
    the caller pre-expands origin/direction to per-lane values (o_lane[j] =
    o[axis(j)], zero in the pad lane) so x_lane = o_lane + d_lane * z is the
    raw coordinate of every embedding channel, and one masked-trig pass
      emb = (1 - sin_m - cos_m) * x + sin_m * sin(s*x) + cos_m * cos(s*x)
    produces [x, sin(2^k x), cos(2^k x), ..., 0] with no reshape or concat
    on the lane dim.  The only reshapes collapse/expand MAJOR dims (lane dim
    untouched), which Mosaic supports; the skip concat becomes two summed
    matmuls and the 1-wide head column a lane reduction.
    """
    if fuse_weights:
        # strict-UPPER-triangular ones (np.triu(.., 1)) + weights output;
        # upper because it is RIGHT-multiplied: (lw @ tri_excl)[r, i] sums
        # lw[r, j] over j < i — the exclusive prefix
        tri_excl_ref, occ_ref = refs
    else:
        (occ_ref,) = refs
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

    def chunk_body(c, carry):
        zs = z_ref[:, pl.ds(c * CHUNK_S, CHUNK_S)]              # (TILE_R, CS)
        o = o_ref[:]                                            # (TILE_R, 64)
        d = d_ref[:]
        scale = emb_const_ref[0, :]                             # (64,)
        sin_m = emb_const_ref[1, :]
        cos_m = emb_const_ref[2, :]
        inv2pi = emb_const_ref[3, 0]
        c1 = emb_const_ref[4, 0]
        c2 = emb_const_ref[5, 0]
        c3 = emb_const_ref[6, 0]
        # per-lane raw coordinate of each embedding channel
        x = o[:, None, :] + d[:, None, :] * zs[..., None]       # (TILE_R, CS, 64)
        sx = scale * x
        # Cody-Waite range reduction before the trig: Mosaic's sin/cos are
        # accurate only near the principal range, while |sx| reaches
        # 2^(n_freq-1) * scene_extent ~ 5e4 rad (measured 0.016 occupancy
        # error vs f64 without this, 25x worse than the XLA path).  2*pi is
        # split into three <=11-significand-bit terms so k*ci is exact for
        # k < 2^13, making r = sx mod 2*pi accurate to ~ulp(pi).
        kf = jnp.round(sx * inv2pi)
        r = ((sx - kf * c1) - kf * c2) - kf * c3
        emb3 = ((1.0 - sin_m - cos_m) * x
                + sin_m * jnp.sin(r) + cos_m * jnp.cos(r))
        emb = emb3.reshape(TILE_R * CHUNK_S, 64)                # major collapse

        h = jnp.dot(cast(emb), cast(w0_ref[:]), preferred_element_type=f32)
        h = act(h + b_ref[0, :])
        for i in range(3):
            h = act(jnp.dot(cast(h), cast(wmid_ref[i]),
                            preferred_element_type=f32) + b_ref[i + 1, :])
        # the 4 stray LeakyReLUs the reference appends to layer1
        # (models.py:92,172): slope^4 on the negatives
        for _ in range(4):
            h = act(h)
        # skip concat [emb | h] @ w_skip == emb @ w_skip[:64] + h @ w_skip[64:]
        h = (jnp.dot(cast(emb), cast(wskip_ref[:64, :]),
                     preferred_element_type=f32)
             + jnp.dot(cast(h), cast(wskip_ref[64:, :]),
                       preferred_element_type=f32) + b_ref[4, :])
        for i in range(3):
            h = jnp.dot(cast(h), cast(wtail_ref[i]),
                        preferred_element_type=f32) + b_ref[i + 5, :]
        # head: 256 -> 1 as a lane reduction in (TILE_R, CS) layout.  The
        # product stays f32 (h and head_w uncast): the reduction is VPU-bound
        # either way, and a bf16 product rounds each term before the f32 sum
        # (measured max err vs f64 8.3e-4 bf16 vs 6.3e-4 f32 — advisor r3)
        h3 = h.reshape(TILE_R, CHUNK_S, 256)                    # major expand
        logit = jnp.sum(h3 * headw_ref[0, :], axis=-1,
                        dtype=f32) + headb_ref[0, 0]
        occ = jax.nn.sigmoid(logit)                             # (TILE_R, CS)
        if not fuse_weights:
            occ_ref[:, pl.ds(c * CHUNK_S, CHUNK_S)] = occ
            return carry
        # fused compositing epilogue: w_i = occ_i * prod_{j<i}(1 - occ_j)
        # (ops/compositing.py:occupancy_to_weights).  The running
        # transmittance T rides the fori_loop carry across S chunks; the
        # in-chunk exclusive prefix product runs in log space as ONE MXU
        # matmul against a strict-upper-triangular ones matrix (right-
        # multiplied, so column i sums rows j < i; Mosaic has no lane-dim
        # cumprod; precision=HIGHEST keeps the log sums f32 — the default
        # bf16 matmul pass would cost ~0.4% in exp space).
        pf = jnp.maximum(1.0 - occ, 1e-30)
        lw = jnp.log(pf)
        excl = jnp.dot(lw, tri_excl_ref[:], preferred_element_type=f32,
                       precision=jax.lax.Precision.HIGHEST)
        w = carry[:, :1] * jnp.exp(excl) * occ
        occ_ref[:, pl.ds(c * CHUNK_S, CHUNK_S)] = w
        total = jnp.sum(lw, axis=-1, keepdims=True)             # (TILE_R, 1)
        return carry * jnp.exp(total)

    init = (jnp.ones((TILE_R, 128), f32) if fuse_weights else 0)
    jax.lax.fori_loop(0, n_chunks, chunk_body, init)


@functools.partial(jax.jit, static_argnames=("mcfg", "fuse_weights"))
def fused_occupancy(padded, origins, dirs, z_vals, mcfg: ModelConfig,
                    fuse_weights: bool = False):
    """(R, S) occupancy via the fused Pallas kernel — or, with
    ``fuse_weights=True``, the (R, S) UNNORMALIZED transmittance weights
    ``w_i = occ_i * prod_{j<i}(1-occ_j)`` with the compositing cumprod fused
    into the same VMEM-resident pass (SURVEY §7 step 5's remaining scope:
    the slope!=1 eval path's compositing stage; cumprod semantics from
    ops/compositing.py:occupancy_to_weights, reference nof/render.py:52-55).

    R must be a multiple of TILE_R and S of CHUNK_S.
    """
    R, S = z_vals.shape
    assert R % TILE_R == 0 and S % CHUNK_S == 0, (R, S)
    d_emb = mcfg.in_channels
    bands = np.asarray(freq_bands(mcfg.n_freq, mcfg.logscale), np.float32)
    # per-lane embedding layout: [x(3), sin_0(3), cos_0(3), sin_1(3), ..., 0]
    sel = np.zeros((3, 64), np.float32)      # axis(j) selector
    scale = np.zeros(64, np.float32)
    sin_m = np.zeros(64, np.float32)
    cos_m = np.zeros(64, np.float32)
    for j in range(d_emb):
        if j < 3:
            sel[j, j] = 1.0
        else:
            q = j - 3
            k, rem = q // 6, q % 6
            t, a = rem // 3, rem % 3
            sel[a, j] = 1.0
            scale[j] = bands[k]
            (sin_m if t == 0 else cos_m)[j] = 1.0
    # Cody-Waite constants: 2*pi = c1 + c2 + c3 with c1, c2 holding <= 10
    # significand bits each, so k * c1 and k * c2 are exact f32 products for
    # k < 2^14 (|sx| <= 2^(n_freq-1) * scene extent ~ 7e4 rad => k <~ 1.1e4)
    two_pi = 2.0 * np.pi
    c1 = np.float32(np.ldexp(np.round(np.ldexp(two_pi, 7)), -7))   # 10-bit
    rem = two_pi - np.float64(c1)
    c2 = np.float32(np.ldexp(np.round(np.ldexp(rem, 19)), -19))    # 10-bit
    c3 = np.float32(two_pi - np.float64(c1) - np.float64(c2))
    emb_const = jnp.zeros((8, 64), jnp.float32)
    emb_const = (emb_const.at[0].set(scale).at[1].set(sin_m).at[2].set(cos_m)
                 .at[3].set(np.float32(1.0 / two_pi))
                 .at[4].set(c1).at[5].set(c2).at[6].set(c3))
    # exact per-lane expansion: a gather, NOT a matmul — the default TPU f32
    # matmul runs a single bf16 pass, which would quantize the +-100 m
    # coordinates by ~0.1 m BEFORE the 2^k frequency scaling (measured 0.016
    # occupancy error end-to-end)
    axis_map = np.argmax(sel, axis=0)                       # (64,) axis(j)
    lane_valid = jnp.asarray(sel.sum(axis=0), jnp.float32)  # 0 for dead lanes
    o_lane = origins.astype(jnp.float32)[:, axis_map] * lane_valid
    d_lane = dirs.astype(jnp.float32)[:, axis_map] * lane_valid
    grid = (R // TILE_R,)

    kernel = functools.partial(_occ_kernel, n_samples=S, n_freq=mcfg.n_freq,
                               compute_dtype=mcfg.compute_dtype,
                               slope=mcfg.negative_slope,
                               fuse_weights=fuse_weights)
    in_specs = [
        pl.BlockSpec((TILE_R, 64), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_R, 64), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_R, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((64, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 256, 256), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((320, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 256, 256), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [o_lane, d_lane, z_vals, padded["w0"], padded["w_mid"],
            padded["w_skip"], padded["w_tail"], padded["head_w"], padded["b"],
            padded["head_b"].reshape(1, 128), emb_const]
    if fuse_weights:
        tri_excl = jnp.asarray(
            np.triu(np.ones((CHUNK_S, CHUNK_S), np.float32), 1))
        in_specs.append(pl.BlockSpec((CHUNK_S, CHUNK_S), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(tri_excl)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE_R, S), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, S), jnp.float32),
    )(*args)
