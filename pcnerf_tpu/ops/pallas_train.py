"""Pallas TPU kernels for the affine-collapse TRAIN path: fused
embedding-moments and embedding-matvec that never materialize the
(rays*samples, 63) positional embedding.

Why this exists (round-5 trace, PERF.md "Where the step time goes"): with
the affine collapse active the train step's cost is NOT the math — it is
XLA materializing the embedding E and relaying it out for its consumers
(~13 ms of the 31.4 ms step: `multiply_sine_fusion` + interleave +
566 MB relayout) plus ~5 ms re-reading E in the moment/matvec fusions and
an 8.6 ms backward that is the reverse of the same chain.  The collapsed
forward only ever needs THREE reductions of E (reference semantics:
``models/nof.py:nof_apply_train_collapsed``, itself the exact collapse of
``nof/networks/models.py:44-123`` with slope-1 activations):

    mu    = mean(E)                      (63,)
    Sigma = cov(E)                       (63, 63)
    logit = E @ w_eff + b_eff            (N,)

and — because the embedding has no parameters and the fine z-samples are
detached exactly as the reference detaches ``sample_pdf`` (render.py:151)
— E is CONSTANT under the gradient: the entire backward through this
stage is ``dw_eff = E^T @ dlogit``, ``db_eff = sum(dlogit)``.  So three
grid passes that recompute E tile-by-tile in VMEM replace every HBM
materialization, forward and backward.

Two kernel-only tricks XLA cannot apply:

1. **Power-of-two frequency recurrence.**  The bands are exactly
   ``2**k`` (``models/embedding.py:freq_bands``), so sin/cos of band k+1
   follow from band k by the double-angle identities
   ``sin2 = 2*s*c, cos2 = 1 - 2*s*s`` — 6 transcendentals per point per
   seed instead of 60.  Error doubles per doubling, so a fresh
   sin/cos seed is planted every ``SEED_EVERY`` bands (amplification
   <= 2**(SEED_EVERY-1); measured accuracy table in the tests and
   PERF.md).  Seed arguments are ``2**k * x`` with the power-of-two
   scaling EXACT in fp; |arg| stays <= ~2**SEED_EVERY * |x| — far below
   the ~5e4 rad range where Mosaic's sin/cos degrade (the Cody-Waite
   territory of the eval kernel, ``pallas_kernels.py``), so native
   Mosaic trig seeds are accurate here.

2. **Augmented-Gram moments.**  E is augmented with a ones row (the
   63->64 lane pad), so ONE accumulated Gram ``G = E_aug^T E_aug`` yields
   count (G[63,63]), first moments (G[63,:63]) and second moments in a
   single pass; the raw-coordinate rows are pre-shifted by an approximate
   batch mean (covariance is shift-invariant) so the one-pass
   ``E[x^2]-E[x]^2`` cancellation never sees the +-100 m coordinate
   magnitudes.  The same ones row makes the matvec affine: with
   ``w_aug[63] = b_eff`` the bias and its gradient ride the same kernels.

Used by ``models/nof.py:nof_apply_train_collapsed_fused`` (config flag
``ModelConfig.fused_embed``); falls back to interpret mode off-TPU so the
CPU test mesh and the multichip dryrun exercise identical code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

# points per grid program (lane dim of every tile).  Autotuned on v5e at
# the flagship step (logs_bg/bench_tile_*_r5.log): 2048 -> 18.89 ms,
# 4096 -> 19.15, 8192 -> 19.32 — a flat optimum favoring the smaller
# tile (better pipeline overlap; the kernels are compute-dense, so grid
# overhead is negligible either way).  Env override for re-tuning.
TILE = int(os.environ.get("PCNERF_FUSED_TILE", "2048"))
SEED_EVERY = 5    # fresh sin/cos seed every k bands (error amp <= 2**(k-1))


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _rows(n_freq: int) -> int:
    """Embedding rows padded up: 3 raw + 6*n_freq sin/cos + ones row(s)."""
    r = 3 + 6 * n_freq + 1
    return ((r + 7) // 8) * 8


def _emb_pieces(xt, n_freq: int, shift=None):
    """Build the embedding of one tile as a list of (rows, T) pieces in the
    reference channel order [x, sin_0, cos_0, sin_1, cos_1, ...]
    (``models/embedding.py:embed_positions``), via the double-angle
    recurrence re-seeded every SEED_EVERY bands.  ``shift``: optional 3
    scalars subtracted from the raw rows (moments kernel only)."""
    if shift is not None:
        pieces = [xt[a:a + 1] - shift[a] for a in range(3)]
    else:
        pieces = [xt]
    s = c = None
    for k in range(n_freq):
        if k % SEED_EVERY == 0:
            arg = xt * float(2.0 ** k)   # power-of-two scale: exact in fp
            s, c = jnp.sin(arg), jnp.cos(arg)
        else:
            s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
        pieces.append(s)
        pieces.append(c)
    return pieces


def _emb_tile(xt, n_freq: int, rows: int, shift=None):
    """(rows, T) embedding tile; rows beyond 3+6F are ONES (the augmented
    row carrying count/first-moments/bias — see module docstring)."""
    pieces = _emb_pieces(xt, n_freq, shift)
    pad = rows - (3 + 6 * n_freq)
    if pad:
        pieces.append(jnp.ones((pad,) + xt.shape[1:], xt.dtype))
    return jnp.concatenate(pieces, axis=0)


# ---------------------------------------------------------------------------
# Kernel 1: augmented Gram (moments)
# ---------------------------------------------------------------------------

def _gram_kernel(shift_ref, xt_ref, gram_ref, *, n_freq, rows, n_valid, tile):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        gram_ref[...] = jnp.zeros_like(gram_ref)

    sh = [shift_ref[a, 0] for a in range(3)]
    e = _emb_tile(xt_ref[...], n_freq, rows, shift=sh)
    if n_valid % tile:
        # zero the padding lanes of the last tile so they drop out of sums
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1) + t * tile
        e = jnp.where(lane < n_valid, e, 0.0)
    gram_ref[...] += jax.lax.dot_general(
        e, e, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def embed_gram(x_t: jnp.ndarray, shift: jnp.ndarray, n_freq: int,
               n_valid: int) -> jnp.ndarray:
    """Accumulated augmented Gram of the embedding.

    x_t: (3, Npad) f32 raw sample coordinates, Npad % TILE == 0, lanes
    >= n_valid ignored.  shift: (3, 1) f32 subtracted from the raw rows.
    Returns (rows, rows) f32 with rows = _rows(n_freq):
      [:63,:63] raw-shifted second moments, [R-?..] ones-row cross terms.
    """
    rows = _rows(n_freq)
    npad = x_t.shape[1]
    kern = functools.partial(_gram_kernel, n_freq=n_freq, rows=rows,
                             n_valid=n_valid, tile=TILE)
    return pl.pallas_call(
        kern,
        grid=(npad // TILE,),
        in_specs=[
            pl.BlockSpec((3, 1), lambda t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((3, TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, rows), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, rows), jnp.float32),
        interpret=_interpret(),
    )(shift, x_t)


def embed_moments(x_t: jnp.ndarray, n_freq: int, n_valid: int,
                  axis_name: str | None = None):
    """(mu (63+,), sigma (63+,63+), n) of the embedding of x_t's valid lanes.

    Exact reference semantics (two-pass-equivalent covariance): the raw
    rows are centered by an approximate mean before the one-pass Gram, so
    the subtraction below never cancels at coordinate magnitude.  The
    returned mu/sigma cover rows 0..3+6F-1 (the real embedding channels).

    Under ``axis_name`` (data-parallel shard_map) the shift is pmean'd so
    every device centers identically, and the Gram — count, first and
    second moments in one array — is psum'd: the derived statistics equal
    the global-batch sync-BN statistics exactly as in the XLA path.
    """
    rows = _rows(n_freq)
    d = 3 + 6 * n_freq
    # approximate raw mean as the centering shift (any constant is exact
    # for the covariance; stop_gradient is for clarity — x_t carries none)
    shift = jax.lax.stop_gradient(
        jnp.mean(x_t[:, :n_valid] if x_t.shape[1] != n_valid else x_t,
                 axis=1, keepdims=True)).astype(jnp.float32)
    if axis_name is not None:
        shift = jax.lax.pmean(shift, axis_name)
    g = embed_gram(x_t, shift, n_freq, n_valid)
    if axis_name is not None:
        g = jax.lax.psum(g, axis_name)
    n = g[rows - 1, rows - 1]
    mu_shifted = g[rows - 1, :d] / n
    sigma = g[:d, :d] / n - jnp.outer(mu_shifted, mu_shifted)
    mu = mu_shifted.at[:3].add(shift[:, 0])
    return mu, sigma, n


# ---------------------------------------------------------------------------
# Kernels 2+3: affine matvec with custom VJP
# ---------------------------------------------------------------------------

def _affine_kernel(xt_ref, w_ref, out_ref, *, n_freq, rows):
    e = _emb_tile(xt_ref[...], n_freq, rows)
    out_ref[...] = jnp.sum(e * w_ref[...], axis=0, keepdims=True)


def _dw_kernel(xt_ref, g_ref, dw_ref, *, n_freq, rows):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    e = _emb_tile(xt_ref[...], n_freq, rows)
    dw_ref[...] += jnp.sum(e * g_ref[...], axis=1, keepdims=True)


def _affine_impl(x_t, w_aug, n_freq):
    rows = w_aug.shape[0]
    npad = x_t.shape[1]
    kern = functools.partial(_affine_kernel, n_freq=n_freq, rows=rows)
    return pl.pallas_call(
        kern,
        grid=(npad // TILE,),
        in_specs=[
            pl.BlockSpec((3, TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, npad), jnp.float32),
        interpret=_interpret(),
    )(x_t, w_aug)


def _dw_impl(x_t, g, n_freq, rows):
    npad = x_t.shape[1]
    kern = functools.partial(_dw_kernel, n_freq=n_freq, rows=rows)
    return pl.pallas_call(
        kern,
        grid=(npad // TILE,),
        in_specs=[
            pl.BlockSpec((3, TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, 1), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 1), jnp.float32),
        interpret=_interpret(),
    )(x_t, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def embed_affine(x_t, w_aug, n_freq):
    """``E_aug(x_t) @ w_aug`` -> (1, Npad) logits.

    w_aug: (rows, 1) f32 — rows 0..3+6F-1 are w_eff in reference channel
    order, the ones row(s) carry b_eff (bias folded into the matvec).
    Gradient flows to w_aug only (E is parameter-free and z is detached,
    render.py:151): the VJP is one Gram-style kernel pass; the x_t
    cotangent is structurally zero and DCE'd by XLA.
    """
    return _affine_impl(x_t, w_aug, n_freq)


def _embed_affine_fwd(x_t, w_aug, n_freq):
    return _affine_impl(x_t, w_aug, n_freq), (x_t, w_aug.shape[0])


def _embed_affine_bwd(n_freq, res, g):
    x_t, rows = res
    dw = _dw_impl(x_t, g.astype(jnp.float32), n_freq, rows)
    return jnp.zeros_like(x_t), dw


embed_affine.defvjp(_embed_affine_fwd, _embed_affine_bwd)


# ---------------------------------------------------------------------------
# Padding helper
# ---------------------------------------------------------------------------

def pad_points_t(flat_points: jnp.ndarray):
    """(N, 3) sample coordinates -> ((3, Npad) f32, N) with Npad % TILE == 0.

    The transpose + pad is the ONLY materialization this path makes:
    3 * N * 4 bytes (vs the 63-channel embedding + relayouts it replaces).
    """
    n = flat_points.shape[0]
    x_t = flat_points.astype(jnp.float32).T
    npad = ((n + TILE - 1) // TILE) * TILE
    if npad != n:
        x_t = jnp.pad(x_t, ((0, 0), (0, npad - n)))
    return x_t, n
