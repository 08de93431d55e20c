"""NOF occupancy MLP family, functional-JAX edition.

Reference: ``nof/networks/models.py:44-359``.  The four reference classes
(``NOF``, ``NOF_coarse``, ``NOF_fine``, ``NOF_plusfine``) are byte-identical;
here they are one parameterization — a coarse/fine pair is simply two
parameter pytrees.

Reproduced topology — including the reference's construction quirks:

- layer1: 4 x (Linear -> BatchNorm1d -> LeakyReLU(negative_slope)), then the
  four *stray* LeakyReLUs that the reference's layer2 loop appends to layer1
  (models.py:92,172,252,331);
- skip concat of the embedded input (models.py:116-117);
- layer2: 4 x (Linear -> BatchNorm1d) with NO activation in between — the
  activations intended for layer2 went to layer1;
- head: Linear(256 -> 1) + Sigmoid.

Critically, the reference writes ``nn.LeakyReLU(True)``: the positional arg is
``negative_slope``, so slope == 1.0 and every activation above is the
*identity*.  ``ModelConfig.negative_slope`` defaults to 1.0 to preserve this;
any other value restores a real LeakyReLU in the same positions.

Parameters are a plain pytree::

    params = {"layers": [{"w": (din, dout), "b": (dout,),
                          "scale": (dout,), "bias": (dout,)} * 8],
              "head": {"w": (256, 1), "b": (1,)}}
    bn_state = {"mean": [(dout,) * 8], "var": [(dout,) * 8]}

Initialization matches torch defaults (kaiming-uniform a=sqrt(5) == U(+-1/
sqrt(fan_in)) for Linear, ones/zeros for BatchNorm) so distributional parity
with the reference holds at step 0.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from pcnerf_tpu.config import ModelConfig


def _linear_init(key, fan_in: int, fan_out: int):
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound)
    return w, b


def init_nof(key, cfg: ModelConfig):
    """Initialize (params, bn_state) for one NOF MLP."""
    d_in = cfg.in_channels
    f = cfg.feature_size
    widths = [(d_in, f)] + [(f, f)] * 3 + [(d_in + f if cfg.use_skip else f, f)] + [(f, f)] * 3
    keys = jax.random.split(key, len(widths) + 1)
    layers = []
    for k, (din, dout) in zip(keys[:-1], widths):
        w, b = _linear_init(k, din, dout)
        layers.append({
            "w": w, "b": b,
            "scale": jnp.ones((dout,), jnp.float32),
            "bias": jnp.zeros((dout,), jnp.float32),
        })
    hw, hb = _linear_init(keys[-1], f, 1)
    params = {"layers": layers, "head": {"w": hw, "b": hb}}
    bn_state = {
        "mean": [jnp.zeros((f,), jnp.float32) for _ in widths],
        "var": [jnp.ones((f,), jnp.float32) for _ in widths],
    }
    return params, bn_state


def _dot(x, w, compute_dtype):
    if compute_dtype == "bfloat16":
        return jax.lax.dot(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
    return jax.lax.dot(x, w, preferred_element_type=jnp.float32)


def _dot_exact(x, w):
    """True-f32 matvec for the collapsed path: the (B, 63) @ (63, 1) product
    is ~0.01% of the step's FLOPs, while bf16 operands would quantize the
    raw +-100 m coordinate dims of the embedding at ~0.2% (0.2 m!) and the
    TPU's default f32 matmul is itself a single bf16 pass."""
    return jax.lax.dot(x.astype(jnp.float32), w,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)


def _leaky(x, slope):
    # slope == 1.0 (the reference default) is the identity; skip the select so
    # XLA emits nothing at all for the quirk activations.
    if slope == 1.0:
        return x
    return jnp.where(x >= 0, x, slope * x)


def nof_apply_train(params, bn_state, x, cfg: ModelConfig, *,
                    axis_name: str | None = None,
                    tp_axis: str | None = None):
    """Training-mode forward: BatchNorm uses batch statistics.

    Statistics are computed over the full flattened (rays*samples) batch in
    one pass — the reference computes them per 262144-point chunk
    (``nof/render.py:46-49``); with the shipped configs the coarse pass is a
    single chunk and the fine pass three, so this is a documented, tolerance-
    level deviation (see tests/test_model_parity.py).

    Parallelism (for use under ``shard_map``):
      - ``axis_name``: data-parallel mesh axis; batch statistics are
        pmean-reduced over it (synchronized BatchNorm), keeping the
        multi-chip run statistically identical to single-chip.
      - ``tp_axis``: tensor-parallel mesh axis.  Layers alternate
        Megatron-style column-parallel (weights sharded on the output
        feature dim; activations and BatchNorm parameters feature-sharded,
        no communication) and row-parallel (weights sharded on the input
        dim; one ``psum`` restores the replicated activation before the
        bias/BN).  Four psums across the nine matmuls; the skip concat and
        head run replicated.

    Returns (occupancy (B,), new_bn_state).
    """
    eps, mom = cfg.bn_eps, cfg.bn_momentum
    h = x
    new_mean, new_var = [], []

    def bn_train(i, y):
        m = y.mean(axis=0)
        if axis_name is not None:
            m = jax.lax.pmean(m, axis_name)
        d = y - m
        v = (d * d).mean(axis=0)
        if axis_name is not None:
            v = jax.lax.pmean(v, axis_name)
        if axis_name is not None:
            n = y.shape[0] * jax.lax.psum(1, axis_name)
            unbiased = v * (n / jnp.maximum(n - 1, 1))
        else:
            n = y.shape[0]
            unbiased = v * (n / max(n - 1, 1))
        new_mean.append((1 - mom) * bn_state["mean"][i] + mom * m)
        new_var.append((1 - mom) * bn_state["var"][i] + mom * unbiased)
        inv = jax.lax.rsqrt(v + eps)
        return d * inv * params["layers"][i]["scale"] + params["layers"][i]["bias"]

    def linear(i, y):
        lyr = params["layers"][i]
        out = _dot(y, lyr["w"], cfg.compute_dtype)
        if tp_axis is not None and i % 2 == 1:
            # row-parallel: sum the partial products across feature shards
            out = jax.lax.psum(out, tp_axis)
        return out + lyr["b"]

    for i in range(4):
        h = bn_train(i, linear(i, h))
        h = _leaky(h, cfg.negative_slope)
    # stray activations appended to layer1 during layer2 construction
    for _ in range(4):
        h = _leaky(h, cfg.negative_slope)
    if cfg.use_skip:
        h = jnp.concatenate([x, h], axis=-1)
    for i in range(4, 8):
        h = bn_train(i, linear(i, h))  # no activation: reference layer2 has none
    logits = _dot(h, params["head"]["w"], cfg.compute_dtype) + params["head"]["b"]
    occ = jax.nn.sigmoid(logits)[..., 0]
    return occ, {"mean": new_mean, "var": new_var}


def nof_apply(params, bn_state, x, cfg: ModelConfig):
    """Eval-mode forward: BatchNorm uses running statistics."""
    eps = cfg.bn_eps
    h = x
    for i in range(4):
        lyr = params["layers"][i]
        h = _dot(h, lyr["w"], cfg.compute_dtype) + lyr["b"]
        inv = jax.lax.rsqrt(bn_state["var"][i] + eps)
        h = (h - bn_state["mean"][i]) * inv * lyr["scale"] + lyr["bias"]
        h = _leaky(h, cfg.negative_slope)
    for _ in range(4):
        h = _leaky(h, cfg.negative_slope)
    if cfg.use_skip:
        h = jnp.concatenate([x, h], axis=-1)
    for i in range(4, 8):
        lyr = params["layers"][i]
        h = _dot(h, lyr["w"], cfg.compute_dtype) + lyr["b"]
        inv = jax.lax.rsqrt(bn_state["var"][i] + eps)
        h = (h - bn_state["mean"][i]) * inv * lyr["scale"] + lyr["bias"]
    logits = _dot(h, params["head"]["w"], cfg.compute_dtype) + params["head"]["b"]
    return jax.nn.sigmoid(logits)[..., 0]


# ---------------------------------------------------------------------------
# Affine collapse (the TPU fast path for the reference's identity activations)
# ---------------------------------------------------------------------------
#
# The reference writes ``nn.LeakyReLU(True)`` => slope 1.0 => every activation
# is the identity (models.py:72,92).  With identity activations the whole NOF
# network is, *given the batch statistics*, an affine map of the embedding:
# Linear and BatchNorm are both affine, so their composition collapses to one
# 63->1 linear followed by the sigmoid head.  The batch statistics themselves
# are moments of affine images of the embedding, so they derive exactly from
# the embedding's batch mean mu and covariance Sigma:
#
#   h = x @ A + c        (A, c folded layer by layer)
#   mean(h) = mu @ A + c
#   var(h)_j = a_j^T Sigma a_j
#
# This replaces nine (B, 256)-activation matmuls (B ~ 3M samples/step, the
# HBM-bandwidth wall of the step) with one (B, 63) moment reduction and one
# (B, 63) @ (63, 1) matvec, plus O(63*256) folding arithmetic.  It is a
# mathematical identity — the same function of (params, batch), hence the
# same forward AND the same gradients (up to fp rounding); parity is enforced
# by tests/test_collapse.py.  Disabled automatically when negative_slope != 1
# (a real LeakyReLU breaks affinity).


def collapse_active(cfg: ModelConfig) -> bool:
    if cfg.collapse_affine == "on":
        return True
    return cfg.collapse_affine == "auto" and cfg.negative_slope == 1.0


def _fold_layers(params, bn_apply, d_in: int, use_skip: bool, tp_axis):
    """Fold the 8 (Linear, BN) pairs + head into (w_eff (d_in,1), b_eff (1,)).

    ``bn_apply(i, A, c) -> (A, c)`` applies layer i's BN affine to the current
    map; train and eval modes differ only in where its mean/var come from.
    Mirrors the tensor-parallel structure of ``nof_apply_train``: odd layers
    are row-parallel (psum over ``tp_axis``), even column-parallel.
    """
    A = jnp.eye(d_in, dtype=jnp.float32)
    c = jnp.zeros((d_in,), jnp.float32)
    # true-f32 folds: these (63, 256) @ (256, 256) products are O(4 MFLOP)
    # total, but at TPU-default precision (single bf16 pass) the folded
    # w_eff would carry bf16-level error into every sample
    hi = jax.lax.Precision.HIGHEST

    def linear(i, A, c):
        lyr = params["layers"][i]
        A2 = jnp.matmul(A, lyr["w"], precision=hi)
        c2 = jnp.matmul(c, lyr["w"], precision=hi)
        if tp_axis is not None and i % 2 == 1:
            A2 = jax.lax.psum(A2, tp_axis)
            c2 = jax.lax.psum(c2, tp_axis)
        return A2, c2 + lyr["b"]

    for i in range(4):
        A, c = bn_apply(i, *linear(i, A, c))
    if use_skip:
        A = jnp.concatenate([jnp.eye(d_in, dtype=jnp.float32), A], axis=1)
        c = jnp.concatenate([jnp.zeros((d_in,), jnp.float32), c])
    for i in range(4, 8):
        A, c = bn_apply(i, *linear(i, A, c))
    w_eff = jnp.matmul(A, params["head"]["w"], precision=hi)
    b_eff = jnp.matmul(c, params["head"]["w"], precision=hi) + params["head"]["b"]
    return w_eff, b_eff


def _collapse_from_moments(params, bn_state, mu, sigma, n, cfg: ModelConfig,
                           tp_axis):
    """Derive (w_eff, b_eff, new_bn_state) from embedding batch moments.

    Shared by the XLA and Pallas-fused collapsed train paths: every layer's
    BN mean/var follows exactly from (mu, Sigma) of the embedding (see the
    module note), so the fold is identical regardless of how the moments
    were reduced.
    """
    eps, mom = cfg.bn_eps, cfg.bn_momentum
    bessel = (n / max(n - 1, 1) if isinstance(n, int)
              else n / jnp.maximum(n - 1.0, 1.0))
    new_mean, new_var = [], []

    def bn_apply(i, A, c):
        m = mu @ A + c
        v = jnp.maximum(jnp.sum(A * (sigma @ A), axis=0), 0.0)
        new_mean.append((1 - mom) * bn_state["mean"][i] + mom * m)
        new_var.append((1 - mom) * bn_state["var"][i] + mom * v * bessel)
        g = jax.lax.rsqrt(v + eps) * params["layers"][i]["scale"]
        return A * g[None, :], (c - m) * g + params["layers"][i]["bias"]

    w_eff, b_eff = _fold_layers(params, bn_apply, mu.shape[0],
                                cfg.use_skip, tp_axis)
    return w_eff, b_eff, {"mean": new_mean, "var": new_var}


def nof_apply_train_collapsed(params, bn_state, x, cfg: ModelConfig, *,
                              axis_name: str | None = None,
                              tp_axis: str | None = None):
    """Training-mode forward via affine collapse (identical math to
    ``nof_apply_train`` when ``negative_slope == 1``; see module note above).

    Batch statistics are synchronized over ``axis_name`` exactly as in the
    generic path: the embedding moments are pmean-reduced, and every layer's
    derived mean/var then equals the sync-BN global statistic.
    """
    xf = x.astype(jnp.float32)
    b_local = xf.shape[0]
    mu = xf.mean(axis=0)
    if axis_name is not None:
        mu = jax.lax.pmean(mu, axis_name)
    xc = xf - mu
    # HIGHEST precision: on TPU the default f32 matmul runs single-pass bf16;
    # the position dims of the embedding span +-100 m, so a bf16 covariance
    # would carry ~0.4% error into every derived BN variance.  The (63, 63)
    # moment matmul is a rounding error of the step's cost either way.
    sigma = jax.lax.dot(xc.T, xc, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST) / b_local
    if axis_name is not None:
        sigma = jax.lax.pmean(sigma, axis_name)
        n = b_local * jax.lax.psum(1, axis_name)
    else:
        n = b_local
    w_eff, b_eff, new_bn = _collapse_from_moments(params, bn_state, mu, sigma,
                                                  n, cfg, tp_axis)
    logits = _dot_exact(xf, w_eff) + b_eff
    return jax.nn.sigmoid(logits)[..., 0], new_bn


def fused_embed_active(cfg: ModelConfig) -> bool:
    """Whether the Pallas fused-embedding collapse train path is on.

    "auto" enables it when the collapse is active, bands are logscale
    (the power-of-two recurrence requires 2**k frequencies) and we are on
    real TPU hardware; "on" forces it anywhere (interpret mode off-TPU —
    how the CPU tests and the multichip dryrun exercise it); "off" keeps
    the XLA collapse path (the round-4 default)."""
    if cfg.fused_embed == "off" or not collapse_active(cfg):
        return False
    if not cfg.logscale:
        return False
    if cfg.fused_embed == "on":
        return True
    return jax.default_backend() == "tpu"


def nof_apply_train_collapsed_fused(params, bn_state, flat_points,
                                    cfg: ModelConfig, *,
                                    axis_name: str | None = None,
                                    tp_axis: str | None = None):
    """Collapsed training forward from RAW sample coordinates (N, 3): the
    (N, 63) embedding is never materialized — its moments and the final
    matvec run as Pallas grid passes (``ops/pallas_train.py``); everything
    else (fold, BN derivation, dp/tp collectives) is the exact
    ``nof_apply_train_collapsed`` math on the kernel-reduced moments."""
    from pcnerf_tpu.ops import pallas_train as PT
    x_t, n_valid = PT.pad_points_t(flat_points)
    mu, sigma, n = PT.embed_moments(x_t, cfg.n_freq, n_valid,
                                    axis_name=axis_name)
    w_eff, b_eff, new_bn = _collapse_from_moments(params, bn_state, mu, sigma,
                                                  n, cfg, tp_axis)
    rows = PT._rows(cfg.n_freq)
    d = mu.shape[0]
    w_aug = jnp.zeros((rows, 1), jnp.float32)
    w_aug = w_aug.at[:d, 0].set(w_eff[:, 0]).at[d, 0].set(b_eff[0])
    logits = PT.embed_affine(x_t, w_aug, cfg.n_freq)[0, :n_valid]
    return jax.nn.sigmoid(logits), new_bn


def nof_apply_collapsed_fused(w_eff, b_eff, flat_points, cfg: ModelConfig):
    """Eval/val twin of the fused matvec: sigmoid(E(x) @ w_eff + b_eff)
    without materializing E (same kernel as the train forward)."""
    from pcnerf_tpu.ops import pallas_train as PT
    x_t, n_valid = PT.pad_points_t(flat_points)
    rows = PT._rows(cfg.n_freq)
    d = w_eff.shape[0]
    w_aug = jnp.zeros((rows, 1), jnp.float32)
    w_aug = w_aug.at[:d, 0].set(w_eff[:, 0]).at[d, 0].set(b_eff[0])
    logits = PT.embed_affine(x_t, w_aug, cfg.n_freq)[0, :n_valid]
    return jax.nn.sigmoid(logits)


def collapse_eval_params(params, bn_state, cfg: ModelConfig):
    """Fold eval-mode BN + all Linears into a single (w_eff, b_eff)."""
    eps = cfg.bn_eps

    def bn_apply(i, A, c):
        lyr = params["layers"][i]
        g = jax.lax.rsqrt(bn_state["var"][i] + eps) * lyr["scale"]
        return A * g[None, :], (c - bn_state["mean"][i]) * g + lyr["bias"]

    d_in = params["layers"][0]["w"].shape[0]
    return _fold_layers(params, bn_apply, d_in, cfg.use_skip, None)


def collapse_folded_params(folded, cfg: ModelConfig):
    """Collapse BN-folded eval params (``fold_batchnorm`` output) to
    (w_eff, b_eff) — pure Linear chain, no BN left to apply."""
    d_in = folded["layers"][0]["w"].shape[0]
    return _fold_layers(folded, lambda i, A, c: (A, c), d_in,
                        cfg.use_skip, None)


def nof_apply_collapsed(w_eff, b_eff, x, cfg: ModelConfig):
    """sigmoid(x @ w_eff + b_eff) — the collapsed single-matvec forward."""
    logits = _dot_exact(x, w_eff) + b_eff
    return jax.nn.sigmoid(logits)[..., 0]


def fold_batchnorm(params, bn_state, cfg: ModelConfig):
    """Fold eval-mode BatchNorm into the Linear weights.

    In eval mode BN is affine, so each (Linear, BN) pair collapses to a single
    Linear with W' = W * g, b' = (b - mean) * g + bias where
    g = scale / sqrt(var + eps).  The folded form is what the Pallas fused
    inference kernel consumes: 9 plain matmuls, weights resident in VMEM.
    """
    eps = cfg.bn_eps
    folded = []
    for i, lyr in enumerate(params["layers"]):
        g = lyr["scale"] / jnp.sqrt(bn_state["var"][i] + eps)
        folded.append({
            "w": lyr["w"] * g[None, :],
            "b": (lyr["b"] - bn_state["mean"][i]) * g + lyr["bias"],
        })
    return {"layers": folded, "head": dict(params["head"])}


def nof_apply_folded(folded, x, cfg: ModelConfig):
    """Eval forward on BN-folded params (the XLA twin of the Pallas kernel)."""
    h = x
    for i in range(4):
        lyr = folded["layers"][i]
        h = _leaky(_dot(h, lyr["w"], cfg.compute_dtype) + lyr["b"], cfg.negative_slope)
    for _ in range(4):
        h = _leaky(h, cfg.negative_slope)
    if cfg.use_skip:
        h = jnp.concatenate([x, h], axis=-1)
    for i in range(4, 8):
        lyr = folded["layers"][i]
        h = _dot(h, lyr["w"], cfg.compute_dtype) + lyr["b"]
    logits = _dot(h, folded["head"]["w"], cfg.compute_dtype) + folded["head"]["b"]
    return jax.nn.sigmoid(logits)[..., 0]
