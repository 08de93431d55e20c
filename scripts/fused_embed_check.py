"""Hardware validation of the Pallas fused-embedding train kernels
(``ops/pallas_train.py``): compile on the real TPU (Mosaic, not interpret)
and compare against the XLA collapse path + a float64 host reference.

Correctness-only — step timing A/B runs through ``FUSED_EMBED={auto,off}
python bench.py`` on a quiet chip.  Prints one JSON line per check.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from pcnerf_tpu.config import ModelConfig
    from pcnerf_tpu import models as M
    from pcnerf_tpu.models.embedding import embed_positions, freq_bands
    from pcnerf_tpu.ops import pallas_train as PT

    dev = str(jax.devices()[0])
    rng = np.random.default_rng(0)
    n = 131072
    x = rng.uniform(-120, 120, size=(n, 3)).astype(np.float32)

    # f64 host reference embedding
    xf = x.astype(np.float64)
    bands = freq_bands(10).astype(np.float64)
    scaled = xf[:, None, :] * bands[:, None]
    sc = np.concatenate([np.sin(scaled)[:, :, None, :],
                         np.cos(scaled)[:, :, None, :]], axis=2)
    emb64 = np.concatenate([xf, sc.reshape(n, -1)], axis=1)

    x_t, n_valid = PT.pad_points_t(jnp.asarray(x))
    w = (rng.normal(size=(63, 1)) * 0.1).astype(np.float32)
    b = np.float32(0.37)
    rows = PT._rows(10)
    w_aug = jnp.zeros((rows, 1), jnp.float32)
    w_aug = w_aug.at[:63, 0].set(jnp.asarray(w)[:, 0]).at[63, 0].set(b)

    # --- affine matvec ---
    t0 = time.time()
    logits = np.asarray(jax.jit(PT.embed_affine, static_argnums=2)(
        x_t, w_aug, 10)[0, :n_valid])
    t_affine = time.time() - t0
    ref = emb64 @ w.astype(np.float64)[:, 0] + float(b)
    xla = np.asarray(jax.jit(
        lambda xx: embed_positions(xx, 10).astype(jnp.float32) @ jnp.asarray(w)
    )(jnp.asarray(x)))[:, 0] + float(b)
    print(json.dumps({
        "check": "embed_affine", "device": dev,
        "max_abs_err_vs_f64": float(np.abs(logits - ref).max()),
        "xla_f32_err_vs_f64": float(np.abs(xla - ref).max()),
        "compile_plus_run_s": round(t_affine, 1)}))

    # --- moments ---
    t0 = time.time()
    mu, sigma, cnt = jax.jit(PT.embed_moments, static_argnums=(1, 2))(
        x_t, 10, n_valid)
    mu, sigma = np.asarray(mu), np.asarray(sigma)
    t_mom = time.time() - t0
    mu_ref = emb64.mean(axis=0)
    xc = emb64 - mu_ref
    sig_ref = (xc.T @ xc) / n
    print(json.dumps({
        "check": "embed_moments",
        "count_ok": bool(float(cnt) == n),
        "mu_max_abs_err": float(np.abs(mu - mu_ref).max()),
        "sigma_max_abs_err": float(np.abs(sigma - sig_ref).max()),
        "sigma_max_rel_err_diag": float(np.abs(
            (np.diag(sigma) - np.diag(sig_ref)) / np.diag(sig_ref)).max()),
        "compile_plus_run_s": round(t_mom, 1)}))

    # --- full fused collapsed apply + grads vs XLA path ---
    cfg_on = ModelConfig(fused_embed="on")
    cfg_off = ModelConfig(fused_embed="off")
    params, bn = M.init_nof(jax.random.PRNGKey(0), cfg_on)
    emb = embed_positions(jnp.asarray(x), 10)

    def loss_fused(p):
        occ, nb = M.nof_apply_train_collapsed_fused(p, bn, jnp.asarray(x), cfg_on)
        return jnp.mean((occ - 0.3) ** 2), (occ, nb)

    def loss_xla(p):
        occ, nb = M.nof_apply_train_collapsed(p, bn, emb, cfg_off)
        return jnp.mean((occ - 0.3) ** 2), (occ, nb)

    t0 = time.time()
    (lf, (of_, bnf)), gf = jax.jit(jax.value_and_grad(loss_fused, has_aux=True))(params)
    of_ = np.asarray(of_)
    t_fused = time.time() - t0
    (lx, (ox, bnx)), gx = jax.jit(jax.value_and_grad(loss_xla, has_aux=True))(params)
    ox = np.asarray(ox)
    gerr = 0.0
    for i in range(8):
        for k in ("w", "b", "scale", "bias"):
            a = np.asarray(gf["layers"][i][k]); bb = np.asarray(gx["layers"][i][k])
            gerr = max(gerr, float(np.abs(a - bb).max() / max(np.abs(bb).max(), 1e-12)))
    print(json.dumps({
        "check": "fused_collapsed_apply",
        "loss_fused": float(lf), "loss_xla": float(lx),
        "occ_max_abs_diff": float(np.abs(of_ - ox).max()),
        "grad_max_rel_diff": gerr,
        "bn_var_max_rel_diff": float(max(
            np.abs((np.asarray(bnf["var"][i]) - np.asarray(bnx["var"][i]))
                   / np.asarray(bnx["var"][i])).max() for i in range(8))),
        "compile_plus_run_s": round(t_fused, 1)}))


if __name__ == "__main__":
    main()
