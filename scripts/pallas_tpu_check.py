"""Run the fused Pallas eval kernel COMPILED on the real TPU (VERDICT r2 #5:
no interpret-only claims): parity vs the XLA folded-apply at eval shapes on
a slope!=1 (non-collapsible) network, plus wall timings for both paths and
the remat train-step variant.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/pallas_tpu_check.py
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def timed(fn, *args, steps=10):
    import jax
    out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])  # compile + stream
    best = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(steps):
            out = fn(*args)
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        best.append((time.time() - t0) / steps)
    return sorted(best)[1], out


def main():
    import jax
    import jax.numpy as jnp
    from pcnerf_tpu.config import ModelConfig
    from pcnerf_tpu.models import (embed_positions, fold_batchnorm, init_nof,
                                   nof_apply_folded)
    import pcnerf_tpu.ops.pallas_kernels as K

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    cfg = ModelConfig(negative_slope=0.01, compute_dtype="bfloat16")
    params, bn = init_nof(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    bn = {"mean": [jnp.asarray(rng.normal(0, 0.3, m.shape).astype(np.float32))
                   for m in bn["mean"]],
          "var": [jnp.asarray(rng.uniform(0.5, 2.0, v.shape).astype(np.float32))
                  for v in bn["var"]]}
    folded = fold_batchnorm(params, bn, cfg)
    padded = K.pad_folded_params(folded, cfg)

    # eval-class shape: one GroupBatcher macro-batch worth of rows
    R, S = 4096, 3 * K.CHUNK_S            # 4096 rows x 1536 samples
    origins = jnp.asarray(rng.normal(0, 1, (R, 3)).astype(np.float32))
    d = rng.normal(size=(R, 3))
    d = jnp.asarray((d / np.linalg.norm(d, axis=-1, keepdims=True)
                     ).astype(np.float32))
    z = jnp.asarray(np.sort(rng.uniform(1, 40, (R, S)).astype(np.float32), -1))

    t_pallas, occ_k = timed(
        lambda: K.fused_occupancy(padded, origins, d, z, cfg))

    @jax.jit
    def xla_path():
        pts = origins[:, None, :] + d[:, None, :] * z[..., None]
        emb = embed_positions(pts.reshape(-1, 3), cfg.n_freq)
        return nof_apply_folded(folded, emb, cfg).reshape(R, S)

    t_xla, occ_x = timed(xla_path)

    # Accuracy is judged against a float64 host reference, NOT by bit-parity
    # with the XLA bf16 path: Mosaic's sin/cos use a different argument
    # reduction than XLA's, and at |arg| up to 2^9 * 40 m a last-ulp f32
    # argument difference already moves sin by ~1e-3 — two equally-valid
    # roundings of the same math.  The kernel must be AS ACCURATE as the
    # sanctioned XLA bf16 path against the f64 truth (subsampled rows).
    sub = slice(0, 256)
    pts64 = (np.asarray(origins)[sub, None, :].astype(np.float64)
             + np.asarray(d)[sub, None, :].astype(np.float64)
             * np.asarray(z)[sub, :, None].astype(np.float64))
    bands64 = np.asarray(K.freq_bands(cfg.n_freq, cfg.logscale),
                         np.float64)
    flat = pts64.reshape(-1, 3)
    sc = flat[:, None, :] * bands64[:, None]
    emb64 = np.concatenate(
        [flat] + [t for k in range(cfg.n_freq)
                  for t in (np.sin(sc[:, k]), np.cos(sc[:, k]))], axis=-1)
    h64 = emb64
    F = [{k: np.asarray(v, np.float64) for k, v in l.items()}
         for l in folded["layers"]]

    def lk(x):
        return np.where(x >= 0, x, cfg.negative_slope * x)
    for i in range(4):
        h64 = lk(h64 @ F[i]["w"] + F[i]["b"])
    for _ in range(4):
        h64 = lk(h64)
    h64 = np.concatenate([emb64, h64], axis=-1)
    for i in range(4, 8):
        h64 = h64 @ F[i]["w"] + F[i]["b"]
    logit64 = h64 @ np.asarray(folded["head"]["w"], np.float64) \
        + np.asarray(folded["head"]["b"], np.float64)
    occ64 = (1.0 / (1.0 + np.exp(-logit64)))[:, 0].reshape(256, S)

    err_pallas = float(np.max(np.abs(np.asarray(occ_k)[sub] - occ64)))
    err_xla = float(np.max(np.abs(np.asarray(occ_x)[sub] - occ64)))
    diff = float(jnp.max(jnp.abs(occ_k - occ_x)))
    pts = R * S
    print(json.dumps({
        "what": "fused pallas eval kernel vs XLA folded-apply, slope=0.01, "
                "compiled on real TPU",
        "rows": R, "samples": S, "points": pts,
        "pallas_ms": round(t_pallas * 1e3, 2),
        "xla_ms": round(t_xla * 1e3, 2),
        "pallas_gpts_per_s": round(pts / t_pallas / 1e9, 2),
        "xla_gpts_per_s": round(pts / t_xla / 1e9, 2),
        "max_abs_diff_vs_xla_bf16": diff,
        "max_err_vs_f64_pallas": err_pallas,
        "max_err_vs_f64_xla_bf16": err_xla,
        "device": str(dev),
    }), flush=True)
    # as accurate as the XLA bf16 path (both are bf16-matmul approximations
    # of the same function; 4x headroom covers rounding-direction variance),
    # AND under absolute ceilings so a regression degrading BOTH paths (e.g.
    # in the shared folding code) cannot loosen the gate (advisor r3, low)
    assert err_pallas < max(4.0 * err_xla, 1e-3), (err_pallas, err_xla)
    assert err_pallas < 5e-3 and err_xla < 2e-3, (err_pallas, err_xla)

    # fused compositing epilogue (round 4): same kernel with the
    # transmittance cumprod fused in (log-space MXU prefix product +
    # cross-chunk carry) — the slope!=1 eval path's remaining fusion scope
    from pcnerf_tpu.ops.compositing import occupancy_to_weights
    t_pw, w_k = timed(
        lambda: K.fused_occupancy(padded, origins, d, z, cfg,
                                  fuse_weights=True))
    t_xw, w_x = timed(jax.jit(
        lambda: occupancy_to_weights(xla_path())))
    err_w = float(jnp.max(jnp.abs(w_k - occupancy_to_weights(occ_k))))
    print(json.dumps({
        "what": "fused occupancy+compositing weights kernel",
        "pallas_weights_ms": round(t_pw * 1e3, 2),
        "xla_occ_plus_weights_ms": round(t_xw * 1e3, 2),
        "max_abs_err_w_vs_own_occ_composited": err_w,
    }), flush=True)
    # the cumprod runs in log space: tolerance is numerical, not bitwise
    assert err_w < 1e-4, err_w

    # remat train-step variant at slope=0.01 (the non-collapsible network)
    from pcnerf_tpu.config import (LossConfig, RenderConfig, TrainConfig)
    from pcnerf_tpu.train import init_train_state, make_train_step
    from __graft_entry__ import _synthetic_batch
    lr = jnp.float32(5e-4)
    # non-remat at batch 1024 does NOT FIT on a single v5e (XLA's static plan:
    # 15.88G of 15.75G hbm — the 9 full-batch (rays*samples, 256) activation
    # saves); that infeasibility is itself the remat argument.  The non-remat
    # row runs at the reference's protocol batch 256, remat at 1024.
    for remat, bsz in ((False, 256), (True, 1024)):
        rays, ranges = _synthetic_batch(bsz, 1024)
        rays_j, ranges_j = jnp.asarray(rays), jnp.asarray(ranges)
        tcfg = TrainConfig(
            batch_size=bsz,
            model=ModelConfig(negative_slope=0.01, compute_dtype="bfloat16",
                              remat_mlp=remat),
            render=RenderConfig(n_samples=768, n_importance=1536,
                                perturb=1.0, noise_std=0.0),
            loss=LossConfig(sub_nerf_count=15333))
        state = init_train_state(jax.random.PRNGKey(0), tcfg)
        step = make_train_step(tcfg, donate=False)  # timed loop reuses state
        t, _ = timed(lambda s=state: step(s, rays_j, ranges_j,
                                          jax.random.PRNGKey(1), lr), steps=10)
        print(json.dumps({
            "what": f"train step slope=0.01 remat_mlp={remat}",
            "batch": bsz, "step_ms": round(t * 1e3, 2),
            "rays_per_s": round(bsz / t, 1)}), flush=True)


if __name__ == "__main__":
    main()
