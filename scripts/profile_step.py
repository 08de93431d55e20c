"""Component-level breakdown of the training step on real TPU + variant
benchmarks (VERDICT round-1 #6/#9).  Produces PERF.md.

Timing method: every measurement ends with a scalar data fetch — on the
tunneled axon backend ``block_until_ready`` returns before remote compute
finishes, so a data dependency is the only reliable barrier
(utils/profiling.py).  Components are measured by incremental ablation:
jit a prefix of the step's pipeline, time it, subtract the previous prefix.

    python scripts/profile_step.py [--batch 1024] [--steps 20]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def _timer(fn, *args, steps=20):
    """Median-of-3 of (steps calls + one scalar fetch)."""
    import jax
    out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])  # warm fetch path
    best = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(steps):
            out = fn(*args)
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        best.append((time.time() - t0) / steps)
    return sorted(best)[1]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--steps", type=int, default=20)
    # NOT PERF.md: that file carries curated sections; the table is merged
    # into it by hand after review
    p.add_argument("--out", default=os.path.join(REPO, "PERF_PROFILE.md"))
    a = p.parse_args()

    import jax
    import jax.numpy as jnp
    from pcnerf_tpu.config import (LossConfig, ModelConfig, RenderConfig,
                                   TrainConfig)
    from pcnerf_tpu.ops import compositing as C
    from pcnerf_tpu.ops import sampling as S
    from pcnerf_tpu.render import decode_rays, _composite_train
    from pcnerf_tpu.train import init_train_state, make_train_step
    from __graft_entry__ import _synthetic_batch

    B = a.batch

    def mk(**kw):
        m = dict(compute_dtype="bfloat16")
        m.update(kw.pop("model", {}))
        return TrainConfig(
            batch_size=B,
            model=ModelConfig(**m),
            render=RenderConfig(n_samples=768, n_importance=1536, perturb=1.0),
            loss=LossConfig(sub_nerf_count=15333), **kw)
    cfg = mk()
    rays_np, ranges_np = _synthetic_batch(B, 1024)
    rays = jnp.asarray(rays_np)
    gt = jnp.asarray(ranges_np)
    key = jax.random.PRNGKey(0)
    lr = jnp.float32(5e-4)
    rcfg, mcfg, lcfg = cfg.render, cfg.model, cfg.loss
    rb = decode_rays(rays)

    rows = []

    def add(name, ms, note=""):
        rows.append((name, ms, note))
        print(f"{name:42s} {ms*1000:8.2f} ms  {note}", flush=True)

    # ---- pipeline prefixes (coarse stage) ---------------------------------
    @jax.jit
    def p_sample(key):
        z = S.segmented_z(rb.near, rb.far, rb.near_child, rb.far_child,
                          rcfg.n_samples, rcfg.child_ratio)
        return S.perturb_z(jax.random.fold_in(key, 0), z, rcfg.perturb)

    t_sample = _timer(p_sample, key, steps=a.steps)
    add("coarse sampling (segmented_z + perturb)", t_sample)

    state = init_train_state(jax.random.PRNGKey(0), cfg)

    @jax.jit
    def p_coarse(params, bn, key):
        z = p_sample.__wrapped__(key)
        out = _composite_train(params["coarse"], bn["coarse"], rb, z,
                               jax.random.fold_in(key, 1), mcfg, rcfg, lcfg,
                               train_bn=True)
        return out["depth"], out["weights"], z

    t_coarse = _timer(p_coarse, state.params, state.bn, key, steps=a.steps)
    add("+ coarse MLP/moments + composite + child", t_coarse - t_sample)

    @jax.jit
    def p_pdf(params, bn, key):
        d, w, z = p_coarse.__wrapped__(params, bn, key)
        mids = 0.5 * (z[..., 1:] + z[..., :-1])
        return S.sample_pdf_merged(jax.random.fold_in(key, 2), z, mids,
                                   jax.lax.stop_gradient(w[..., 1:-1]),
                                   rcfg.n_importance, det=False)

    t_pdf = _timer(p_pdf, state.params, state.bn, key, steps=a.steps)
    add("+ fused sample_pdf+merge (inverse-CDF sorts)", t_pdf - t_coarse)

    @jax.jit
    def p_fine(params, bn, key):
        z_fine = p_pdf.__wrapped__(params, bn, key)
        out = _composite_train(params["fine"], bn["fine"], rb, z_fine,
                               jax.random.fold_in(key, 3), mcfg, rcfg, lcfg,
                               train_bn=True)
        return out["depth"]

    t_fine = _timer(p_fine, state.params, state.bn, key, steps=a.steps)
    add("+ fine MLP/moments + composite + child", t_fine - t_pdf)

    # ---- full steps -------------------------------------------------------
    # slope-0.01 without remat at batch 1024 exceeds v5e HBM at compile time
    # (15.88G static plan) — it runs at the reference's protocol batch 256
    variants = [
        ("full train step (collapse, bf16)", mk(), B, "the shipped quirk config"),
        ("full train step (collapse, f32)",
         mk(model={"compute_dtype": "float32"}), B, ""),
        ("full train step (slope 0.01, bf16, batch 256)",
         mk(model={"negative_slope": 0.01}), 256,
         "presumably-intended network; 9-matmul XLA path"),
        ("full train step (slope 0.01 + remat, bf16)",
         mk(model={"negative_slope": 0.01, "remat_mlp": True}), B,
         "jax.checkpoint over the MLP"),
    ]
    full = {}
    for name, vcfg, bsz, note in variants:
        import dataclasses as _dc
        vcfg = _dc.replace(vcfg, batch_size=bsz)
        vrays, vgt = (rays, gt) if bsz == B else map(
            jnp.asarray, _synthetic_batch(bsz, 1024))
        st = init_train_state(jax.random.PRNGKey(0), vcfg)
        step = make_train_step(vcfg, donate=False)

        def run(s=st, stp=step, r=vrays, g=vgt):
            _, m = stp(s, r, g, key, lr)
            return m["loss"]

        t = _timer(lambda: run(), steps=max(5, a.steps // 2))
        full[name] = (t, bsz)
        add(name, t, note + f" ({bsz / t:.0f} rays/s)")

    fwd_total = t_fine
    step_t = full["full train step (collapse, bf16)"][0]
    with open(a.out, "w") as f:
        f.write("# PERF — train-step component breakdown (real TPU)\n\n")
        f.write(f"Config: batch {B}, 768+1536 samples, bf16 matmuls, "
                f"sub_nerf_count 15333, divide=off. Timing barrier: scalar "
                f"fetch (see utils/profiling.py). Median of 3 x "
                f"{a.steps}-step loops.\n\n")
        f.write("| component (incremental) | ms | % of full step | note |\n")
        f.write("|---|---|---|---|\n")
        prev = 0.0
        for name, ms, note in rows:
            pct = f"{100*ms/step_t:.0f}%" if not name.startswith("full") else "—"
            f.write(f"| {name} | {ms*1000:.2f} | {pct} | {note} |\n")
        f.write(f"\nForward pipeline total {fwd_total*1000:.1f} ms; full "
                f"fwd+bwd+Adam step {step_t*1000:.1f} ms "
                f"({B/step_t:.0f} rays/s).\n\n")
        slope_t, slope_b = full["full train step (slope 0.01, bf16, batch 256)"]
        f.write(f"slope-0.01 step (batch {slope_b}): {slope_t*1000:.1f} ms "
                f"({slope_b/slope_t:.0f} rays/s) vs the collapsed step's "
                f"{B/step_t:.0f} rays/s (VERDICT #9 target: within 2x).\n")
        f.write(f"\nDevice: {jax.devices()[0]}\n")
    print(json.dumps({k: {"ms": round(t * 1000, 2), "batch": b,
                          "rays_per_s": round(b / t, 1)}
                      for k, (t, b) in full.items()}))


if __name__ == "__main__":
    main()
