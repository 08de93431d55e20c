"""Benchmark: training throughput (rays/s/chip, forward+backward+update) on
the KITTI-00 flagship configuration.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Baseline derivation — two anchors, labeled by kind:

- MEASURED: ``scripts/bench_torch_oracle.py`` runs one full
  reference-semantics training step (chunked MLP, per-ray Python
  gamma-expansion loops, three-level loss, Adam) in PyTorch on this host's
  CPU and writes BASELINE_measured.json; its rays/s appears below as
  ``torch_cpu_measured_rays_per_s`` with ``vs_torch_cpu``.  (torch is
  CPU-only in this image, so this measures the reference's *algorithm*, not
  its GPU.)
- ESTIMATE: the reference trains on an RTX3090-class GPU
  (README.md:155-156).  Its per-step critical path includes per-ray Python
  while-loops and a chunked MLP; per-frame eval wall times implied by
  tool_script/avg_time.py (~72 s/frame at 290k rows) put its end-to-end
  renderer near 1e3 rays/s.  REFERENCE_RAYS_PER_S = 1000 is that estimate;
  ``vs_baseline`` = ours / estimate and is marked
  ``baseline_kind: rtx3090_estimate``.

Method notes:
- timing fetches one scalar after the timed loop: on the tunneled axon
  backend ``block_until_ready`` returns before remote compute finishes, so a
  data dependency is the only reliable barrier (verified empirically: the
  bogus block-based timing reported 530k rays/s vs the true 1.4k).
- batch size is scaled up from the reference's 256 to keep the MXU fed
  (equivalent math; the reference's 256 was a GPU-memory-era choice); the
  per-ray sample counts are the shipped ones.
"""

import json
import time

import numpy as np

import os

REFERENCE_RAYS_PER_S = 1000.0  # documented estimate, see module docstring
BATCH = int(os.environ.get("BENCH_BATCH", "1024"))
STEPS = int(os.environ.get("BENCH_STEPS", "30"))


def main():
    import jax
    import jax.numpy as jnp
    from pcnerf_tpu.config import LossConfig, ModelConfig, RenderConfig, TrainConfig
    from pcnerf_tpu.train import init_train_state, make_train_step
    from __graft_entry__ import _synthetic_batch

    cfg = TrainConfig(
        batch_size=BATCH,
        model=ModelConfig(compute_dtype="bfloat16",
                          fused_embed=os.environ.get("FUSED_EMBED", "auto")),
        render=RenderConfig(n_samples=768, n_importance=1536, perturb=1.0,
                            noise_std=0.0),
        loss=LossConfig(sub_nerf_count=15333),
    )
    rays, ranges = _synthetic_batch(BATCH, 1024)
    rays_j = jnp.asarray(rays)
    ranges_j = jnp.asarray(ranges)
    lr = jnp.float32(5e-4)

    state = init_train_state(jax.random.PRNGKey(0), cfg)
    step = make_train_step(cfg)

    # Separate true XLA compile time from the tunneled backend's one-time
    # device->host stream init: round-2's "compile_s 349 s" was the latter
    # (the queue's own bench the same session compiled in well under 211 s
    # total) — AOT lower+compile measures only the compiler.
    t0 = time.time()
    compiled = step.lower(state, rays_j, ranges_j,
                          jax.random.PRNGKey(0), lr).compile()
    compile_s = time.time() - t0
    t0 = time.time()
    state, m = compiled(state, rays_j, ranges_j, jax.random.PRNGKey(0), lr)
    float(m["loss"])  # pays the one-time transfer/stream init
    first_exec_s = time.time() - t0
    for i in range(3):
        state, m = compiled(state, rays_j, ranges_j, jax.random.PRNGKey(i), lr)
    float(m["loss"])
    step = compiled

    t0 = time.time()
    for i in range(STEPS):
        state, m = step(state, rays_j, ranges_j, jax.random.PRNGKey(i), lr)
    float(m["loss"])  # data dependency = true barrier
    dt = time.time() - t0
    rays_per_s = BATCH * STEPS / dt

    result = {
        "metric": "train_rays_per_s_per_chip",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / REFERENCE_RAYS_PER_S, 2),
        "baseline_kind": "rtx3090_estimate",
        "batch": BATCH,
        "n_samples": cfg.render.n_samples,
        "n_importance": cfg.render.n_importance,
        "dtype": cfg.model.compute_dtype,
        "fused_embed": cfg.model.fused_embed,
        "step_ms": round(dt / STEPS * 1000, 2),
        "compile_s": round(compile_s, 1),
        "first_exec_s": round(first_exec_s, 1),
        "device": str(jax.devices()[0]),
    }
    measured = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BASELINE_measured.json")
    if os.path.exists(measured):
        with open(measured) as f:
            m_cpu = json.load(f)
        result["torch_cpu_measured_rays_per_s"] = m_cpu["rays_per_s"]
        result["vs_torch_cpu"] = round(rays_per_s / m_cpu["rays_per_s"], 1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
