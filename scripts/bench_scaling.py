"""Scaling-efficiency benchmark: sharded train step at 1..N devices.

North-star target (SURVEY.md section 6 / BASELINE.json): >= 85% scaling
efficiency going 1 chip -> 1 host -> N hosts.  This harness measures
weak-scaling throughput of the (dp, tp) sharded train step — per-device
batch held constant, global batch grows with dp — and reports
rays/s and efficiency vs. the 1-device run.

On real multi-chip hardware run it as-is (the mesh picks up all local
devices; multi-host via ``pcnerf_tpu.parallel.init_distributed``).  Without
multi-chip hardware, ``--virtual N`` validates the same program on an
N-device virtual CPU mesh (functional scaling; the timing then measures the
host, not ICI, and is labeled as such).

    python scripts/bench_scaling.py --virtual 8 --devices 1 2 4 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--virtual", type=int, default=0,
                   help="force an N-device virtual CPU mesh (no TPU needed)")
    p.add_argument("--per-device-batch", type=int, default=128)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--n-samples", type=int, default=96)
    p.add_argument("--n-importance", type=int, default=192)
    p.add_argument("--steps", type=int, default=10)
    a = p.parse_args()

    if a.virtual:
        import re
        flags = os.environ.get("XLA_FLAGS", "")
        m = re.search(r"xla_force_host_platform_device_count=(\d+)", flags)
        if m and int(m.group(1)) < a.virtual:
            # bump an existing smaller count (same logic as __graft_entry__)
            flags = re.sub(r"--?xla_force_host_platform_device_count=\d+",
                           f"--xla_force_host_platform_device_count={a.virtual}",
                           flags)
            os.environ["XLA_FLAGS"] = flags
        elif not m:
            os.environ["XLA_FLAGS"] = (
                flags +
                f" --xla_force_host_platform_device_count={a.virtual}").strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import jax.numpy as jnp
    from pcnerf_tpu.config import LossConfig, ModelConfig, RenderConfig, TrainConfig
    from pcnerf_tpu.parallel import (
        make_mesh,
        make_sharded_train_step,
        shard_train_state,
    )
    from pcnerf_tpu.train import init_train_state
    from __graft_entry__ import _synthetic_batch

    results = []
    base_rate = None
    # efficiency is defined vs the 1-DEVICE run; synthesize it if --devices
    # omits 1 so the first measured point is not trivially efficiency 1.0
    devices = sorted(set(a.devices))
    if devices and devices[0] != 1:
        print("# --devices omits 1; adding the 1-device baseline run")
        devices = [1] + devices
    for n in devices:
        if n * a.tp > len(jax.devices()):
            print(f"# skipping n={n}: only {len(jax.devices())} devices")
            continue
        dp = n
        cfg = TrainConfig(
            batch_size=a.per_device_batch * dp,
            model=ModelConfig(compute_dtype="bfloat16"),
            render=RenderConfig(n_samples=a.n_samples,
                                n_importance=a.n_importance, perturb=1.0),
            loss=LossConfig(sub_nerf_count=1024),
        )
        mesh = make_mesh(dp * a.tp, tp=a.tp)
        rays, ranges = _synthetic_batch(cfg.batch_size, 1024)
        state = shard_train_state(init_train_state(jax.random.PRNGKey(0), cfg),
                                  mesh)
        step = make_sharded_train_step(cfg, mesh)
        rays_j, ranges_j = jnp.asarray(rays), jnp.asarray(ranges)
        lr = jnp.float32(5e-4)
        state, m = step(state, rays_j, ranges_j, jax.random.PRNGKey(0), lr)
        float(m["loss"])  # compile + barrier
        t0 = time.time()
        for i in range(a.steps):
            state, m = step(state, rays_j, ranges_j, jax.random.PRNGKey(i), lr)
        float(m["loss"])  # data-dependency barrier (see utils/profiling.py)
        dt = time.time() - t0
        rate = cfg.batch_size * a.steps / dt
        if base_rate is None:
            base_rate = rate / dp
            base_dp = dp
        eff = rate / (base_rate * dp)
        results.append({"devices": dp, "tp": a.tp,
                        "global_batch": cfg.batch_size,
                        "rays_per_s": round(rate, 1),
                        "scaling_efficiency": round(eff, 3),
                        "efficiency_vs": f"{base_dp}-device run"})
        print(json.dumps(results[-1]), flush=True)
    print(json.dumps({"platform": str(jax.devices()[0].platform),
                      "virtual": bool(a.virtual), "results": results}))


if __name__ == "__main__":
    main()
