"""Trace-level + knockout attribution of the train step (VERDICT r4 #3).

Round 4 left a contradiction: the jit-PREFIX ablation charged 16.5 ms of the
31 ms batch-1024 step to the pdf+merge sort chain (PERF.md:91) while an
ISOLATED scan-chain measurement of the same op came to ~5 ms — leaving ~11 ms
with no measured owner.  Prefix ablation mis-attributes by construction:
cutting the program at op X moves every fusion boundary near X, so the
difference between consecutive prefixes includes fusion/layout effects, not
just X.  This script replaces it with two methods that don't have that
failure mode:

1. **jax.profiler trace** of the exact bench step (batch 1024), parsed from
   the xplane protobuf into an op-level table whose rows sum to the measured
   device time.  Degrades gracefully where the tunneled backend can't
   profile device execution.
2. **Knockout ablation**: time the FULL step vs the same step with one stage
   REPLACED by a shape-identical no-op (trace-time monkeypatch), keeping the
   rest of the program and its fusion structure intact.  The delta is the
   stage's marginal cost in context:
     - ``nopdf``:   importance sampling replaced by an ascending concat
                    (kills bracketing math AND the final merge sort);
     - ``unisort``: importance samples replaced by uniform z (kills the
                    inverse-CDF bracketing, keeps the (R, N+K) merge sort);
     - ``fwd``:     loss only, no grad / no update;
     - ``grad``:    loss + gradients, no optimizer update (isolates Adam).

Run on the real TPU:  python scripts/trace_step.py [--batch 1024]
"""

import argparse
import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def _timer(fn, *args, steps=20, reps=3):
    """Median of ``reps`` timings of (steps calls + one scalar fetch); the
    fetch is the only reliable barrier on the tunneled backend."""
    import jax
    out = fn(*args)
    sc = jax.tree.leaves(out)[0]
    float(np.asarray(sc).ravel()[0])
    times = []
    for _ in range(reps):
        t0 = time.time()
        o = None
        for _ in range(steps):
            o = fn(*args)
        float(np.asarray(jax.tree.leaves(o)[0]).ravel()[0])
        times.append((time.time() - t0) / steps)
    return sorted(times)[len(times) // 2]


def build_cfg(batch):
    from pcnerf_tpu.config import (LossConfig, ModelConfig, RenderConfig,
                                   TrainConfig)
    return TrainConfig(
        batch_size=batch,
        model=ModelConfig(compute_dtype="bfloat16",
                          fused_embed=os.environ.get("FUSED_EMBED", "off")),
        render=RenderConfig(n_samples=768, n_importance=1536, perturb=1.0,
                            noise_std=0.0),
        loss=LossConfig(sub_nerf_count=15333),
    )


def make_variants(cfg):
    """Jitted step variants.  The pdf knockouts monkeypatch
    ``ops.sampling.sample_pdf_merged_auto`` around jit TRACING (the traced
    program captures whatever the symbol resolved to), then restore it."""
    import jax
    import jax.numpy as jnp
    from pcnerf_tpu.ops import sampling as S
    from pcnerf_tpu.render import render_rays_train
    from pcnerf_tpu.train import system as TS

    def loss_only(params, bn, rays, gt, key):
        # mirrors system.make_train_step.loss_and_metrics (train/system.py)
        out = render_rays_train(params["coarse"], bn["coarse"],
                                params["fine"], bn["fine"], rays, key,
                                cfg.model, cfg.render, cfg.loss)
        lr_, lrf = TS._scene_range_loss(out["depth"], out["depth_fine"], gt,
                                        rays[:, 9], cfg, None)
        L = cfg.loss
        total = (lr_ + lrf
                 + L.lambda_child_free * (out["child_free_loss"]
                                          + out["child_free_loss_fine"])
                 + L.lambda_child_depth * (out["child_depth_loss"]
                                           + out["child_depth_loss_fine"]))
        return total, {"coarse": out["bn_coarse"], "fine": out["bn_fine"]}

    def grad_no_opt(params, bn, rays, gt, key):
        (total, new_bn), grads = jax.value_and_grad(
            loss_only, has_aux=True)(params, bn, rays, gt, key)
        return total, new_bn, grads

    real = S.sample_pdf_merged_auto

    def _nopdf(key, z_vals, bins, weights, n_samples, det, mode="auto"):
        # ascending concat: z already sorted; append K strictly-increasing
        # ticks after far — no bracketing math, no merge sort, same shape
        tail = z_vals[:, -1:] + (1e-3 * jnp.arange(1, n_samples + 1,
                                                   dtype=z_vals.dtype))
        return jnp.concatenate([z_vals, tail], axis=-1)

    def _unisort(key, z_vals, bins, weights, n_samples, det, mode="auto"):
        # uniform importance samples (no inverse-CDF bracketing), but keep
        # the (R, N+K) merge sort the real path pays
        near = z_vals[:, :1]
        far = z_vals[:, -1:]
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=z_vals.dtype)
        zi = near + (far - near) * u[None, :]
        return jnp.sort(jnp.concatenate([z_vals, zi], axis=-1), axis=-1)

    def patched_step(impl):
        S.sample_pdf_merged_auto = impl
        try:
            return TS.make_train_step(cfg, donate=False)
        finally:
            S.sample_pdf_merged_auto = real

    return {
        "full": TS.make_train_step(cfg, donate=False),
        "nopdf": patched_step(_nopdf),
        "unisort": patched_step(_unisort),
        "grad": jax.jit(grad_no_opt),
        "fwd": jax.jit(loss_only),
    }


def try_trace(compiled_step, args, trace_dir, steps=10):
    """Capture a jax.profiler trace of ``steps`` dispatches; return the
    glob of xplane artifacts (may be empty if unsupported)."""
    import jax
    os.makedirs(trace_dir, exist_ok=True)
    try:
        jax.profiler.start_trace(trace_dir)
    except Exception as e:
        print(f"[trace] start_trace failed: {e}", flush=True)
        return []
    try:
        o = None
        for _ in range(steps):
            o = compiled_step(*args)
        float(np.asarray(jax.tree.leaves(o)[0]).ravel()[0])
    finally:
        try:
            jax.profiler.stop_trace()
        except Exception as e:
            print(f"[trace] stop_trace failed: {e}", flush=True)
    return glob.glob(os.path.join(trace_dir, "plugins", "profile", "*",
                                  "*.xplane.pb"))


def parse_xplane(paths, n_steps):
    """Aggregate device-plane event durations by op name."""
    xplane_pb2 = None
    for mod in ("tensorflow.tsl.profiler.protobuf.xplane_pb2",
                "xprof.protobuf.xplane_pb2",
                "tensorboard_plugin_profile.protobuf.xplane_pb2",
                "tensorflow.core.profiler.protobuf.xplane_pb2"):
        try:
            import importlib
            xplane_pb2 = importlib.import_module(mod)
            break
        except Exception:
            continue
    if xplane_pb2 is None:
        print("[trace] no xplane proto module available", flush=True)
        return None

    tables = {}
    for path in paths:
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            md = {m.id: m.name for m in plane.event_metadata.values()}
            agg = {}
            for line in plane.lines:
                for ev in line.events:
                    name = md.get(ev.metadata_id, f"id{ev.metadata_id}")
                    agg[name] = agg.get(name, 0) + ev.duration_ps
            if agg:
                rows = sorted(agg.items(), key=lambda kv: -kv[1])
                tables.setdefault(plane.name, []).extend(rows)
    out = {}
    for plane, rows in tables.items():
        total_ms = sum(ps for _, ps in rows) / 1e12 * 1e3
        out[plane] = {
            "total_ms_per_step": total_ms / n_steps,
            "top": [{"op": n, "ms_per_step": ps / 1e12 * 1e3 / n_steps}
                    for n, ps in rows[:40]],
        }
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--trace-dir",
                   default=os.path.join(REPO, "logs_bg", "trace_r5"))
    a = p.parse_args()

    import jax
    import jax.numpy as jnp
    from pcnerf_tpu.train import init_train_state
    from __graft_entry__ import _synthetic_batch

    cfg = build_cfg(a.batch)
    rays, ranges = _synthetic_batch(a.batch, 1024)
    rays_j, ranges_j = jnp.asarray(rays), jnp.asarray(ranges)
    lr = jnp.float32(5e-4)
    key = jax.random.PRNGKey(0)
    state = init_train_state(key, cfg)

    variants = make_variants(cfg)
    results = {}
    for name, fn in variants.items():
        if name in ("full", "nopdf", "unisort"):
            args = (state, rays_j, ranges_j, key, lr)
            wrapped = lambda fn=fn, args=args: fn(*args)[1]["loss"]
        else:
            args = (state.params, state.bn, rays_j, ranges_j, key)
            wrapped = lambda fn=fn, args=args: fn(*args)[0]
        ms = _timer(lambda w=wrapped: w(), steps=a.steps) * 1e3
        results[name] = ms
        print(f"[knockout] {name:8s} {ms:8.2f} ms", flush=True)

    att = {
        "step_ms": results["full"],
        "pdf_total_ms": results["full"] - results["nopdf"],
        "pdf_merge_sort_ms": results["unisort"] - results["nopdf"],
        "pdf_bracketing_ms": results["full"] - results["unisort"],
        "forward_ms": results["fwd"],
        "backward_ms": results["grad"] - results["fwd"],
        "adam_update_ms": results["full"] - results["grad"],
    }
    print(json.dumps({"knockouts_ms": results, "attribution_ms": att}),
          flush=True)

    # trace the full step
    full = variants["full"]
    args = (state, rays_j, ranges_j, key, lr)
    paths = try_trace(lambda *a_: full(*a_), args, a.trace_dir, steps=10)
    print(f"[trace] xplane artifacts: {paths}", flush=True)
    if paths:
        table = parse_xplane(paths, n_steps=10)
        if table:
            with open(os.path.join(REPO, "logs_bg", "trace_r5_table.json"),
                      "w") as f:
                json.dump(table, f, indent=1)
            for plane, t in table.items():
                print(f"=== plane {plane}: "
                      f"{t['total_ms_per_step']:.2f} ms/step", flush=True)
                for row in t["top"][:25]:
                    print(f"  {row['ms_per_step']:8.3f} ms  {row['op']}",
                          flush=True)


if __name__ == "__main__":
    main()
