"""Verify driver: the three flows from .claude/skills/verify/SKILL.md.

1. TPU train smoke: synthetic 15-col batch -> init_train_state ->
   make_train_step -> loss decreases over ~30 steps (data-fetch barriers).
2. Ray-buffer compiler against real reference data: buffer stats match
   cached shapes.
3. Eval two-step inference on a real checkpoint -> writes a PCD readable
   by pcnerf_tpu.data.read_pcd.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/verify_drive.py [--flows 123]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def flow1_train_smoke():
    import jax
    import jax.numpy as jnp
    from pcnerf_tpu.presets import PRESETS
    from pcnerf_tpu.train import init_train_state, make_train_step
    from __graft_entry__ import _synthetic_batch

    cfg = PRESETS["maicity00_pcnerf"](compute_dtype="bfloat16")
    import dataclasses
    cfg = dataclasses.replace(cfg, batch_size=1024)   # bench shape: warm cache
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    rays, r = _synthetic_batch(cfg.batch_size, 64)
    step = make_train_step(cfg)
    rays_j, gt_j = jnp.asarray(rays), jnp.asarray(r)
    lr = jnp.float32(5e-4)
    t0 = time.time()
    losses = []
    for i in range(30):
        key = jax.random.fold_in(jax.random.PRNGKey(7), i)
        state, m = step(state, rays_j, gt_j, key, lr)
        if i in (0, 9, 19, 29):
            losses.append(float(m["loss"]))   # data fetch = real barrier
    print(json.dumps({"flow": 1, "losses": losses,
                      "seconds": round(time.time() - t0, 1),
                      "device": str(jax.devices()[0])}), flush=True)
    assert losses[-1] < losses[0], losses
    print("[flow1] PASS: loss decreases on TPU", flush=True)


def flow2_raybuffer():
    from pcnerf_tpu.presets import maicity00_data
    from pcnerf_tpu.data.raybuffer import load_or_build

    data = maicity00_data("20")
    rays, ranges = load_or_build(data, "train")
    print(json.dumps({"flow": 2, "train_rays": list(rays.shape),
                      "ranges": list(ranges.shape)}), flush=True)
    assert rays.ndim == 2 and rays.shape[1] == 15
    assert ranges.shape[0] == rays.shape[0]
    # spot semantics: col 13 holds the child far (reference quirk)
    assert np.allclose(rays[:, 13], rays[:, 11]), "col-13 child-far quirk"
    print("[flow2] PASS: ray buffer compiled from real reference data",
          flush=True)


def flow3_eval_pcd():
    import dataclasses
    from pcnerf_tpu.presets import maicity00_eval
    from pcnerf_tpu.eval.run import evaluate
    from pcnerf_tpu.data.pcd_io import read_pcd

    cfg = maicity00_eval(method=2)
    ckpt = "logs/maicity00/maicity_00_1/pcnerf/checkpoints/best"
    assert os.path.exists(ckpt), f"checkpoint missing: {ckpt}"
    # single frame: restrict the split window to one test frame (frame 3)
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, data_start=0, data_end=5))
    out_prefix = "logs_bg/verify_drive_"
    times = evaluate(cfg, ckpt, out_prefix, create_test_data=False)
    pcd_path = "logs_bg/verify_drive_3_two_step.pcd"
    pts = read_pcd(pcd_path)
    print(json.dumps({"flow": 3, "frames": times, "points": int(pts.shape[0]),
                      "pcd": pcd_path}), flush=True)
    assert pts.shape[0] > 10_000 and pts.shape[1] == 3
    print("[flow3] PASS: two-step eval wrote a readable PCD", flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--flows", default="123")
    a = p.parse_args()
    if "2" in a.flows:
        flow2_raybuffer()
    if "1" in a.flows:
        flow1_train_smoke()
    if "3" in a.flows:
        flow3_eval_pcd()
    print("[verify_drive] ALL REQUESTED FLOWS PASS", flush=True)
