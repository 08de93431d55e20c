"""Multi-step lax.scan trainer == per-step trainer, bit-for-bit math.

The scan chunk (train/system.py:make_train_scan) exists to amortize host
dispatch latency (one dispatch per K steps); its RNG (fold_in(key, step))
and carried state chain must reproduce the per-step path exactly.
"""

import dataclasses
import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from tests.test_fit_mesh import _cfg, _synthetic_buffer


def test_scan_matches_per_step(tmp_path):
    from pcnerf_tpu.train.system import (init_train_state, make_train_scan,
                                         make_train_step)
    cfg = _cfg(tmp_path)
    rays, ranges = _synthetic_buffer(128 * 6, 16, 7)
    rays_k = rays.reshape(6, 128, 15)
    gt_k = ranges.reshape(6, 128)
    key = jax.random.PRNGKey(3)
    lr = jnp.float32(5e-4)

    step_fn = make_train_step(cfg, donate=False)
    st_a = init_train_state(jax.random.PRNGKey(0), cfg)
    losses_a = []
    for i in range(6):
        st_a, m = step_fn(st_a, jnp.asarray(rays_k[i]), jnp.asarray(gt_k[i]),
                          jax.random.fold_in(key, 10 + i), lr)
        losses_a.append(float(m["loss"]))

    scan_fn = make_train_scan(cfg, donate=False)
    st_b = init_train_state(jax.random.PRNGKey(0), cfg)
    st_b, ms = scan_fn(st_b, jnp.asarray(rays_k), jnp.asarray(gt_k), key, lr,
                       jnp.int32(10))
    losses_b = [float(v) for v in np.asarray(ms["loss"])]

    np.testing.assert_allclose(losses_a, losses_b, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(st_a.params["fine"]["head"]["w"]),
        np.asarray(st_b.params["fine"]["head"]["w"]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(st_a.bn["coarse"]["mean"][0]),
        np.asarray(st_b.bn["coarse"]["mean"][0]), atol=1e-6)
    assert int(st_b.step) == 6


def _losses(out_dir):
    rows = [json.loads(l) for l in open(os.path.join(out_dir, "metrics.jsonl"))]
    return [(r["step"], r["loss"]) for r in rows if "loss" in r]


def test_fit_scan_matches_fit_per_step(tmp_path):
    """fit() with scan chunks (incl. the epoch tail falling back to single
    steps) logs the same per-step loss sequence as scan-disabled fit."""
    from pcnerf_tpu.train.loop import fit

    base = _cfg(tmp_path)   # n_batches = 1024/128 = 8
    cfg_scan = dataclasses.replace(base, scan_steps=3, log_every=2)
    cfg_step = dataclasses.replace(base, scan_steps=0, log_every=2)

    s_scan = fit(cfg_scan, out_dir=str(tmp_path / "scan"),
                 skip_sanity_val=True, mesh=None, verbose=False)
    s_step = fit(cfg_step, out_dir=str(tmp_path / "step"),
                 skip_sanity_val=True, mesh=None, verbose=False)

    l_scan = _losses(str(tmp_path / "scan"))
    l_step = _losses(str(tmp_path / "step"))
    assert [s for s, _ in l_scan] == [s for s, _ in l_step] == list(range(8))
    np.testing.assert_allclose([v for _, v in l_scan],
                               [v for _, v in l_step], rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s_scan.params["coarse"]["layers"][0]["w"]),
        np.asarray(s_step.params["coarse"]["layers"][0]["w"]), atol=1e-6)
