"""fit()'s default multi-device path: the GSPMD dp mesh must reproduce the
single-device run step for step (VERDICT round-1 #3).

Builds a synthetic cached ray buffer, runs ``fit`` twice — ``mesh=None``
(forced single device) and an explicit 8-device dp mesh — and asserts the
logged per-step losses and the final parameters agree.  Works because the
GSPMD step partitions the *global-batch* program (global losses, sync BN)
and threefry is sharding-invariant, so only float reduction order differs.
"""

import dataclasses
import json
import os

import numpy as np
import pytest

import jax

from pcnerf_tpu.config import (DataConfig, LossConfig, ModelConfig,
                               RenderConfig, TrainConfig)
from pcnerf_tpu.data.raybuffer import cache_paths


def _synthetic_buffer(n, n_children, seed):
    rng = np.random.default_rng(seed)
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    r = rng.uniform(10, 40, n).astype(np.float32)
    rays = np.zeros((n, 15), np.float32)
    rays[:, 3:6] = dirs
    rays[:, 6] = 0.0
    rays[:, 7] = 60.0
    rays[:, 8] = 3
    rays[:, 9] = rng.integers(1, n_children + 1, n)
    rays[:, 10] = r - 1.0
    rays[:, 11] = r + 1.0
    rays[:, 12] = r - 0.05
    rays[:, 13] = r + 1.0
    rays[:, 14] = r
    return rays, r


def _cfg(tmp_path) -> TrainConfig:
    data = DataConfig(result_path=str(tmp_path), cloud_size_val=256)
    cfg = TrainConfig(
        batch_size=128, batch_size_val=128, num_epochs=1, log_every=1,
        model=ModelConfig(feature_size=64, n_freq=4),
        render=RenderConfig(n_samples=24, n_importance=48, perturb=1.0),
        loss=LossConfig(sub_nerf_count=16),
        data=data,
    )
    for split, n, seed in (("train", 1024, 0), ("val", 512, 1)):
        rays, ranges = _synthetic_buffer(n, 16, seed)
        rays_p, ranges_p = cache_paths(data, split)
        os.makedirs(os.path.dirname(rays_p), exist_ok=True)
        np.save(rays_p, rays)
        np.save(ranges_p, ranges)
    return cfg


def _losses(out_dir):
    rows = [json.loads(l) for l in open(os.path.join(out_dir, "metrics.jsonl"))]
    return [(r["step"], r["loss"]) for r in rows if "loss" in r]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_fit_mesh_matches_single_device(tmp_path):
    from pcnerf_tpu.parallel import make_mesh
    from pcnerf_tpu.train.loop import fit

    cfg = _cfg(tmp_path)
    s1 = fit(cfg, out_dir=str(tmp_path / "single"), max_steps=6,
             skip_sanity_val=True, mesh=None, verbose=False)
    s8 = fit(cfg, out_dir=str(tmp_path / "mesh8"), max_steps=6,
             skip_sanity_val=True, mesh=make_mesh(8, tp=1), verbose=False)

    l1 = _losses(str(tmp_path / "single"))
    l8 = _losses(str(tmp_path / "mesh8"))
    assert len(l1) == len(l8) == 6
    for (st1, v1), (st8, v8) in zip(l1, l8):
        assert st1 == st8
        np.testing.assert_allclose(v1, v8, rtol=1e-4,
                                   err_msg=f"step {st1}")

    for m in ("coarse", "fine"):
        np.testing.assert_allclose(
            np.asarray(s1.params[m]["layers"][0]["w"]),
            np.asarray(s8.params[m]["layers"][0]["w"]), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(s1.params[m]["head"]["w"]),
            np.asarray(s8.params[m]["head"]["w"]), atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_fit_auto_mesh_runs_validation(tmp_path):
    """mesh='auto' on 8 visible devices picks the dp mesh and the whole loop
    (sanity val + CD/F + checkpoints) still works."""
    from pcnerf_tpu.train.loop import fit

    cfg = _cfg(tmp_path)
    state = fit(cfg, out_dir=str(tmp_path / "auto"), max_steps=3,
                verbose=False)
    assert int(state.step) == 3
    rows = [json.loads(l)
            for l in open(os.path.join(tmp_path / "auto", "metrics.jsonl"))]
    val_rows = [r for r in rows if "val/cd" in r]
    assert val_rows and np.isfinite(val_rows[0]["val/cd"])
    assert os.path.exists(os.path.join(tmp_path / "auto", "checkpoints",
                                       "last"))
