"""fit() integration: data load -> sanity val -> steps -> checkpoint -> val.

Uses the cached MaiCity ray buffers under artifacts/ (built by
``pcnerf_tpu.preprocess.pipeline`` + ``load_or_build``); skipped on a fresh
checkout without them.  Shrinks sampling so the whole loop runs on the CPU
test mesh in seconds while still exercising every stage of train/loop.py.
"""

import dataclasses
import json
import os

import numpy as np
import pytest

from pcnerf_tpu.config import LossConfig, ModelConfig, RenderConfig
from pcnerf_tpu.data.raybuffer import cache_paths
from pcnerf_tpu.presets import maicity00_pcnerf_train
from pcnerf_tpu.train.loop import fit

CFG = maicity00_pcnerf_train(compute_dtype="float32")
_HAVE_CACHE = os.path.exists(cache_paths(CFG.data, "train")[0])


@pytest.mark.skipif(not _HAVE_CACHE, reason="no cached MaiCity ray buffers")
def test_fit_smoke_end_to_end(tmp_path):
    cfg = dataclasses.replace(
        CFG,
        batch_size=128, batch_size_val=128, num_epochs=1, log_every=2,
        model=ModelConfig(compute_dtype="float32"),
        render=RenderConfig(n_samples=32, n_importance=64, perturb=1.0,
                            use_segmented_sample=True, child_ratio=0.1),
        loss=dataclasses.replace(CFG.loss, sub_nerf_count=CFG.loss.sub_nerf_count),
        data=dataclasses.replace(CFG.data, cloud_size_val=256),
    )
    out = str(tmp_path / "run")
    state = fit(cfg, out_dir=out, max_steps=5, verbose=False)
    assert int(state.step) == 5

    rows = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    step_rows = [r for r in rows if "loss" in r and not any("val" in k for k in r)]
    val_rows = [r for r in rows if any(k.startswith("val/") for k in r)]
    assert len(step_rows) >= 4            # flushed train metrics
    assert len(val_rows) >= 1             # sanity val ran
    assert np.isfinite(step_rows[-1]["loss"])
    assert "val/cd" in val_rows[0] and np.isfinite(val_rows[0]["val/cd"])

    # checkpoints: best + last written and restorable
    from pcnerf_tpu.train.system import init_train_state
    from pcnerf_tpu.utils.ckpt import restore
    import jax
    ckpt_dir = os.path.join(out, "checkpoints")
    assert os.path.exists(os.path.join(ckpt_dir, "best"))
    tmpl = init_train_state(jax.random.PRNGKey(0), cfg)
    restored = restore(os.path.join(ckpt_dir, "best"), tmpl)
    w_now = np.asarray(state.params["coarse"]["layers"][0]["w"])
    w_ck = np.asarray(restored.params["coarse"]["layers"][0]["w"])
    assert w_ck.shape == w_now.shape and np.isfinite(w_ck).all()

    # the reference's loss-curve artifacts exist (train_kitti.py:183-189)
    assert os.path.exists(os.path.join(out, "ploty1.npy"))

    # completion sentinel: written only at the end of fit(), carries the
    # final step count (queue scripts key train-skip decisions on it)
    done = json.load(open(os.path.join(out, "DONE")))
    assert done["step"] == 5

    # a rerun in the same out_dir must clear the stale sentinel up front:
    # interrupt the rerun by monkey-level means (max_steps smaller than the
    # sentinel check is not the point — just assert it was rewritten)
    fit(cfg, out_dir=out, max_steps=2, skip_sanity_val=True, verbose=False)
    assert json.load(open(os.path.join(out, "DONE")))["step"] == 2


@pytest.mark.skipif(not _HAVE_CACHE, reason="no cached MaiCity ray buffers")
def test_fit_resume_continues_from_last(tmp_path):
    cfg = dataclasses.replace(
        CFG,
        batch_size=128, batch_size_val=128, num_epochs=1, log_every=2,
        model=ModelConfig(compute_dtype="float32"),
        render=RenderConfig(n_samples=16, n_importance=32, perturb=1.0),
        data=dataclasses.replace(CFG.data, cloud_size_val=256),
    )
    out = str(tmp_path / "run")
    s1 = fit(cfg, out_dir=out, max_steps=4, skip_sanity_val=True,
             verbose=False)
    assert int(s1.step) == 4
    s2 = fit(cfg, out_dir=out, max_steps=6, skip_sanity_val=True,
             resume=True, verbose=False)
    assert int(s2.step) == 6
    # optimizer state advanced, not re-initialized: Adam counter == step
    counts = [st.count for st in s2.opt_state
              if type(st).__name__ == "ScaleByAdamState"]
    assert counts and int(counts[0]) == 6
