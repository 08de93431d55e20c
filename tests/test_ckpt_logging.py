"""Regression tests for two resume-path behaviors (advisor round-1 findings):

- ``BestLastTracker`` persists the best monitored loss in a ``best.json``
  sidecar so a resumed run keeps competing against the pre-crash best instead
  of overwriting ``checkpoints/best`` on its first flush (reference behavior:
  PL ``ModelCheckpoint`` keeps ``best_model_score`` inside the ckpt itself,
  train_kitti.py:275-276).
- ``MetricLogger`` reloads prior train rows from ``metrics.jsonl`` on
  construction so the reference-layout ``ploty*.npy`` curve artifacts keep
  their pre-crash prefix after a resume (train_kitti.py:165-189 accumulates
  curves over the whole run).
"""

import json
import os

import numpy as np
import jax.numpy as jnp

from pcnerf_tpu.utils.ckpt import BestLastTracker
from pcnerf_tpu.utils.logging import MetricLogger


def _state(v: float):
    return {"w": jnp.full((4,), v, jnp.float32)}


def test_best_tracker_survives_restart(tmp_path):
    d = str(tmp_path / "ckpts")
    t1 = BestLastTracker(d, min_interval_s=0.0)
    t1.update(1.0, _state(1.0))
    t1.update(0.25, _state(2.0))     # becomes best
    t1.update(0.9, _state(3.0))      # worse: best untouched, last updated
    assert json.load(open(os.path.join(d, "best.json")))["best"] == 0.25

    # a fresh tracker (resumed process) must not demote the pre-crash best
    t2 = BestLastTracker(d, min_interval_s=0.0)
    assert t2.best == 0.25
    t2.update(0.5, _state(4.0))      # worse than pre-crash best
    from pcnerf_tpu.utils.ckpt import restore
    best = restore(os.path.join(d, "best"), _state(0.0))
    assert float(np.asarray(best["w"])[0]) == 2.0   # still the 0.25-loss state
    t2.update(0.1, _state(5.0))      # genuinely better: takes over
    best = restore(os.path.join(d, "best"), _state(0.0))
    assert float(np.asarray(best["w"])[0]) == 5.0
    assert json.load(open(os.path.join(d, "best.json")))["best"] == 0.1


def test_metric_logger_keeps_curve_prefix_on_resume(tmp_path):
    d = str(tmp_path / "run")
    lg1 = MetricLogger(d, curve_every=1, use_tensorboard=False)
    for s in range(3):
        lg1.log_step(s, {"loss": jnp.float32(10.0 + s)})
    lg1.close()
    assert np.load(os.path.join(d, "ploty1.npy")).shape == (3,)

    # resumed process: steps 3..4 append; the curve keeps steps 0..2
    lg2 = MetricLogger(d, curve_every=1, use_tensorboard=False)
    for s in range(3, 5):
        lg2.log_step(s, {"loss": jnp.float32(10.0 + s)})
    lg2.close()
    curve = np.load(os.path.join(d, "ploty1.npy"))
    assert curve.shape == (5,)
    np.testing.assert_allclose(curve, 10.0 + np.arange(5), rtol=1e-6)

    # val rows in metrics.jsonl must not be mistaken for train rows
    rows = [json.loads(l) for l in open(os.path.join(d, "metrics.jsonl"))]
    assert len([r for r in rows if "loss" in r]) == 5


def test_best_tracker_debounce_and_final(tmp_path):
    """With a long debounce window only the FIRST update persists
    immediately; later candidates (including a better best seen mid-window)
    are held and flushed by final() — nothing is lost, and the hot loop
    never pays an orbax save per flush (VERDICT r3 weak #3)."""
    from pcnerf_tpu.utils.ckpt import restore
    d = str(tmp_path / "ckpts")
    t = BestLastTracker(d, min_interval_s=3600.0)
    t.update(1.0, _state(1.0))        # first save: immediate
    assert json.load(open(os.path.join(d, "best.json")))["best"] == 1.0
    t.update(0.2, _state(2.0))        # better, but inside the window: held
    assert json.load(open(os.path.join(d, "best.json")))["best"] == 1.0
    t.update(0.7, _state(3.0))        # worse last; held best must survive
    t.final()
    assert json.load(open(os.path.join(d, "best.json")))["best"] == 0.2
    best = restore(os.path.join(d, "best"), _state(0.0))
    assert float(np.asarray(best["w"])[0]) == 2.0
    last = restore(os.path.join(d, "last"), _state(0.0))
    assert float(np.asarray(last["w"])[0]) == 3.0
