"""StepTimer barrier timing + trace context robustness (utils/profiling.py)."""

import json
import os

import jax.numpy as jnp

from pcnerf_tpu.utils.profiling import StepTimer, trace


def test_step_timer_records_and_saves(tmp_path):
    t = StepTimer()
    for i in range(4):
        with t.step():
            x = jnp.sum(jnp.arange(1000.0) * i)
        t.mark_complete(x)
    s = t.summary()
    assert s["dispatch"]["n"] == 3  # first (compile) step dropped
    assert s["complete"]["mean_ms"] >= 0
    p = os.path.join(tmp_path, "step_times.json")
    t.save(p)
    with open(p) as f:
        assert json.load(f)["dispatch"]["n"] == 3


def test_trace_noop_and_enabled(tmp_path):
    with trace(str(tmp_path), enabled=False):
        pass
    # enabled path either produces a trace dir or degrades gracefully
    with trace(str(tmp_path / "t"), enabled=True):
        float(jnp.sum(jnp.ones(16)))
