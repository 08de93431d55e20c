"""First-class profiling: jax.profiler traces + honest step timing.

The reference's only timing is ``time.time()`` wall-clock prints around each
eval frame (``eval_kitti_render.py:933,1047-1049,1064,1177-1179``) plus the
offline averaging tool ``tool_script/avg_time.py``.  Here profiling is a
subsystem (SURVEY.md section 5):

- :func:`trace` wraps a region in a ``jax.profiler`` trace whose artifact
  loads in TensorBoard / Perfetto (``xprof``), gated so it degrades to a
  no-op where the backend can't profile (e.g. tunneled devices).
- :class:`StepTimer` times device work with a *data-dependency barrier*: on
  tunneled backends ``block_until_ready`` returns before remote compute
  finishes, so the only reliable barrier is fetching a scalar.  All
  throughput numbers in this framework come from this pattern (see bench.py).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, List, Optional


@contextlib.contextmanager
def trace(log_dir: str, *, enabled: bool = True):
    """``with trace("logs/exp/trace"):`` — capture a jax.profiler trace.

    Degrades to a no-op if the backend refuses to start the profiler (some
    remote/tunneled platforms), never failing the surrounding run.
    """
    if not enabled:
        yield
        return
    import jax
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # backend without profiler support
        print(f"[profiling] trace unavailable ({e}); continuing untraced",
              flush=True)
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def barrier(x) -> float:
    """Force completion of the computation producing ``x`` and return it.

    A data fetch is the only barrier that's reliable on every backend
    (``block_until_ready`` can return early on tunneled devices).
    """
    return float(x)


class StepTimer:
    """Per-step wall timing with correct device barriers.

    Usage::

        timer = StepTimer()
        with timer.step():              # times host dispatch
            state, m = train_step(...)
        timer.mark_complete(m["loss"])   # barrier: times device completion

    ``summary()`` reports dispatch/complete percentiles; ``save(path)`` dumps
    JSON next to the run's other artifacts.
    """

    def __init__(self) -> None:
        self.dispatch_s: List[float] = []
        self.complete_s: List[float] = []
        self._t0: Optional[float] = None

    @contextlib.contextmanager
    def step(self, scale: int = 1):
        """``scale`` divides the recorded duration — pass K when the timed
        region is a K-step ``lax.scan`` dispatch so percentiles stay
        per-step."""
        self._t0 = time.time()
        self._scale = scale
        yield
        self.dispatch_s.append((time.time() - self._t0) / self._scale)

    def mark_complete(self, scalar) -> float:
        """Fetch ``scalar`` (data-dependency barrier) and record the full
        step latency.  Call sparsely (every N steps) — each fetch is a
        device round-trip."""
        v = barrier(scalar)
        if self._t0 is not None:
            self.complete_s.append((time.time() - self._t0)
                                   / getattr(self, "_scale", 1))
        return v

    def summary(self) -> Dict[str, Any]:
        import numpy as np

        def stats(xs):
            if not xs:
                return None
            a = np.asarray(xs[1:] or xs)  # drop the compile step
            return {"mean_ms": float(a.mean() * 1e3),
                    "p50_ms": float(np.percentile(a, 50) * 1e3),
                    "p95_ms": float(np.percentile(a, 95) * 1e3),
                    "n": int(a.size)}

        return {"dispatch": stats(self.dispatch_s),
                "complete": stats(self.complete_s)}

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)
