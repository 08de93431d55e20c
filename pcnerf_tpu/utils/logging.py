"""Training observability: metric logging + the reference's loss-curve files.

Replaces TensorBoardLogger + the seven per-5-step ``ploty*.npy`` curves
(``train_kitti.py:164-204``, SURVEY.md section 5): metrics are kept as device
scalars during the epoch (zero host syncs in the hot loop — critical on a
tunneled accelerator), flushed in bulk at save points to JSONL, optional
TensorBoard, and reference-layout ``ploty*`` npy files.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List

import numpy as np


_CURVE_KEYS = [
    ("loss", "ploty1"),
    ("loss_range", "ploty1_range"),
    ("loss_range_fine", "ploty1_range_fine"),
    ("child_free_loss", "ploty1_child_free"),
    ("child_free_loss_fine", "ploty1_child_free_fine"),
    ("child_depth_loss", "ploty1_child_depth"),
    ("child_depth_loss_fine", "ploty1_child_depth_fine"),
]


class MetricLogger:
    def __init__(self, log_dir: str, *, curve_every: int = 5,
                 use_tensorboard: bool = True):
        self.dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self.curve_every = curve_every
        self._pending: List[Dict] = []   # device-scalar dicts, not yet fetched
        self._steps: List[int] = []
        self._rows: List[Dict] = []
        jsonl_path = os.path.join(log_dir, "metrics.jsonl")
        # on resume, reload prior train rows so the reference-layout curve
        # artifacts (ploty*.npy) keep their pre-crash prefix instead of being
        # truncated to post-resume steps (metrics.jsonl itself appends)
        if os.path.exists(jsonl_path):
            try:
                with open(jsonl_path) as f:
                    for line in f:
                        row = json.loads(line)
                        if "loss" in row:   # train rows only (val rows use val/)
                            self._rows.append(row)
            except Exception:
                self._rows = []
        self._jsonl = open(jsonl_path, "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None
        self._t0 = time.time()

    def log_step(self, step: int, metrics: Dict) -> None:
        """Queue device scalars; no host transfer happens here."""
        self._pending.append((step, metrics, 1))
        self._steps.append(step)

    def log_block(self, step0: int, metrics: Dict, k: int) -> None:
        """Queue a scan chunk's stacked metrics ({key: (K,) device array})
        as K consecutive step rows starting at ``step0`` — the whole block
        stays on device until flush."""
        self._pending.append((step0, metrics, k))
        self._steps.append(step0 + k - 1)

    def flush(self) -> Dict:
        """Fetch all queued metrics in one bulk transfer and persist them."""
        if not self._pending:
            return {}
        import jax
        # ONE transfer for everything queued (per-scalar fetches cost ~26 ms
        # each through a tunneled backend)
        fetched = jax.device_get([m for (_, m, _) in self._pending])
        pending, self._pending = self._pending, []
        self._steps = []
        last = {}
        wall = time.time() - self._t0
        for (step0, _, k), m in zip(pending, fetched):
            for i in range(k):
                row = {key: float(np.asarray(v).reshape(-1)[i] if k > 1
                                  else v)
                       for key, v in m.items()}
                row["step"] = step0 + i
                row["wall"] = wall
                self._rows.append(row)
                self._jsonl.write(json.dumps(row) + "\n")
                if self._tb is not None:
                    for key, v in row.items():
                        if key not in ("step", "wall"):
                            self._tb.add_scalar(f"train/{key}", v, row["step"])
                last = row
        self._jsonl.flush()
        self._save_curves()
        return last

    def _save_curves(self) -> None:
        """Reference loss-curve artifacts: every 5th step's values
        (train_kitti.py:165-189 records on batch_idx % 5 == 0)."""
        rows = [r for r in self._rows if r["step"] % self.curve_every == 0]
        if not rows:
            return
        for key, fname in _CURVE_KEYS:
            arr = np.asarray([r.get(key, 0.0) for r in rows], np.float32)
            np.save(os.path.join(self.dir, fname), arr)

    def log_val(self, step: int, metrics: Dict) -> None:
        row = {f"val/{k}": float(v) for k, v in metrics.items()}
        row["step"] = step
        self._jsonl.write(json.dumps(row) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in row.items():
                if k != "step":
                    self._tb.add_scalar(k, v, step)

    def close(self) -> None:
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
