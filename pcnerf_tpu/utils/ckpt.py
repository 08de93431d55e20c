"""Checkpoint IO.

Replaces the reference's PyTorch-Lightning ``ModelCheckpoint`` + prefix-
filtered state-dict surgery (``nof/nof_utils.py:176-210``, C19):

- :func:`save` / :func:`restore`: the full TrainState pytree via Orbax (the
  TPU-native checkpoint stack), with best/last tracking like the reference's
  ``ModelCheckpoint(monitor='train/loss', save_top_k, save_last)``.
- :func:`import_torch_ckpt`: load a reference ``.ckpt`` (Lightning state
  dict) into our parameter pytree — the ``nof_coarse.`` / ``nof_fine.``
  prefix filtering of ``extract_model_state_dict``, with the Linear weight
  transpose (torch stores (out, in)).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


def save(path: str, state: Any) -> None:
    ckptr = _ocp().StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()


def restore(path: str, abstract_state: Any) -> Any:
    ckptr = _ocp().StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), abstract_state)


class BestLastTracker:
    """Reference checkpoint policy: monitor train/loss, keep best + last
    (train_kitti.py:275-276).

    The best loss is persisted in a ``best.json`` sidecar so a resumed run
    keeps competing against the pre-crash best instead of overwriting
    ``checkpoints/best`` with its first (possibly worse) flush."""

    def __init__(self, ckpt_dir: str):
        self.dir = ckpt_dir
        self.best = float("inf")
        os.makedirs(ckpt_dir, exist_ok=True)
        sidecar = os.path.join(ckpt_dir, "best.json")
        if os.path.exists(sidecar):
            try:
                import json
                with open(sidecar) as f:
                    self.best = float(json.load(f)["best"])
            except Exception:
                pass

    def update(self, loss: float, state: Any) -> None:
        save(os.path.join(self.dir, "last"), state)
        if loss < self.best:
            self.best = loss
            save(os.path.join(self.dir, "best"), state)
            import json
            with open(os.path.join(self.dir, "best.json"), "w") as f:
                json.dump({"best": self.best}, f)


# ---------------------------------------------------------------------------
# Reference torch checkpoint import
# ---------------------------------------------------------------------------

# torch Sequential indices of the Linear / BatchNorm modules in the reference
# model (models.py:60-100): layer1 = [Lin, BN, LReLU]*4 (+4 stray LReLU),
# layer2 = [Lin, BN]*4, head = occ_out.0.
_L1_LIN = [0, 3, 6, 9]
_L1_BN = [1, 4, 7, 10]
_L2_LIN = [0, 2, 4, 6]
_L2_BN = [1, 3, 5, 7]


def import_torch_ckpt(ckpt_path: str, model_name: str):
    """-> (params, bn_state) pytrees for one model from a reference ckpt."""
    import torch
    raw = torch.load(ckpt_path, map_location="cpu")
    sd = raw.get("state_dict", raw)
    pre = model_name + "."
    sd = {k[len(pre):]: v.numpy() for k, v in sd.items() if k.startswith(pre)}

    layers, means, vars_ = [], [], []
    for half, lins, bns in (("layer1", _L1_LIN, _L1_BN),
                            ("layer2", _L2_LIN, _L2_BN)):
        for li, bi in zip(lins, bns):
            layers.append({
                "w": np.ascontiguousarray(sd[f"{half}.{li}.weight"].T),
                "b": sd[f"{half}.{li}.bias"],
                "scale": sd[f"{half}.{bi}.weight"],
                "bias": sd[f"{half}.{bi}.bias"],
            })
            means.append(sd[f"{half}.{bi}.running_mean"])
            vars_.append(sd[f"{half}.{bi}.running_var"])
    params = {
        "layers": [jax.tree.map(np.asarray, l) for l in layers],
        "head": {"w": np.ascontiguousarray(sd["occ_out.0.weight"].T),
                 "b": sd["occ_out.0.bias"]},
    }
    bn = {"mean": means, "var": vars_}
    return params, bn
