"""Measured reference-semantics baseline: one full PC-NeRF training step
(coarse -> importance -> fine, three-level loss, backward, Adam) in PyTorch
with the reference's structure — chunked MLP evaluation, per-ray Python
gamma-expansion loops — at the shipped KITTI config (batch 256, 768 + 1536
samples).  This is a MEASURED number on this machine's CPU (torch is
CPU-only in this image); the reference's RTX3090 throughput remains an
estimate and is labeled as such in bench.py.

    python scripts/bench_torch_oracle.py [--steps 3] [--out BASELINE_measured.json]

Reuses the frozen torch oracle from tests/oracle.py (the parity ground
truth), so the measured step is the same math the parity tests pin.
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np  # noqa: E402
import torch  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from oracle import (child_losses_loop, embed, nof_forward,  # noqa: E402
                    sample_pdf_det, weights_from_occ)

BATCH = 256
N_SAMPLES = 768
N_IMPORTANCE = 1536
CHUNK = 262144          # reference --chunk (nof_utils.py / render.py:46-49)
FEATURES = 256


def _make_params(seed, in_ch=63):
    g = torch.Generator().manual_seed(seed)
    layers = []
    dims_in = [in_ch, FEATURES, FEATURES, FEATURES,
               FEATURES + in_ch, FEATURES, FEATURES, FEATURES]
    for d_in in dims_in:
        layers.append({
            "w": torch.randn(d_in, FEATURES, generator=g) * 0.02,
            "b": torch.zeros(FEATURES),
            "scale": torch.ones(FEATURES),
            "bias": torch.zeros(FEATURES),
            "mean": torch.zeros(FEATURES),
            "var": torch.ones(FEATURES),
        })
    head = {"w": torch.randn(FEATURES, 1, generator=g) * 0.02,
            "b": torch.zeros(1)}
    for lyr in layers:
        for k in ("w", "b", "scale", "bias"):
            lyr[k].requires_grad_(True)
    head["w"].requires_grad_(True)
    head["b"].requires_grad_(True)
    return {"layers": layers, "head": head}


def _chunked_occ(tp, pts_flat):
    """The reference's chunked Embedding+MLP loop (render.py:46-49)."""
    outs = []
    for s in range(0, pts_flat.shape[0], CHUNK):
        emb = embed(pts_flat[s:s + CHUNK])
        outs.append(nof_forward(tp, emb, training=True))
    return torch.cat(outs)


def train_step(tp_c, tp_f, opt, rays, ranges):
    o, d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6], rays[:, 7]
    child_ids = rays[:, 9]
    near_c, far_c = rays[:, 10], rays[:, 11]

    steps = torch.linspace(0.0, 1.0, N_SAMPLES)
    z = near[:, None] * (1 - steps) + far[:, None] * steps

    pts = (o[:, None, :] + d[:, None, :] * z[..., None]).reshape(-1, 3)
    occ = _chunked_occ(tp_c, pts).reshape(BATCH, N_SAMPLES)
    w = weights_from_occ(occ)
    depth = (w * z).sum(-1)
    free_c, dloss_c = child_losses_loop(w, z, near_c, far_c, ranges,
                                        child_ids, 16, divide=False)

    mids = 0.5 * (z[:, 1:] + z[:, :-1])
    z_new = sample_pdf_det(mids, w[:, 1:-1].detach(), N_IMPORTANCE)
    z_fine, _ = torch.sort(torch.cat([z, z_new], -1), -1)

    pts_f = (o[:, None, :] + d[:, None, :] * z_fine[..., None]).reshape(-1, 3)
    occ_f = _chunked_occ(tp_f, pts_f).reshape(BATCH, -1)
    w_f = weights_from_occ(occ_f)
    depth_f = (w_f * z_fine).sum(-1)
    free_f, dloss_f = child_losses_loop(w_f, z_fine, near_c, far_c, ranges,
                                        child_ids, 16, divide=False)

    loss = (0.1 * F.smooth_l1_loss(10 * depth, 10 * ranges)
            + 0.1 * F.smooth_l1_loss(10 * depth_f, 10 * ranges)
            + 1e6 * (free_c + free_f) + 1e5 * (dloss_c + dloss_f))
    opt.zero_grad()
    loss.backward()
    opt.step()
    return float(loss)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--out", default=os.path.join(REPO, "BASELINE_measured.json"))
    a = p.parse_args()

    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(BATCH, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    r = rng.uniform(10, 40, BATCH).astype(np.float32)
    rays = np.zeros((BATCH, 15), np.float32)
    rays[:, 3:6] = dirs
    rays[:, 7] = 60.0
    rays[:, 9] = rng.integers(1, 17, BATCH)
    rays[:, 10] = r - 1.0
    rays[:, 11] = r + 1.0
    rays[:, 14] = r
    rays_t = torch.tensor(rays)
    ranges_t = torch.tensor(r)

    tp_c, tp_f = _make_params(0), _make_params(1)
    params = [l[k] for tp in (tp_c, tp_f) for l in tp["layers"]
              for k in ("w", "b", "scale", "bias")]
    params += [tp["head"][k] for tp in (tp_c, tp_f) for k in ("w", "b")]
    opt = torch.optim.Adam(params, lr=5e-4, weight_decay=1e-3)

    train_step(tp_c, tp_f, opt, rays_t, ranges_t)   # warmup
    t0 = time.time()
    for _ in range(a.steps):
        train_step(tp_c, tp_f, opt, rays_t, ranges_t)
    dt = (time.time() - t0) / a.steps

    out = {
        "kind": "measured",
        "what": "reference-semantics torch training step on this host CPU",
        "batch": BATCH, "n_samples": N_SAMPLES, "n_importance": N_IMPORTANCE,
        "step_s": round(dt, 3),
        "rays_per_s": round(BATCH / dt, 1),
        "torch_threads": torch.get_num_threads(),
    }
    with open(a.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
