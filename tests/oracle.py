"""Frozen PyTorch oracle reproducing the reference implementation's semantics.

This is the test-side ground truth for numerical parity (SURVEY.md section 7,
"freeze a PyTorch-semantics oracle in tests and require allclose on fwd +
grads").  It re-implements — functionally and independently — the math of:

- the NOF MLP with its construction quirks (models.py:44-123): four
  Linear+BatchNorm1d blocks, identity "LeakyReLU(True)" activations (slope
  1.0), four stray activations after layer1, skip concat, four
  activation-free Linear+BatchNorm blocks, sigmoid head;
- positional embedding (models.py:4-41);
- the transmittance/weight/depth pipeline and child losses of
  ``inference_train`` (render.py:38-163) with its per-ray gamma-expansion
  while loops and per-child Python loops;
- ``sample_pdf`` (render.py:371-412).

Everything is float64-capable for tight tolerances; default float32.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# Embedding + MLP
# ---------------------------------------------------------------------------

def embed(x: torch.Tensor, n_freq: int = 10) -> torch.Tensor:
    outs = [x]
    for k in range(n_freq):
        f = 2.0 ** k
        outs.append(torch.sin(f * x))
        outs.append(torch.cos(f * x))
    return torch.cat(outs, dim=-1)


def make_torch_params(jax_params, jax_bn):
    """Convert a pcnerf_tpu param pytree into torch tensors (leaf-for-leaf)."""
    layers = []
    for i, lyr in enumerate(jax_params["layers"]):
        layers.append({
            "w": torch.tensor(np.asarray(lyr["w"]), requires_grad=True),
            "b": torch.tensor(np.asarray(lyr["b"]), requires_grad=True),
            "scale": torch.tensor(np.asarray(lyr["scale"]), requires_grad=True),
            "bias": torch.tensor(np.asarray(lyr["bias"]), requires_grad=True),
            "mean": torch.tensor(np.asarray(jax_bn["mean"][i])),
            "var": torch.tensor(np.asarray(jax_bn["var"][i])),
        })
    head = {
        "w": torch.tensor(np.asarray(jax_params["head"]["w"]), requires_grad=True),
        "b": torch.tensor(np.asarray(jax_params["head"]["b"]), requires_grad=True),
    }
    return {"layers": layers, "head": head}


def nof_forward(tp, x: torch.Tensor, *, training: bool, slope: float = 1.0,
                eps: float = 1e-5) -> torch.Tensor:
    """Forward with the exact reference block structure."""

    def block(i, h):
        lyr = tp["layers"][i]
        h = h @ lyr["w"] + lyr["b"]
        if training:
            h = F.batch_norm(h, None, None, lyr["scale"], lyr["bias"],
                             training=True, momentum=0.0, eps=eps)
        else:
            h = F.batch_norm(h, lyr["mean"], lyr["var"], lyr["scale"],
                             lyr["bias"], training=False, eps=eps)
        return h

    h = x
    for i in range(4):
        h = F.leaky_relu(block(i, h), negative_slope=slope)
    for _ in range(4):
        h = F.leaky_relu(h, negative_slope=slope)
    h = torch.cat([x, h], dim=-1)
    for i in range(4, 8):
        h = block(i, h)  # no activation (reference layer2 quirk)
    return torch.sigmoid(h @ tp["head"]["w"] + tp["head"]["b"])[..., 0]


# ---------------------------------------------------------------------------
# Compositing + child losses (inference_train semantics, noise_std = 0)
# ---------------------------------------------------------------------------

def weights_from_occ(occ: torch.Tensor, epsilon: float = 1e-10) -> torch.Tensor:
    free = 1.0 - occ
    shifted = torch.cat([torch.ones_like(free[:, :1]), free], dim=-1)
    cum = torch.cumprod(shifted, dim=-1)[:, :-1]
    w = cum * occ
    return w / (w.sum(dim=-1, keepdim=True) + epsilon)


def gamma_mask_loop(z_vals, near, far, gamma0, step=0.01, strict=False):
    """The reference's literal per-ray expansion loop (render.py:77-99)."""
    mask = torch.zeros_like(z_vals, dtype=torch.bool)
    for i in range(z_vals.shape[0]):
        g = gamma0
        row = z_vals[i]
        if strict:
            m = (near[i] - g < row) & (row < far[i] + g)
        else:
            m = (near[i] - g <= row) & (row <= far[i] + g)
        while m.sum() == 0:
            g = g + step
            if strict:
                m = (near[i] - g < row) & (row < far[i] + g)
            else:
                m = (near[i] - g <= row) & (row <= far[i] + g)
        mask[i] = m
    return mask


def child_losses_loop(w, z_vals, near_c, far_c, ranges, child_ids,
                      sub_nerf_count, divide, epsilon=1e-10):
    """Free + depth child losses with the reference's grouping loops."""
    n_rays, n_samples = w.shape
    free_mask = gamma_mask_loop(z_vals, near_c, far_c, 0.0)
    depth_mask = gamma_mask_loop(z_vals, near_c, far_c, 2.0)

    w_free = w * (~free_mask).float()
    if divide:
        free_loss = torch.zeros(())
        for c in range(sub_nerf_count):
            sel = (child_ids > c + 0.5) & (child_ids < c + 1.5)
            cnt = sel.float().sum()
            if cnt >= 1:
                free_loss = free_loss + (w_free[sel] ** 2).sum() / cnt
    else:
        free_loss = (w_free ** 2).sum() / n_rays

    w_child = w * depth_mask.float()
    w_child = w_child / (w_child.sum(-1, keepdim=True) + epsilon)
    z_child = z_vals * depth_mask.float()
    if divide:
        depth_loss = torch.zeros(())
        for c in range(sub_nerf_count):
            sel = (child_ids > c + 0.5) & (child_ids < c + 1.5)
            cnt = sel.float().sum()
            if cnt >= 1:
                d = (w_child[sel] * z_child[sel]).sum(-1)
                depth_loss = depth_loss + (1.0 / cnt) * 0.1 * F.smooth_l1_loss(
                    10.0 * d, 10.0 * ranges[sel])
    else:
        d = (w_child * z_child).sum(-1)
        depth_loss = (1.0 / n_rays) * 0.1 * F.smooth_l1_loss(10.0 * d, 10.0 * ranges)
    return free_loss, depth_loss


def sample_pdf_det(bins: torch.Tensor, weights: torch.Tensor, n: int) -> torch.Tensor:
    """Deterministic (det=True) inverse-CDF sampling (render.py:371-412)."""
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdim=True)
    cdf = torch.cumsum(pdf, -1)
    cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], -1)
    u = torch.linspace(0.0, 1.0, n, dtype=cdf.dtype)
    u = u.expand(list(cdf.shape[:-1]) + [n]).contiguous()
    inds = torch.searchsorted(cdf, u, right=True)
    below = torch.clamp(inds - 1, min=0)
    above = torch.clamp(inds, max=cdf.shape[-1] - 1)
    cdf_b = torch.gather(cdf, -1, below)
    cdf_a = torch.gather(cdf, -1, above)
    bins_b = torch.gather(bins, -1, below)
    bins_a = torch.gather(bins, -1, above)
    denom = cdf_a - cdf_b
    denom = torch.where(denom < 1e-5, torch.ones_like(denom), denom)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)


# ---------------------------------------------------------------------------
# Scalar ray/AABB oracles (ipb2dmapping.py:36-172 semantics)
# ---------------------------------------------------------------------------

def far_bound_scalar(o, d, bmin, bmax):
    ts = []
    for i in range(3):
        if d[i] != 0:
            for plane in (bmax[i], bmin[i]):
                t = (plane - o[i]) / d[i]
                ts.append(np.inf if t < 0 else t)
        else:
            ts += [np.inf, np.inf]
    return min(ts)


def face_hits_scalar(o, d, bmin, bmax):
    hits = []
    for i in range(3):
        for plane in (bmin[i], bmax[i]):
            if d[i] * (plane - o[i]) > 0:
                t = (plane - o[i]) / d[i]
                p = o + t * d
                count = sum(
                    1 for k in range(3)
                    if k != i and bmin[k] <= p[k] <= bmax[k])
                if count >= 2:
                    hits.append(t)
    return hits


# ---------------------------------------------------------------------------
# Two-step inference oracle (inference_0525_2, render.py:229-368)
# ---------------------------------------------------------------------------

def inference_0525_2_oracle(occ, z_vals, other_counts, near_c, far_c,
                            method=2, epsilon=1e-10):
    """Literal re-enactment of the reference's eval compositor: strict
    gamma-expansion masks (gamma0=0.01), scipy gaussian smoothing (sigma=5),
    and the sequential per-group candidate walk.  noise-free.

    Returns (depth, flag) numpy arrays.
    """
    from scipy.ndimage import gaussian_filter

    occ = torch.tensor(occ)
    z = torch.tensor(z_vals)
    n_rays, _ = occ.shape
    w = weights_from_occ(occ, epsilon)

    mask_child = gamma_mask_loop(z, torch.tensor(near_c), torch.tensor(far_c),
                                 0.01, strict=True)

    smoothed = torch.zeros_like(w)
    for i in range(n_rays):
        smoothed[i] = torch.tensor(gaussian_filter(w[i].numpy(), sigma=5))
    max_idx = torch.argmax(smoothed, dim=1)
    mask1 = torch.zeros_like(w, dtype=torch.bool)
    mask1[torch.arange(n_rays), max_idx] = True
    mask2 = (mask_child.float() * mask1.float()).sum(-1).reshape(-1, 1)
    w_child_sum = (w * mask_child.float()).sum(-1).reshape(-1, 1)

    flag = torch.zeros((n_rays, 1), dtype=torch.bool)
    i = 0
    while i < n_rays:
        if abs(other_counts[i] - 0) < 0.5:
            flag[i] = True
            i += 1
        elif other_counts[i] > 0.5:
            if abs(mask2[i] - 1) < 0.1:
                sel = i
            else:
                sel = i
                exist = 0
                for j in range(0, int(other_counts[i])):
                    if abs(mask2[i + j + 1] - 1) < 0.1:
                        sel = i + j + 1
                        exist = 1
                        break
                if exist == 0:
                    for j in range(0, int(other_counts[i])):
                        if w_child_sum[i + j + 1] > w_child_sum[sel]:
                            sel = i + j + 1
            flag[sel] = True
            i = i + int(other_counts[i]) + 1
        else:
            i += 1

    if method == 2:
        w_child = w * mask_child.float()
        w_child = w_child / (w_child.sum(-1, keepdim=True) + epsilon)
        depth = (w_child * z).sum(-1)
    else:
        depth = (w * z).sum(-1)
    return depth.numpy(), flag.numpy()[:, 0]
