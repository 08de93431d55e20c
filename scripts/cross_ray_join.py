"""Per-ray cross-join of our render vs the reference's shipped render.

The MaiCity PC-NeRF cell shows a uniform ~5-8% CD deficit (RESULTS.md).  Two
competing explanations: (a) child-set geometry — our regenerated clustering
differs ~5% from the reference's unpublished one, so some rays get different
child intervals; (b) model/training quality.  The reference ships, per test
frame, its gt source cloud, its rendered cloud (row i of the inference pcd is
the depth prediction for the ray of row i of the source pcd —
``print_metrics.py:104-117``), and its per-row group-size file.  Both trees
kept EXACTLY the same rays (RESULTS.md fingerprint: 1,226,334/1,226,334), so
joining rays by their gt point splits the per-ray depth error into:

  * rays where both trees assembled the SAME group size (same #children hit)
    — geometry agrees; any error delta there is the model;
  * rays where the group sizes differ — the child-set difference.

Usage:
    python scripts/cross_ray_join.py \
        --ours artifacts/maicity00/maicity_00_1 \
        --ref /root/reference/logs/maicity00/maicity_00_1 \
        --version version_1 --method two_step
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pcnerf_tpu.config import FrameSplit
from pcnerf_tpu.data.pcd_io import read_pcd


def group_sizes(counts_path):
    """Decode the flat other_interest_sub_nerf_number file (groupsize-1 on
    the first row of each group, 0 after) into one size per ray, in ray
    order (= source.pcd row order)."""
    c = np.load(counts_path).reshape(-1).astype(np.int64)
    sizes = []
    i = 0
    n = c.shape[0]
    while i < n:
        g = int(c[i]) + 1
        sizes.append(g)
        i += g
    return np.asarray(sizes)


def frame_tables(result_root, render_dir, frame, version, method):
    src = read_pcd(os.path.join(render_dir, "source", f"{frame}_source.pcd"))
    pose = read_pcd(os.path.join(render_dir, "source",
                                 f"{frame}_pose.pcd")).reshape(-1)[:3]
    pred = read_pcd(os.path.join(render_dir, "infer",
                                 f"{version}_{frame}_{method}.pcd"))
    sizes = group_sizes(os.path.join(
        result_root, method, f"{frame}pcd", "childnerf_ray_intersect",
        "other_interest_sub_nerf_number_child.npy"))
    n = min(src.shape[0], pred.shape[0], sizes.shape[0])
    src, pred, sizes = src[:n], pred[:n], sizes[:n]
    err = np.abs(np.linalg.norm(pred - pose, axis=1)
                 - np.linalg.norm(src - pose, axis=1))
    return src, err, sizes


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ours", required=True,
                   help="our artifact tree (holds two_step/ + render_result/)")
    p.add_argument("--ours-render", default=None,
                   help="override render_result dir (default <ours>/render_result)")
    p.add_argument("--ref", required=True,
                   help="reference log tree (holds two_step/ + render_result/)")
    p.add_argument("--version", default="version_1")
    p.add_argument("--method", default="two_step")
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--end", type=int, default=50)
    p.add_argument("--sparsity", default="20")
    a = p.parse_args()
    ours_render = a.ours_render or os.path.join(a.ours, "render_result")

    split = FrameSplit(sparsity=a.sparsity)
    agg = {"matched": 0, "ours_rays": 0, "ref_rays": 0,
           "same_group": 0,
           "our_err_same": [], "ref_err_same": [],
           "our_err_diff": [], "ref_err_diff": []}
    per_frame = []
    for j in range(a.start, a.end):
        if not split.is_test_frame(j, a.start):
            continue
        f = j + 1
        o_src, o_err, o_sz = frame_tables(a.ours, ours_render, f,
                                          a.version, a.method)
        r_src, r_err, r_sz = frame_tables(a.ref,
                                          os.path.join(a.ref, "render_result"),
                                          f, a.version, a.method)
        # join rays on the (unique) gt point; both trees kept identical rays
        def keys(pts):
            q = np.round(pts.astype(np.float64), 3)
            return [t.tobytes() for t in q]
        o_idx = {k: i for i, k in enumerate(keys(o_src))}
        pairs = [(o_idx[k], i) for i, k in enumerate(keys(r_src))
                 if k in o_idx]
        oi = np.asarray([p_[0] for p_ in pairs])
        ri = np.asarray([p_[1] for p_ in pairs])
        same = o_sz[oi] == r_sz[ri]
        smaller = o_sz[oi] < r_sz[ri]   # our group has fewer children
        larger = o_sz[oi] > r_sz[ri]
        fr = {
            "frame": f, "ours_rays": int(o_sz.shape[0]),
            "ref_rays": int(r_sz.shape[0]), "matched": int(len(pairs)),
            "same_group_frac": float(same.mean()),
            "our_err_same": float(o_err[oi[same]].mean()),
            "ref_err_same": float(r_err[ri[same]].mean()),
            "our_err_diff": float(o_err[oi[~same]].mean()) if (~same).any() else None,
            "ref_err_diff": float(r_err[ri[~same]].mean()) if (~same).any() else None,
            "our_acc02_same": float((o_err[oi[same]] < 0.2).mean()),
            "ref_acc02_same": float((r_err[ri[same]] < 0.2).mean()),
            "frac_smaller": float(smaller.mean()),
            "our_err_smaller": float(o_err[oi[smaller]].mean()) if smaller.any() else None,
            "ref_err_smaller": float(r_err[ri[smaller]].mean()) if smaller.any() else None,
            "our_err_larger": float(o_err[oi[larger]].mean()) if larger.any() else None,
            "ref_err_larger": float(r_err[ri[larger]].mean()) if larger.any() else None,
        }
        per_frame.append(fr)
        print(json.dumps(fr), flush=True)
        agg["matched"] += len(pairs)
        agg["ours_rays"] += int(o_sz.shape[0])
        agg["ref_rays"] += int(r_sz.shape[0])
        agg["same_group"] += int(same.sum())
        agg["our_err_same"].append(o_err[oi[same]])
        agg["ref_err_same"].append(r_err[ri[same]])
        agg["our_err_diff"].append(o_err[oi[~same]])
        agg["ref_err_diff"].append(r_err[ri[~same]])

    for k in ("our_err_same", "ref_err_same", "our_err_diff", "ref_err_diff"):
        agg[k] = float(np.concatenate(agg[k]).mean()) if agg[k] else None
    agg["same_group_frac"] = agg["same_group"] / max(agg["matched"], 1)
    print(json.dumps({"aggregate": agg}), flush=True)


if __name__ == "__main__":
    main()
