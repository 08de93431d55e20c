"""Offline metric reporter: AvgErr / Acc@0.2 / CD / F-score per test frame.

Reference: ``logs/*/render_result/print_metrics.py`` (C25) — identical
semantics including the count-aligned truncation between gt and inference
clouds, per-frame reporting, and the ``{version}_metric_tmp.npy`` artifact.

    python -m pcnerf_tpu.eval.report --result-dir <dir> --version version_1 \
        --method two-step --start 1150 --end 1200

The result dir must hold ``source/{frame}_source.pcd``,
``source/{frame}_pose.pcd`` and ``infer/{version}_{frame}_{method}.pcd``
(both our outputs and the reference's shipped artifacts work).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from pcnerf_tpu.config import FrameSplit
from pcnerf_tpu.data.pcd_io import read_pcd
from pcnerf_tpu.eval.metrics import chamfer_fscore


def error_metrics(result_dir: str, version: str, method: str,
                  start: int, end: int, threshold: float = 0.2,
                  *, use_device: bool = True,
                  split: FrameSplit = FrameSplit(), verbose: bool = True,
                  save: bool = True):
    """Score the test frames selected by ``split`` (default: the 20% preset,
    reproducing print_metrics.py's hardcoded ``(j+1-3)%5==0``).  Any
    SPARSITY_PRESETS key works — the reference's sparsity study
    (``README.md:56-104``) required editing three source files to change it."""
    rows = []
    for j in range(start, end):
        if not split.is_test_frame(j, start):
            continue
        frame = j + 1
        gt = read_pcd(os.path.join(result_dir, "source", f"{frame}_source.pcd"))
        pose = read_pcd(os.path.join(result_dir, "source",
                                     f"{frame}_pose.pcd")).reshape(-1)[:3]
        suffix = "one_step" if method == "one-step" else "two_step"
        pred = read_pcd(os.path.join(result_dir, "infer",
                                     f"{version}_{frame}_{suffix}.pcd"))
        # count-aligned truncation (print_metrics.py:104-117)
        n = min(gt.shape[0], pred.shape[0])
        gt_t, pred_t = gt[:n], pred[:n]
        cd, f = chamfer_fscore(pred_t, gt_t, threshold, use_device=use_device)
        gt_r = np.linalg.norm(gt_t - pose[None, :], axis=1)
        pred_r = np.linalg.norm(pred_t - pose[None, :], axis=1)
        abs_err = float(np.abs(pred_r - gt_r).mean())
        acc = float((np.abs(pred_r - gt_r) < threshold).mean() * 100.0)
        rows.append((frame, abs_err, acc, cd, f))
        if verbose:
            print(f"frame {frame}: avg_err={abs_err:.6f} acc={acc:.4f} "
                  f"cd={cd:.6f} f={f:.6f}", flush=True)

    arr = np.asarray([[r[1], r[2], r[3], r[4]] for r in rows])
    mean = arr.mean(axis=0)
    if verbose:
        print(("\t{:>10}" * 4).format("Avg. Error", "Acc", "CD", "F"))
        print(("\t{: 10.6f}" * 4).format(*mean))
    if save:
        metrics_np = np.zeros((110, 4))
        metrics_np[:arr.shape[0]] = arr
        np.save(os.path.join(result_dir, f"{version}_metric_tmp"), metrics_np)
    return {"avg_error": float(mean[0]), "acc": float(mean[1]),
            "cd": float(mean[2]), "fscore": float(mean[3]),
            "per_frame": rows}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--result-dir", required=True)
    p.add_argument("--version", required=True)
    p.add_argument("--method", default="two-step",
                   choices=["two-step", "one-step"])
    p.add_argument("--start", type=int, required=True)
    p.add_argument("--end", type=int, required=True)
    p.add_argument("--threshold", type=float, default=0.2)
    p.add_argument("--cpu", action="store_true",
                   help="use the native CPU NN instead of the device path")
    p.add_argument("--sparsity", default="20",
                   help="SPARSITY_PRESETS key selecting which frames are "
                        "test frames (default 20)")
    a = p.parse_args()
    error_metrics(a.result_dir, a.version, a.method, a.start, a.end,
                  a.threshold, use_device=not a.cpu,
                  split=FrameSplit(sparsity=a.sparsity))


if __name__ == "__main__":
    main()
