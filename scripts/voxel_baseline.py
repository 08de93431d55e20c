"""Classical voxel-raycast baseline rows — the paper's comparison method.

Reference: ``tool_script/reconstruction_raycast_kitti.py`` (C33): voxelize
the fused train map (``source.pcd``), then for every test point cast the
ray from the frame's sensor origin and infer the mean of front-facing voxel
centers within the smallest sufficient perpendicular-distance threshold
(multiples of voxel_size — :233-246), and score AvgErr/Acc/CD/F against the
frame's gt cloud with print_metrics semantics (:313-360).  The reference
runs voxel sizes 0.05-0.75 m; rows here anchor the NeRF result matrix on
the SAME per-frame gt clouds the NeRF evals use (our test-ray builder's
``{frame}_source.pcd`` / ``{frame}_pose.pcd``).

    PYTHONPATH=. python scripts/voxel_baseline.py --preset maicity00 \
        --voxels 0.75 0.5 0.25
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pcnerf_tpu.data.pcd_io import read_pcd
from pcnerf_tpu.eval.metrics import chamfer_fscore
from pcnerf_tpu.presets import kitti00_eval, maicity00_eval, override_art_dir
from pcnerf_tpu.tools.voxel_raycast import voxel_raycast


def frame_gt(cfg, frame: int):
    """Per-frame gt cloud + sensor origin, from the test-ray builder's
    side artifacts (built lazily if this artifact tree has no eval yet)."""
    d = os.path.join(cfg.data.result_path, "two_step", f"{frame}pcd",
                     "childnerf_ray_intersect")
    src = os.path.join(d, f"{frame}_source.pcd")
    pose = os.path.join(d, f"{frame}_pose.pcd")
    if not (os.path.exists(src) and os.path.exists(pose)):
        from pcnerf_tpu.eval.testrays import build_test_rays
        build_test_rays(cfg.data, frame, depth_inference_method=2,
                        result_path=cfg.data.result_path)
    return read_pcd(src), read_pcd(pose).reshape(-1)[:3]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", choices=["kitti00", "maicity00"], required=True)
    p.add_argument("--sparsity", default="20")
    p.add_argument("--voxels", type=float, nargs="+", default=[0.75, 0.5, 0.25])
    p.add_argument("--art-dir", default=None)
    p.add_argument("--threshold", type=float, default=0.2)
    a = p.parse_args()

    cfg = (kitti00_eval if a.preset == "kitti00" else maicity00_eval)(
        method=2, sparsity=a.sparsity)
    if a.art_dir:
        import dataclasses
        cfg = dataclasses.replace(cfg,
                                  data=override_art_dir(cfg.data, a.art_dir))
    map_pts = read_pcd(os.path.join(cfg.data.result_path, "source.pcd"))
    frames = [j + 1 for j in range(cfg.data.data_start, cfg.data.data_end)
              if cfg.data.split.is_test_frame(j, cfg.data.data_start)]
    print(f"[voxel_baseline] {a.preset} sparsity={a.sparsity}: map "
          f"{map_pts.shape[0]} pts, {len(frames)} test frames", flush=True)

    for voxel in a.voxels:
        rows = []
        t0 = time.time()
        for frame in frames:
            gt, origin = frame_gt(cfg, frame)
            pred = voxel_raycast(map_pts, gt, origin, voxel)
            cd, f = chamfer_fscore(pred, gt, a.threshold, use_device=False)
            gt_r = np.linalg.norm(gt - origin[None, :], axis=1)
            pred_r = np.linalg.norm(pred - origin[None, :], axis=1)
            abs_err = float(np.abs(pred_r - gt_r).mean())
            acc = float((np.abs(pred_r - gt_r) < a.threshold).mean() * 100.0)
            rows.append((abs_err, acc, cd, f))
            print(f"  voxel {voxel}: frame {frame} avg_err={abs_err:.4f} "
                  f"acc={acc:.2f} cd={cd:.4f} f={f:.4f}", flush=True)
        mean = np.asarray(rows).mean(axis=0)
        print(json.dumps({
            "baseline": "voxel_raycast", "preset": a.preset,
            "sparsity": a.sparsity, "voxel": voxel,
            "avg_error": round(float(mean[0]), 6),
            "acc": round(float(mean[1]), 4),
            "cd": round(float(mean[2]), 6),
            "fscore": round(float(mean[3]), 6),
            "seconds": round(time.time() - t0, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
