"""Pre-generate (and cache) the grouped test rays for every test frame of a
scene — the CPU half of evaluation, decoupled from the TPU render pass so it
can run while the chip trains (the reference's ``test_data_create=1`` then
``=0`` flow, eval_kitti_render.py:1084-1094).

    PYTHONPATH=. JAX_PLATFORMS=cpu python scripts/make_test_rays.py \
        --preset maicity00 --method 2
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pcnerf_tpu.eval.testrays import build_test_rays
from pcnerf_tpu.presets import kitti00_eval, maicity00_eval


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", choices=["kitti00", "maicity00"], required=True)
    p.add_argument("--method", type=int, default=2, choices=[1, 2])
    p.add_argument("--sparsity", default="20")
    p.add_argument("--force", action="store_true")
    a = p.parse_args()
    cfg = (kitti00_eval if a.preset == "kitti00" else maicity00_eval)(
        method=a.method, sparsity=a.sparsity)
    sub = "two_step" if a.method == 2 else "one_step"
    for j in range(cfg.data.data_start, cfg.data.data_end):
        if not cfg.data.split.is_test_frame(j, cfg.data.data_start):
            continue
        frame = j + 1
        marker = os.path.join(cfg.data.result_path, sub, f"{frame}pcd",
                              "childnerf_ray_intersect", "all_rays_child.npy")
        if os.path.exists(marker) and not a.force:
            print(f"frame {frame}: cached", flush=True)
            continue
        t0 = time.time()
        rays, _, counts, _, _, _ = build_test_rays(
            cfg.data, frame, depth_inference_method=a.method,
            result_path=cfg.data.result_path, verbose=False)
        print(f"frame {frame}: {rays.shape[0]} rows, "
              f"{(counts >= 0).sum()} rays ({time.time() - t0:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
