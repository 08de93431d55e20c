"""Stage the corrected-ground-threshold MaiCity artifacts (th_dist 0.125,
see preprocess/pipeline.py) in parallel with the running TPU queue: full
preprocessing + train/val ray buffers + eval test rays, all CPU-side, into
``<canonical>_stage`` dirs.  Swap into place afterwards with:

    mv artifacts/maicity00/maicity_00_1 artifacts/maicity00/maicity_00_1_th300
    mv artifacts/maicity00/maicity_00_1_stage artifacts/maicity00/maicity_00_1
    (same for the _s50 dir)

    PYTHONPATH=. JAX_PLATFORMS=cpu python scripts/stage_maicity_refresh.py
"""

import dataclasses
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pcnerf_tpu.data.raybuffer import load_or_build
from pcnerf_tpu.eval.testrays import build_test_rays
from pcnerf_tpu.preprocess.pipeline import run_pipeline
from pcnerf_tpu.presets import REF_DATA, maicity00_data


def stage(sparsity: str):
    base = maicity00_data(sparsity)
    out = base.result_path + "_stage"
    t0 = time.time()
    run_pipeline(
        "maicity", f"{REF_DATA}/maicity/00/pcd",
        f"{REF_DATA}/maicity/00/poses.txt", out, 0, 50,
        sparsity=sparsity, range_delete=(2.0, 1.0, 0.5),
        ground_th_dist=0.125,
        crop_bounds=((-12.0, -12.0, -2.0), (61.0, 12.0, 0.5)))
    cfg = dataclasses.replace(
        base, result_path=out,
        subnerf_path=os.path.join(out, "sub_pointcloud/split_child_nerf2"))
    for split in ("train", "val"):
        rays, _ = load_or_build(cfg, split)
        print(f"[stage s{sparsity}] {split} rays {rays.shape} "
              f"({time.time()-t0:.0f}s)", flush=True)
    for method in (2, 1):
        for j in range(cfg.data_start, cfg.data_end):
            if not cfg.split.is_test_frame(j, cfg.data_start):
                continue
            rays, _, _, _, _, _ = build_test_rays(
                cfg, j + 1, depth_inference_method=method, result_path=out,
                verbose=False)
            print(f"[stage s{sparsity}] m{method} frame {j+1}: "
                  f"{rays.shape[0]} rows ({time.time()-t0:.0f}s)", flush=True)
        if sparsity != "20":
            break   # one-step rays only needed for the headline sparsity


if __name__ == "__main__":
    stage("20")
    stage("50")
