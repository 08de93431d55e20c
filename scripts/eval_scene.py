"""End-to-end scene evaluation: render all test frames, assemble the
reference render_result layout, and report metrics.

    PYTHONPATH=. python scripts/eval_scene.py --preset kitti00 \
        --ckpt logs/kitti00/1151_1200_view/pcnerf/checkpoints/best \
        --version version_1 --method 2
"""

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pcnerf_tpu.eval.report import error_metrics
from pcnerf_tpu.eval.run import evaluate
from pcnerf_tpu.presets import kitti00_eval, maicity00_eval


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", choices=["kitti00", "maicity00"], required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--version", default="version_1")
    p.add_argument("--method", type=int, default=2)
    p.add_argument("--sparsity", default="20")
    p.add_argument("--pallas", action="store_true")
    p.add_argument("--fused-embed", default=None,
                   choices=["auto", "on", "off"],
                   help="Pallas fused-embedding matvec for the collapsed "
                        "occupancy passes (ModelConfig.fused_embed)")
    p.add_argument("--result-dir", default=None)
    p.add_argument("--art-dir", default=None,
                   help="evaluate against this preprocessing tree instead "
                        "of the preset's (preprocessing ablations)")
    p.add_argument("--rays-from", default=None,
                   help="load pre-built grouped test rays from this result "
                        "tree instead of building them (the "
                        "test_data_create=0 path of "
                        "eval_kitti_render.py:246-254).  Useful to score one "
                        "checkpoint on another artifact tree's rays (e.g. a "
                        "ground-threshold sweep variant) to isolate builder "
                        "differences from model quality.  NOTE: the "
                        "reference's shipped logs ship only ranges/counts/"
                        "flags, not all_rays_child.npy, so the donor must be "
                        "a tree this framework built.")
    a = p.parse_args()

    import dataclasses
    cfg = (kitti00_eval if a.preset == "kitti00" else maicity00_eval)(
        method=a.method, sparsity=a.sparsity)
    if a.art_dir:
        from pcnerf_tpu.presets import override_art_dir
        cfg = dataclasses.replace(cfg,
                                  data=override_art_dir(cfg.data, a.art_dir))
    if a.pallas:
        cfg = dataclasses.replace(cfg, use_pallas=True)
    if a.fused_embed is not None:
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, fused_embed=a.fused_embed))
    if a.rays_from:
        if a.result_dir is None:
            p.error("--rays-from requires --result-dir (outputs must not "
                    "land in the donor tree)")
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, result_path=a.rays_from))
    result_dir = a.result_dir or os.path.join(
        cfg.data.result_path, "render_result")
    os.makedirs(os.path.join(result_dir, "infer"), exist_ok=True)
    os.makedirs(os.path.join(result_dir, "source"), exist_ok=True)

    prefix = os.path.join(result_dir, "infer", a.version + "_")
    times = evaluate(cfg, a.ckpt, prefix, create_test_data=False)
    print(json.dumps({"frame_seconds": times}))

    # assemble gt AFTER evaluate(): on a fresh artifacts dir the test-ray
    # builder only writes {frame}_source/_pose.pcd next to the ray npys
    # during evaluate()'s lazy load_test_rays (the reference's
    # multi_frame_* does the same)
    sub = "two_step" if a.method == 2 else "one_step"
    for j in range(cfg.data.data_start, cfg.data.data_end):
        if not cfg.data.split.is_test_frame(j, cfg.data.data_start):
            continue
        f = j + 1
        src = os.path.join(cfg.data.result_path, sub, f"{f}pcd",
                           "childnerf_ray_intersect")
        for suffix in ("source", "pose"):
            s = os.path.join(src, f"{f}_{suffix}.pcd")
            d = os.path.join(result_dir, "source", f"{f}_{suffix}.pcd")
            if os.path.exists(s) and not os.path.exists(d):
                shutil.copy(s, d)

    res = error_metrics(result_dir, a.version,
                        "two-step" if a.method == 2 else "one-step",
                        cfg.data.data_start, cfg.data.data_end,
                        use_device=False, split=cfg.data.split)
    print(json.dumps({k: v for k, v in res.items() if k != "per_frame"}))


if __name__ == "__main__":
    main()
