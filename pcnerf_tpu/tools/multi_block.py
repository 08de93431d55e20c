"""Multi-block scene orchestration: a long trajectory as a sequence of
parent-NeRF blocks.

The reference realizes multi-block scenes as independent experiment dirs —
one bash config per road block (README.md:56-59, SURVEY.md section 2.4
"scene blocking").  Here a sequence range is partitioned into fixed-length
frame windows; each block gets its own preprocessing artifacts, ray buffers,
training run, and evaluation, driven by one command:

    python -m pcnerf_tpu.tools.multi_block --dataset kitti \
        --root .../pcd --poses .../poses.txt --out artifacts/kitti00_blocks \
        --start 1150 --end 1400 --block-frames 50 --phase all

Blocks are independent: on a pod slice they parallelize trivially
(--block-index selects one block per process; scheduling across hosts rides
DCN, nothing is shared but the poses file).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

from pcnerf_tpu.config import DataConfig, TrainConfig
from pcnerf_tpu.preprocess.pipeline import run_pipeline


def block_ranges(start: int, end: int, block_frames: int):
    """[(block_start, block_end)] windows covering [start, end)."""
    out = []
    s = start
    while s < end:
        out.append((s, min(s + block_frames, end)))
        s += block_frames
    return out


def block_data_config(dataset: str, root: str, poses: str, out_dir: str,
                      bs: int, be: int) -> DataConfig:
    art = os.path.join(out_dir, f"block_{bs}_{be}")
    rd = (3.0, 2.0, 1.25) if dataset == "kitti" else (2.0, 1.0, 0.5)
    meta_p = os.path.join(art, "preprocess_meta.json")
    n_children = 0
    if os.path.exists(meta_p):
        with open(meta_p) as f:
            n_children = json.load(f)["n_children"]
    return DataConfig(
        dataset=dataset, root_dir=root, pose_path=poses,
        subnerf_path=os.path.join(art, "sub_pointcloud/split_child_nerf2"),
        parentnerf_path=os.path.join(art, "source.pcd"),
        result_path=art, data_start=bs, data_end=be,
        sub_nerf_count=n_children, surface_expand=0.05, range_delete=rd)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", choices=["kitti", "maicity"], required=True)
    p.add_argument("--root", required=True)
    p.add_argument("--poses", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--start", type=int, required=True)
    p.add_argument("--end", type=int, required=True)
    p.add_argument("--block-frames", type=int, default=50)
    p.add_argument("--block-index", type=int, default=None,
                   help="process only this block (multi-host sharding)")
    p.add_argument("--phase", choices=["preprocess", "train", "eval", "all"],
                   default="all")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--sparsity", default="20")
    p.add_argument("--max-steps", type=int, default=None,
                   help="cap each block's training (smoke runs)")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--epochs", type=int, default=1)
    a = p.parse_args(argv)

    blocks = block_ranges(a.start, a.end, a.block_frames)
    if a.block_index is not None:
        blocks = [blocks[a.block_index]]
    for bs, be in blocks:
        art = os.path.join(a.out, f"block_{bs}_{be}")
        print(f"=== block [{bs}, {be}) -> {art}", flush=True)
        if a.phase in ("preprocess", "all"):
            run_pipeline(a.dataset, a.root, a.poses, art, bs, be,
                         sparsity=a.sparsity)
        if a.phase in ("train", "all"):
            from pcnerf_tpu.config import LossConfig, ModelConfig, RenderConfig
            from pcnerf_tpu.train.loop import fit
            data = block_data_config(a.dataset, a.root, a.poses, a.out, bs, be)
            cfg = TrainConfig(
                exp_name=f"blocks/block_{bs}_{be}",
                num_epochs=a.epochs,
                model=ModelConfig(compute_dtype=a.dtype),
                loss=dataclasses.replace(LossConfig(),
                                         sub_nerf_count=data.sub_nerf_count),
                data=data)
            if a.batch_size:
                cfg = dataclasses.replace(cfg, batch_size=a.batch_size,
                                          batch_size_val=a.batch_size)
            fit(cfg, out_dir=os.path.join(art, "train"),
                skip_sanity_val=True, max_steps=a.max_steps)
        if a.phase in ("eval", "all"):
            res = eval_block(a, art, bs, be)
            print(f"=== block [{bs}, {be}) metrics: "
                  f"{json.dumps({k: v for k, v in res.items() if k != 'per_frame'})}",
                  flush=True)


def eval_block(a, art: str, bs: int, be: int) -> dict:
    """Per-block two-step render + offline CD/F report — the reference's
    per-block deliverable (its README.md:56-59 runs *_eval.bash +
    print_metrics.py by hand for every block dir).  Renders every test frame
    of the block with the block's trained checkpoint, then scores with the
    exact print_metrics.py-semantics reporter."""
    import shutil

    from pcnerf_tpu.config import EvalConfig, ModelConfig
    from pcnerf_tpu.eval.report import error_metrics
    from pcnerf_tpu.eval.run import evaluate

    data = block_data_config(a.dataset, a.root, a.poses, a.out, bs, be)
    if a.dataset == "kitti":
        # the reference evaluates with the smaller vehicle-body crop than it
        # trains with (presets.kitti00_eval note)
        data = dataclasses.replace(data, range_delete=(2.0, 1.0, 0.5))
    data = dataclasses.replace(
        data, split=dataclasses.replace(data.split, sparsity=a.sparsity))
    # eval under the SAME dtype the block was trained with (--dtype), not a
    # hardcoded bfloat16 (ADVICE r4)
    ecfg = EvalConfig(depth_inference_method=2, n_samples=4096,
                      n_importance=8192, batch_size=4096,
                      model=ModelConfig(compute_dtype=a.dtype), data=data)
    result_dir = os.path.join(art, "render_result")
    os.makedirs(os.path.join(result_dir, "infer"), exist_ok=True)
    os.makedirs(os.path.join(result_dir, "source"), exist_ok=True)
    ckpt = os.path.join(art, "train", "checkpoints", "best")
    prefix = os.path.join(result_dir, "infer", "version_1_")
    evaluate(ecfg, ckpt, prefix, create_test_data=False)
    for j in range(bs, be):
        if not data.split.is_test_frame(j, bs):
            continue
        f = j + 1
        src = os.path.join(art, "two_step", f"{f}pcd",
                           "childnerf_ray_intersect")
        for suffix in ("source", "pose"):
            s = os.path.join(src, f"{f}_{suffix}.pcd")
            d = os.path.join(result_dir, "source", f"{f}_{suffix}.pcd")
            if os.path.exists(d):
                continue
            if not os.path.exists(s):
                # fail HERE, naming the missing two_step artifact, instead
                # of letting error_metrics hit a bare FileNotFoundError on
                # the copy destination far from the cause (ADVICE r4): the
                # usual cause is a cached all_rays_child.npy whose
                # source/pose pcds were cleaned — rebuild with
                # create_test_data
                raise FileNotFoundError(
                    f"expected two_step gt artifact missing: {s} "
                    "(cached ray npys without their source/pose pcds? "
                    "re-run the test-ray builder for this block)")
            shutil.copy(s, d)
    return error_metrics(result_dir, "version_1", "two-step", bs, be,
                         use_device=False, split=data.split)


if __name__ == "__main__":
    main()
