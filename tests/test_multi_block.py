"""Multi-block orchestration (tools/multi_block.py, reference README.md:56-59
scene blocking): block partitioning semantics + a synthetic two-block
preprocess->train smoke through the real pipeline and fit()."""

import json
import os

import numpy as np

from pcnerf_tpu.data.pcd_io import write_pcd
from pcnerf_tpu.tools.multi_block import block_data_config, block_ranges


def test_block_ranges_partition():
    assert block_ranges(1150, 1400, 50) == [
        (1150, 1200), (1200, 1250), (1250, 1300), (1300, 1350), (1350, 1400)]
    # tail block is short, never empty; exact cover, no overlap
    assert block_ranges(0, 7, 3) == [(0, 3), (3, 6), (6, 7)]
    assert block_ranges(5, 5, 3) == []
    for s, e in [(0, 101), (3, 10)]:
        bl = block_ranges(s, e, 4)
        assert bl[0][0] == s and bl[-1][1] == e
        assert all(a[1] == b[0] for a, b in zip(bl, bl[1:]))


def test_block_data_config_paths(tmp_path):
    d = block_data_config("kitti", "/r", "/p", str(tmp_path), 1150, 1200)
    assert d.data_start == 1150 and d.data_end == 1200
    assert f"block_1150_1200" in d.result_path
    assert d.sub_nerf_count == 0  # no meta yet -> placeholder


def _synth_scene(root, n_frames=10):
    """n_frames scans of a ground plane + one box cluster, poses along +x."""
    rng = np.random.default_rng(0)
    os.makedirs(root, exist_ok=True)
    gx, gy = np.meshgrid(np.arange(-5, 5, 0.25), np.arange(-5, 5, 0.25))
    ground = np.stack([gx.ravel(), gy.ravel(),
                       np.full(gx.size, -1.5)], axis=1)
    box = np.array([3.0, 0.0, -0.5]) + rng.normal(0, 0.25, (120, 3))
    scan = np.concatenate([ground, box]).astype(np.float32)
    pose_rows = []
    for j in range(n_frames):
        write_pcd(os.path.join(root, f"{j + 1}.pcd"),
                  scan + rng.normal(0, 0.01, scan.shape).astype(np.float32))
        T = np.eye(4)[:3]
        T[0, 3] = 0.5 * j
        pose_rows.append(" ".join(f"{v:.6f}" for v in T.reshape(-1)))
    poses = os.path.join(root, "poses.txt")
    with open(poses, "w") as f:
        f.write("\n".join(pose_rows) + "\n")
    return poses


def test_two_block_preprocess_train_smoke(tmp_path):
    from pcnerf_tpu.tools.multi_block import main
    root = str(tmp_path / "scans")
    poses = _synth_scene(root)
    out = str(tmp_path / "blocks")
    main(["--dataset", "maicity", "--root", root, "--poses", poses,
          "--out", out, "--start", "0", "--end", "10", "--block-frames", "5",
          "--phase", "all", "--dtype", "float32",
          "--max-steps", "2", "--batch-size", "64"])
    for bs, be in [(0, 5), (5, 10)]:
        art = os.path.join(out, f"block_{bs}_{be}")
        meta = json.load(open(os.path.join(art, "preprocess_meta.json")))
        assert meta["n_children"] > 0
        assert os.path.exists(os.path.join(art, "child_aabbs.npy"))
        # training ran: metrics logged under <block>/train
        mfile = os.path.join(art, "train", "metrics.jsonl")
        lines = [json.loads(l) for l in open(mfile)]
        assert any("loss" in l for l in lines)
        assert np.isfinite([l["loss"] for l in lines if "loss" in l]).all()


def test_block_index_selects_one_block():
    bl = block_ranges(0, 10, 5)
    assert [bl[1]] == [bl[i] for i in (1,)]
