"""End-to-end preprocessing pipeline: raw scans -> parent cloud -> ground
split -> clusters -> child-NeRF cells.

Replaces the reference's manual multi-tool flow (data_preprocess.md sections
1.2-1.5): ``pointcloud_fusion.py`` -> ROS ``plane_ground_filter`` node ->
``no_ground_cluster_kitti.py`` -> manual move/rename ->
``split_child_nerf_xyz.py`` — one command, no ROS:

    python -m pcnerf_tpu.preprocess.pipeline --dataset kitti \
        --root /root/reference/data/kitti/00/pcd_remove_dynamic \
        --poses /root/reference/data/kitti/00/poses.txt \
        --out /root/repo/artifacts/kitti00/1151_1200_view \
        --start 1150 --end 1200

Outputs (reference-compatible layout under --out):
    source.pcd, pose.pcd
    sub_pointcloud/points_ground.pcd, points_no_ground.pcd
    sub_pointcloud/split_child_nerf2/{1..N}.pcd
    child_aabbs.npy  (N, 6) [min, max] with the 0.025 pad NOT applied
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from pcnerf_tpu.config import FrameSplit
from pcnerf_tpu.data.pcd_io import read_pcd, write_pcd
from pcnerf_tpu.data.poses import load_kitti_poses, load_maicity_poses
from pcnerf_tpu.native import ground_filter, region_grow
from pcnerf_tpu.preprocess.fusion import fuse_scans
from pcnerf_tpu.preprocess.split import grid_split_cluster


def run_pipeline(dataset: str, root_dir: str, pose_path: str, out_dir: str,
                 data_start: int, data_end: int, *,
                 sparsity: str = "20",
                 range_delete=(3.0, 2.0, 1.25), interest_x=20.0,
                 interest_y=20.0, over_height=0.168, over_low=-2.0,
                 xy_threshold=0.5, z_threshold=0.5,
                 cluster_radius=0.35, min_cluster=15,
                 ground_th_dist=0.3, crop_bounds=None, verbose: bool = True):
    t0 = time.time()
    split = FrameSplit(sparsity=sparsity)
    os.makedirs(out_dir, exist_ok=True)
    sub_dir = os.path.join(out_dir, "sub_pointcloud")
    child_dir = os.path.join(sub_dir, "split_child_nerf2")
    os.makedirs(child_dir, exist_ok=True)

    def log(*a):
        if verbose:
            print(*a, flush=True)

    if dataset == "kitti":
        poses = load_kitti_poses(pose_path, data_start)
        pose_offset = 1
    else:
        poses = load_maicity_poses(pose_path)
        pose_offset = 0

    def load_scan(j):
        return read_pcd(os.path.join(root_dir, f"{j + 1}.pcd"))

    # 1. fusion (train frames only), in the rebased world frame
    fused, positions = fuse_scans(
        load_scan, poses, data_start, data_end,
        lambda j: split.is_train_frame(j, data_start),
        range_delete=range_delete, interest_x=interest_x, interest_y=interest_y,
        over_height=over_height if dataset == "kitti" else None,
        over_low=over_low if dataset == "kitti" else None,
        pose_offset=pose_offset)
    if crop_bounds is not None:
        # MaiCity-style explicit parent AABB: the reference pipeline builds
        # children only inside the CLI parent bounds (the training loader's
        # mask4 crop, ipb2dmapping.py:337-339)
        lo, hi = (np.asarray(crop_bounds[0]), np.asarray(crop_bounds[1]))
        fused = fused[((fused >= lo) & (fused <= hi)).all(axis=1)]
    write_pcd(os.path.join(out_dir, "source.pcd"), fused)
    write_pcd(os.path.join(out_dir, "pose.pcd"), positions)
    log(f"[fusion] {fused.shape[0]} points from "
        f"{positions.shape[0]} train scans  ({time.time()-t0:.1f}s)")
    log(f"[fusion] parent AABB {fused.min(0)} .. {fused.max(0)}")

    # 2. ground filtering.  th_dist defaults to the reference launch file's
    #    0.3 (plane_ground_filter.launch:8-31, tuned for KITTI's noisy
    #    scans); the MaiCity presets pass 0.125 — the synthetic scans have a
    #    perfectly planar ground, and 0.125 reproduces the reference's
    #    shipped test-ray group structure ((ray x child) rows within 1.1%
    #    vs +7.4% at 0.3; scripts/sweep_maicity_prep.py)
    g_mask, ng_mask = ground_filter(fused, th_dist=ground_th_dist)
    ground = fused[g_mask]
    no_ground = fused[ng_mask]
    write_pcd(os.path.join(sub_dir, "points_ground.pcd"), ground)
    write_pcd(os.path.join(sub_dir, "points_no_ground.pcd"), no_ground)
    log(f"[ground] {ground.shape[0]} ground / {no_ground.shape[0]} non-ground "
        f"({time.time()-t0:.1f}s)")

    # 3. clustering of the non-ground cloud
    labels, n_clusters = region_grow(no_ground, radius=cluster_radius,
                                     min_cluster=min_cluster)
    log(f"[cluster] {n_clusters} clusters, "
        f"{(labels < 0).sum()} unclustered points ({time.time()-t0:.1f}s)")

    # 4. child-NeRF grid split: each cluster (plus the ground cloud appended
    #    as the final cluster, data_preprocess.md section 1.5) is cut into
    #    ~1 m cells; every non-empty cell is a child NeRF.
    clusters = [no_ground[labels == c] for c in range(n_clusters)]
    clusters.append(ground)
    named_cells = []
    for ci, cluster_pts in enumerate(clusters):
        for cell_id, cell in enumerate(grid_split_cluster(
                cluster_pts, xy_threshold, z_threshold)):
            named_cells.append((f"{ci + 1}_{cell_id}.pcd", cell))
    # the reference's rename step lists the directory and renames in
    # lexicographic filename order (tool_script/rename2.py)
    named_cells.sort(key=lambda kv: kv[0])

    aabbs = np.empty((len(named_cells), 6), np.float64)
    for i, (_, cell) in enumerate(named_cells):
        write_pcd(os.path.join(child_dir, f"{i + 1}.pcd"), cell)
        aabbs[i, :3] = cell.min(axis=0)
        aabbs[i, 3:] = cell.max(axis=0)
    np.save(os.path.join(out_dir, "child_aabbs.npy"), aabbs)
    log(f"[split] {len(named_cells)} child NeRFs ({time.time()-t0:.1f}s)")

    meta = {
        "dataset": dataset, "data_start": data_start, "data_end": data_end,
        "sparsity": sparsity, "n_children": len(named_cells),
        "n_clusters": n_clusters, "fused_points": int(fused.shape[0]),
        "ground_th_dist": ground_th_dist,
        "parent_min": fused.min(0).tolist(), "parent_max": fused.max(0).tolist(),
    }
    with open(os.path.join(out_dir, "preprocess_meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", choices=["kitti", "maicity"], required=True)
    p.add_argument("--root", required=True)
    p.add_argument("--poses", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--start", type=int, required=True)
    p.add_argument("--end", type=int, required=True)
    p.add_argument("--sparsity", default="20")
    p.add_argument("--cell", type=float, default=0.5,
                   help="child grid cell size; 0.5 reproduces the reference's "
                        "15,333-child KITTI scene (the doc's 1.0 yields ~3.7k)")
    p.add_argument("--range-delete", type=float, nargs=3, default=None)
    p.add_argument("--crop", type=float, nargs=6, default=None,
                   help="xmin ymin zmin xmax ymax zmax parent-bound crop "
                        "(MaiCity uses -12 -12 -2 61 12 0.5)")
    p.add_argument("--th-dist", type=float, default=None,
                   help="plane-fit ground threshold; default 0.3 (KITTI "
                        "launch file) / 0.125 (MaiCity, synthetic planar "
                        "ground — see run_pipeline)")
    a = p.parse_args()
    rd = tuple(a.range_delete) if a.range_delete else (
        (3.0, 2.0, 1.25) if a.dataset == "kitti" else (2.0, 1.0, 0.5))
    crop = (a.crop[:3], a.crop[3:]) if a.crop else None
    th = a.th_dist if a.th_dist is not None else (
        0.3 if a.dataset == "kitti" else 0.125)
    meta = run_pipeline(a.dataset, a.root, a.poses, a.out, a.start, a.end,
                        sparsity=a.sparsity, range_delete=rd,
                        xy_threshold=a.cell, z_threshold=a.cell,
                        ground_th_dist=th, crop_bounds=crop)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
