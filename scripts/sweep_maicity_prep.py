"""Sweep MaiCity preprocessing knobs against the reference's shipped test-ray
group structure (no training needed): for each variant, re-split the already-
fused parent cloud into child AABBs in memory, rebuild one test frame's
grouped rays, and score group-size agreement vs the reference artifacts.

Objective: our MaiCity children currently give +6% candidate rows per ray
vs the reference (diag_testray_groups.py); this finds which knob closes it.

    PYTHONPATH=. JAX_PLATFORMS=cpu python scripts/sweep_maicity_prep.py
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pcnerf_tpu.data.pcd_io import read_pcd
from pcnerf_tpu.eval.testrays import build_test_rays
from pcnerf_tpu.native import ground_filter, region_grow
from pcnerf_tpu.preprocess.split import grid_split_cluster
from pcnerf_tpu.presets import maicity00_data
from scripts.diag_testray_groups import decode_groups

REF = "/root/reference/logs/maicity00/maicity_00_1/two_step"
FRAMES = [28]


def make_aabbs(fused, *, th_dist=0.3, th_seeds=1.2, num_iter=3,
               sensor_height=1.73, radius=0.35, min_cluster=15,
               xy=0.5, z=0.5):
    g_mask, ng_mask = ground_filter(fused, th_dist=th_dist, th_seeds=th_seeds,
                                    num_iter=num_iter,
                                    sensor_height=sensor_height)
    ground, no_ground = fused[g_mask], fused[ng_mask]
    labels, k = region_grow(no_ground, radius=radius, min_cluster=min_cluster)
    clusters = [no_ground[labels == c] for c in range(k)]
    clusters.append(ground)
    cells = []
    for pts in clusters:
        cells.extend(grid_split_cluster(pts, xy, z))
    aabbs = np.empty((len(cells), 6), np.float64)
    for i, cell in enumerate(cells):
        aabbs[i, :3] = cell.min(axis=0)
        aabbs[i, 3:] = cell.max(axis=0)
    return aabbs, k, int(g_mask.sum())


def score(aabbs, cfg):
    """(rows_ratio, size_eq_rate, mean_dsize) over FRAMES vs the reference."""
    tot_ref = tot_our = matched = size_eq = 0
    dsum = 0.0
    for f in FRAMES:
        _, rng_our, counts, _, _, _ = build_test_rays(
            cfg, f, depth_inference_method=2,
            aabbs_unpadded=aabbs.astype(np.float32), verbose=False)
        rd = f"{REF}/{f}pcd/childnerf_ray_intersect"
        rng_ref = np.load(f"{rd}/all_ranges_child.npy").reshape(-1)
        enc_ref = np.load(f"{rd}/other_interest_sub_nerf_number_child.npy")
        s_ref, z_ref = decode_groups(enc_ref)
        s_our, z_our = decode_groups(counts)
        tot_ref += int(z_ref.sum())
        tot_our += int(z_our.sum())
        by = {}
        for s, n in zip(s_our, z_our):
            by.setdefault(round(float(rng_our[s]) / 1e-3), []).append(int(n))
        for s, n in zip(s_ref, z_ref):
            c = by.get(round(float(rng_ref[s]) / 1e-3))
            if not c:
                continue
            matched += 1
            best = min(c, key=lambda x: abs(x - n))
            size_eq += int(best == n)
            dsum += best - n
    return tot_our / tot_ref, size_eq / max(matched, 1), dsum / max(matched, 1)


def main():
    cfg = maicity00_data()
    fused = read_pcd(os.path.join(cfg.result_path, "source.pcd")
                     ).astype(np.float32)
    print(f"fused cloud: {fused.shape[0]} points", flush=True)

    variants = [
        ("th_dist 0.10", dict(th_dist=0.10)),
        ("th_dist 0.05", dict(th_dist=0.05)),
        ("th_dist 0.125", dict(th_dist=0.125)),
        ("th_dist 0.15 + cell z 0.4", dict(th_dist=0.15, z=0.4)),
        ("th_dist 0.10 + cell z 0.4", dict(th_dist=0.10, z=0.4)),
    ]
    for name, kw in variants:
        t0 = time.time()
        aabbs, k, n_ground = make_aabbs(fused, **kw)
        rows, eq, dmean = score(aabbs, cfg)
        print(f"{name:40s} children {aabbs.shape[0]:5d} clusters {k:3d} "
              f"ground {n_ground} | rows x{rows:.4f}, size== {eq:.4f}, "
              f"mean dsize {dmean:+.3f}  ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
