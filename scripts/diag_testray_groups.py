"""Diagnostic: compare our generated test-ray group structure against the
reference's shipped artifacts, per frame, value-level.

The reference ships per test frame (``logs/<scene>/.../{two,one}_step/
<frame>pcd/childnerf_ray_intersect/``) the measured range of every emitted
(ray x child) row and the group encoding — a fingerprint of which children
each test ray intersects.  Divergence here means the child-AABB geometry
(preprocessing) differs; agreement with worse CD/F means the model or the
renderer is at fault.  Used to localize the MaiCity quality gap
(VERDICT.md round 1, "Next round" item 2).

    PYTHONPATH=. python scripts/diag_testray_groups.py --scene maicity00
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCENES = {
    "kitti00": {
        "ref": "/root/reference/logs/kitti00/1151_1200_view",
        "ours": os.path.join(REPO, "artifacts/kitti00/1151_1200_view"),
        "frames": [1153, 1158, 1163, 1168, 1173, 1178, 1183, 1188, 1193, 1198],
    },
    "maicity00": {
        "ref": "/root/reference/logs/maicity00/maicity_00_1",
        "ours": os.path.join(REPO, "artifacts/maicity00/maicity_00_1"),
        "frames": [3, 8, 13, 18, 23, 28, 33, 38, 43, 48],
    },
}


def decode_groups(enc):
    """Sequential decode of the shipped encoding: the FIRST row of each
    ray's group holds groupsize-1 and the remaining rows hold 0
    (eval_kitti_render.py:449-450,790-791 — ``np.zeros`` then
    ``tmp[0] = intersect_sub_nerf_num - 1``).  Returns (starts, sizes)."""
    enc = np.asarray(enc).reshape(-1).astype(np.int64)
    starts, sizes = [], []
    i, n = 0, enc.shape[0]
    while i < n:
        k = int(enc[i]) + 1
        assert k >= 1 and i + k <= n and (k == 1 or not enc[i + 1:i + k].any()), \
            f"inconsistent group encoding at row {i}"
        starts.append(i)
        sizes.append(k)
        i += k
    return np.asarray(starts), np.asarray(sizes)


def groups(folder):
    """{f32-range-bytes: [group sizes]} + group count + row count."""
    ranges = np.load(f"{folder}/all_ranges_child.npy").reshape(-1)
    enc = np.load(f"{folder}/other_interest_sub_nerf_number_child.npy")
    starts, sizes = decode_groups(enc)
    by_range = {}
    for s, n in zip(starts, sizes):
        by_range.setdefault(
            np.float32(ranges[s]).tobytes(), []).append(int(n))
    return by_range, len(starts), int(sizes.sum())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene", choices=sorted(SCENES), required=True)
    p.add_argument("--mode", default="two_step",
                   choices=["two_step", "one_step"])
    a = p.parse_args()
    sc = SCENES[a.scene]

    tot = dict(ref_rays=0, our_rays=0, matched=0, size_eq=0,
               ref_rows=0, our_rows=0, our_bigger=0, our_smaller=0)
    for f in sc["frames"]:
        rf = f"{sc['ref']}/{a.mode}/{f}pcd/childnerf_ray_intersect"
        of = f"{sc['ours']}/{a.mode}/{f}pcd/childnerf_ray_intersect"
        if not (os.path.exists(f"{rf}/all_ranges_child.npy")
                and os.path.exists(f"{of}/all_ranges_child.npy")):
            print(f"frame {f}: missing artifacts, skipped")
            continue
        ref_by, ref_n, ref_rows = groups(rf)
        our_by, our_n, our_rows = groups(of)
        matched = size_eq = bigger = smaller = 0
        dsizes = []
        for key, ref_sizes in ref_by.items():
            ours = our_by.get(key)
            if ours is None:
                continue
            for n in ref_sizes:
                matched += 1
                best = min(ours, key=lambda c: abs(c - n))
                if best == n:
                    size_eq += 1
                elif best > n:
                    bigger += 1
                    dsizes.append(best - n)
                else:
                    smaller += 1
                    dsizes.append(best - n)
        print(f"frame {f}: rays ref {ref_n} ours {our_n} "
              f"({100 * our_n / ref_n:.2f}%), rows ref {ref_rows} ours "
              f"{our_rows}, range-matched {matched}/{ref_n} "
              f"({100 * matched / ref_n:.2f}%), size== {size_eq}/{matched} "
              f"({100 * size_eq / max(matched, 1):.2f}%), ours bigger "
              f"{bigger} smaller {smaller}"
              + (f", mean dsize {np.mean(dsizes):+.2f}" if dsizes else ""))
        tot["ref_rays"] += ref_n
        tot["our_rays"] += our_n
        tot["matched"] += matched
        tot["size_eq"] += size_eq
        tot["ref_rows"] += ref_rows
        tot["our_rows"] += our_rows
        tot["our_bigger"] += bigger
        tot["our_smaller"] += smaller
    if tot["ref_rays"]:
        print(f"TOTAL: rays {tot['our_rays']}/{tot['ref_rays']} "
              f"({100 * tot['our_rays'] / tot['ref_rays']:.2f}%), matched "
              f"{100 * tot['matched'] / tot['ref_rays']:.2f}%, size== "
              f"{100 * tot['size_eq'] / max(tot['matched'], 1):.2f}%, "
              f"rows {tot['our_rows']}/{tot['ref_rows']} "
              f"(bigger {tot['our_bigger']} / smaller {tot['our_smaller']})")


if __name__ == "__main__":
    sys.exit(main())
