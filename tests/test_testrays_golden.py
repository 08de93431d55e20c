"""Golden-data regression: our generated test rays vs the reference's shipped
artifacts (the de-facto regression fixture, SURVEY.md section 4).

The reference ships, per test frame (``logs/kitti00/1151_1200_view/two_step/
<frame>pcd/childnerf_ray_intersect/``): ``all_ranges_child.npy`` (one
measured range per emitted (ray x child) row), ``other_interest_sub_nerf_
number_child.npy`` (group encoding: first row of a ray's group holds
groupsize-1, the rest -1, eval_kitti_render.py:779-791) and
``true_in_all_child.npy`` (containment flags, :716-719).  It does NOT ship
``all_rays_child.npy`` (the 14-col rows with the near/far bounds), so the
strongest cross-implementation check possible is VALUE-level on what exists:

  - per-LiDAR-ray groups matched by exact range value (f32) between the two
    implementations — not count histograms;
  - matched groups must agree on group size (how many children the ray
    intersects) and on the true_in containment flags.

A systematic bound error in our builder would change which children each
ray intersects and break the group-size agreement; count-preserving errors
that this still can't see (identical grouping, wrong near/far values) are
covered by the per-variant AABB oracle tests (tests/test_aabb.py) and the
end-to-end CD/F parity runs.

Skipped unless both the shipped reference logs and our regenerated
artifacts exist (produced by pcnerf_tpu.preprocess.pipeline +
pcnerf_tpu.eval.run / eval.testrays).
"""

import os
from collections import Counter

import numpy as np
import pytest

REF_ROOT = "/root/reference/logs/kitti00/1151_1200_view"
OURS_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts/kitti00/1151_1200_view")
REF = f"{REF_ROOT}/two_step"
OURS = f"{OURS_ROOT}/two_step"


def _groups(folder):
    """[(range, size, true_in-tuple or None)] reconstructed from the group
    encoding; asserts the range is constant within each group."""
    ranges = np.load(f"{folder}/all_ranges_child.npy").reshape(-1)
    enc = np.load(f"{folder}/other_interest_sub_nerf_number_child.npy"
                  ).reshape(-1).astype(np.int64)
    ti_path = f"{folder}/true_in_all_child.npy"
    true_in = (np.load(ti_path).reshape(-1).astype(np.int64)
               if os.path.exists(ti_path) else None)
    starts = np.flatnonzero(enc >= 0)
    sizes = enc[starts] + 1
    assert int((sizes).sum()) == enc.shape[0], "group encoding inconsistent"
    out = []
    for s, n in zip(starts, sizes):
        r = ranges[s:s + n]
        assert np.all(r == r[0])
        ti = tuple(true_in[s:s + n]) if true_in is not None else None
        out.append((np.float32(r[0]), int(n), ti))
    return out


@pytest.mark.parametrize("mode", ["two_step", "one_step"])
@pytest.mark.parametrize("frame", [1153, 1178])
def test_test_ray_groups_match_shipped_value_level(frame, mode):
    ref_f = f"{REF_ROOT}/{mode}/{frame}pcd/childnerf_ray_intersect"
    our_f = f"{OURS_ROOT}/{mode}/{frame}pcd/childnerf_ray_intersect"
    if not (os.path.exists(ref_f) and os.path.exists(our_f)):
        pytest.skip("artifacts not generated")

    ref = _groups(ref_f)
    ours = _groups(our_f)
    # total LiDAR rays kept after crops must agree to 0.1% (child-AABB
    # regeneration differs by ~6/15333 cells)
    assert abs(len(ours) - len(ref)) / len(ref) < 1e-3

    # exact-range join: same source points => bit-equal f32 ranges
    ours_by_range = {}
    for r, n, ti in ours:
        ours_by_range.setdefault(r.tobytes(), []).append((n, ti))

    matched = size_match = flag_match = flag_total = 0
    for r, n, ti in ref:
        cands = ours_by_range.get(r.tobytes())
        if not cands:
            continue
        matched += 1
        # among same-range candidates pick the closest group size
        best = min(cands, key=lambda c: abs(c[0] - n))
        if best[0] == n:
            size_match += 1
            if ti is not None and best[1] is not None:
                flag_total += len(ti)
                flag_match += sum(a == b for a, b in zip(ti, best[1]))

    assert matched / len(ref) > 0.995, f"only {matched}/{len(ref)} ranges matched"
    assert size_match / matched > 0.99, (
        f"group sizes agree for only {size_match}/{matched} matched rays")
    if flag_total:
        assert flag_match / flag_total > 0.99, (
            f"true_in flags agree {flag_match}/{flag_total}")


@pytest.mark.parametrize("frame", [1153, 1178])
def test_test_ray_counts_match_shipped(frame):
    ref_f = f"{REF}/{frame}pcd/childnerf_ray_intersect"
    our_f = f"{OURS}/{frame}pcd/childnerf_ray_intersect"
    if not (os.path.exists(ref_f) and os.path.exists(our_f)):
        pytest.skip("artifacts not generated")
    ref = np.load(f"{ref_f}/all_ranges_child.npy")
    ours = np.load(f"{our_f}/all_ranges_child.npy")
    assert abs(ours.shape[0] - ref.shape[0]) / ref.shape[0] < 1e-3
    refc = np.load(f"{ref_f}/other_interest_sub_nerf_number_child.npy").reshape(-1)
    oursc = np.load(f"{our_f}/other_interest_sub_nerf_number_child.npy").reshape(-1)
    h_ref = np.bincount(refc.clip(0, 8), minlength=9)
    h_our = np.bincount(oursc.clip(0, 8), minlength=9)
    assert (np.abs(h_ref - h_our) / np.maximum(h_ref, 1) < 5e-3).all()
