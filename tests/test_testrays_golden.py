"""Golden-data regression: our generated test rays vs the reference's shipped
artifacts (the de-facto regression fixture, SURVEY.md section 4).

The reference ships, per test frame (``logs/<scene>/.../two_step/
<frame>pcd/childnerf_ray_intersect/``): ``all_ranges_child.npy`` (one
measured range per emitted (ray x child) row), ``other_interest_sub_nerf_
number_child.npy`` (group encoding: the FIRST row of each ray's group holds
groupsize-1 and the remaining rows hold 0 — ``np.zeros`` then
``tmp[0] = intersect_sub_nerf_num - 1``, eval_kitti_render.py:449-450,
790-791) and, for KITTI, ``true_in_all_child.npy`` (containment flags,
:716-719).  It does NOT ship ``all_rays_child.npy`` (the rows with the
near/far bounds), so the strongest cross-implementation check possible is
VALUE-level on what exists:

  - group decode must be self-consistent and the per-frame GROUP COUNT (the
    number of kept LiDAR rays after all crops) must match the reference
    EXACTLY — same points, same filters;
  - per-ray groups matched by range value quantized at 1 mm (bit-exact f32
    joins drop ~20-35% of rays to last-ulp differences in the world-frame
    transform order) — not count histograms — must agree on group size
    (how many children the ray intersects).

KITTI: our regenerated children (15,327 vs the reference scene's 15,333)
reproduce the shipped group structure almost exactly (100% range joins,
99.8% size agreement) — thresholds are tight.  MaiCity: with the
th_dist=0.125 ground threshold (preprocess/pipeline.py — recovered from
this very fingerprint) our 5,447 children land within 1.1% of the
reference's (ray x child) rows on every frame with 100% range joins and
~95% group-size agreement; the residual is the clustering boundary
difference documented in PARITY.md.

Skipped unless both the shipped reference logs and our regenerated
artifacts exist (produced by pcnerf_tpu.preprocess.pipeline +
scripts/make_test_rays.py or eval runs with --create-test-data).
"""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCENES = {
    "kitti00": dict(
        ref="/root/reference/logs/kitti00/1151_1200_view",
        ours=os.path.join(REPO, "artifacts/kitti00/1151_1200_view"),
        frames=[1153, 1178],
        row_tol=1e-3,        # total (ray x child) rows within 0.1%
        range_match=0.999,   # 1 mm-quantized range join coverage
        size_match=0.995,    # matched rays agreeing on group size
    ),
    "maicity00": dict(
        ref="/root/reference/logs/maicity00/maicity_00_1",
        ours=os.path.join(REPO, "artifacts/maicity00/maicity_00_1"),
        frames=[3, 28],
        # th_dist=0.125 artifacts (see preprocess/pipeline.py): measured
        # +0.7/+1.1% rows, 100% range joins, 95.0/95.7% size agreement
        row_tol=0.015,
        range_match=0.999,
        size_match=0.94,
    ),
}


def decode_groups(enc):
    """(starts, sizes) from the shipped encoding (first=k-1, rest=0)."""
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


def _groups(folder):
    """[(f32 range, size, true_in tuple or None)], one per LiDAR ray."""
    ranges = np.load(f"{folder}/all_ranges_child.npy").reshape(-1)
    enc = np.load(f"{folder}/other_interest_sub_nerf_number_child.npy")
    ti_path = f"{folder}/true_in_all_child.npy"
    true_in = (np.load(ti_path).reshape(-1).astype(np.int64)
               if os.path.exists(ti_path) else None)
    starts, sizes = decode_groups(enc)
    out = []
    for s, n in zip(starts, sizes):
        r = ranges[s:s + n]
        assert np.all(r == r[0]), "range varies within a group"
        ti = tuple(true_in[s:s + n]) if true_in is not None else None
        out.append((np.float32(r[0]), int(n), ti))
    return out


def _frame_dirs(scene, frame, mode="two_step"):
    sc = SCENES[scene]
    ref_f = f"{sc['ref']}/{mode}/{frame}pcd/childnerf_ray_intersect"
    our_f = f"{sc['ours']}/{mode}/{frame}pcd/childnerf_ray_intersect"
    if not (os.path.exists(f"{ref_f}/all_ranges_child.npy")
            and os.path.exists(f"{our_f}/all_ranges_child.npy")):
        pytest.skip("artifacts not generated")
    return sc, ref_f, our_f


@pytest.mark.parametrize("scene,frame", [
    ("kitti00", 1153), ("kitti00", 1178),
    ("maicity00", 3), ("maicity00", 28)])
def test_test_ray_groups_match_shipped_value_level(scene, frame):
    sc, ref_f, our_f = _frame_dirs(scene, frame)

    ref = _groups(ref_f)
    ours = _groups(our_f)
    # kept LiDAR rays after all crops: exact agreement (same points in,
    # same crop semantics) — measured equal on every frame of both scenes
    assert len(ours) == len(ref), f"ray count {len(ours)} != ref {len(ref)}"

    q = 1e-3   # 1 mm range-key quantization (see module docstring)
    ours_by_range = {}
    for r, n, ti in ours:
        ours_by_range.setdefault(round(float(r) / q), []).append((n, ti))

    matched = size_match = flag_match = flag_total = 0
    for r, n, ti in ref:
        cands = ours_by_range.get(round(float(r) / q))
        if not cands:
            continue
        matched += 1
        # among same-range candidates pick the closest group size
        best = min(cands, key=lambda c: abs(c[0] - n))
        if best[0] == n:
            size_match += 1
            if ti is not None and best[1] is not None:
                # compare the group's containment flags as a MULTISET: the
                # reference sorts group rows by child_near with an UNSTABLE
                # argsort (eval_kitti_render.py:779), so tied nears (adjacent
                # grid cells sharing a face) permute arbitrarily vs our
                # stable sort; per-position equality would count those as
                # mismatches (measured: 87% positionwise vs 97-99% multiset)
                flag_total += 1
                flag_match += int(tuple(sorted(ti)) == tuple(sorted(best[1])))

    assert matched / len(ref) > sc["range_match"], (
        f"only {matched}/{len(ref)} ranges matched")
    assert size_match / matched > sc["size_match"], (
        f"group sizes agree for only {size_match}/{matched} matched rays")
    if flag_total:
        assert flag_match / flag_total > 0.96, (
            f"true_in flag multisets agree {flag_match}/{flag_total}")


@pytest.mark.parametrize("scene,frame", [
    ("kitti00", 1153), ("kitti00", 1178),
    ("maicity00", 3), ("maicity00", 28)])
def test_test_ray_counts_match_shipped(scene, frame):
    sc, ref_f, our_f = _frame_dirs(scene, frame)
    ref = np.load(f"{ref_f}/all_ranges_child.npy")
    ours = np.load(f"{our_f}/all_ranges_child.npy")
    assert abs(ours.shape[0] - ref.shape[0]) / ref.shape[0] < sc["row_tol"]
