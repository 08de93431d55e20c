"""Golden-data regression: our generated test rays vs the reference's shipped
artifacts (the de-facto regression fixture, SURVEY.md section 4).

Skipped unless both the shipped reference logs and our regenerated artifacts
exist (they are produced by pcnerf_tpu.preprocess.pipeline +
pcnerf_tpu.eval.testrays; see README quick start).
"""

import os

import numpy as np
import pytest

REF = "/root/reference/logs/kitti00/1151_1200_view/two_step"
OURS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "artifacts/kitti00/1151_1200_view/two_step")


@pytest.mark.parametrize("frame", [1153, 1178])
def test_test_ray_counts_match_shipped(frame):
    ref_f = f"{REF}/{frame}pcd/childnerf_ray_intersect"
    our_f = f"{OURS}/{frame}pcd/childnerf_ray_intersect"
    if not (os.path.exists(ref_f) and os.path.exists(our_f)):
        pytest.skip("artifacts not generated")
    ref = np.load(f"{ref_f}/all_ranges_child.npy")
    ours = np.load(f"{our_f}/all_ranges_child.npy")
    # regenerated child AABBs differ by ~6/15333 cells; row counts must agree
    # to within 0.1%
    assert abs(ours.shape[0] - ref.shape[0]) / ref.shape[0] < 1e-3
    refc = np.load(f"{ref_f}/other_interest_sub_nerf_number_child.npy").reshape(-1)
    oursc = np.load(f"{our_f}/other_interest_sub_nerf_number_child.npy").reshape(-1)
    h_ref = np.bincount(refc.clip(0, 8), minlength=9)
    h_our = np.bincount(oursc.clip(0, 8), minlength=9)
    assert (np.abs(h_ref - h_our) / np.maximum(h_ref, 1) < 5e-3).all()
