"""Regression tests for the on-device Chamfer/F metric (VERDICT round-1 #1).

The round-1 device path computed the expanded square ``|q|^2 - 2 q.t + |t|^2``
with a default-precision matmul; on TPU (bf16 accumulate) the min over ~1e5
noisy candidates was biased toward zero and inflated every headline number.
These tests pin the fixed path against:

  1. a brute-force f64 oracle on an adversarial cloud far from the origin
     (where cancellation is worst);
  2. the exact CPU native path on the reference's own shipped artifacts
     (``/root/reference/logs/maicity00/maicity_00_1/render_result/``);
  3. BASELINE.md itself: CD 0.171849 / F 0.955458 on those artifacts, the
     values that ``print_metrics.py`` produces (recomputed in BASELINE.md).
"""

import os

import numpy as np
import pytest

from pcnerf_tpu.eval.metrics import chamfer_fscore, nn_dists_device

REF_RESULT = "/root/reference/logs/maicity00/maicity_00_1/render_result"


def _brute_nn(target, query):
    t = np.asarray(target, np.float64)
    q = np.asarray(query, np.float64)
    out = np.empty(q.shape[0])
    for s in range(0, q.shape[0], 512):
        d2 = ((q[s:s + 512, None, :] - t[None, :, :]) ** 2).sum(-1)
        out[s:s + 512] = np.sqrt(d2.min(axis=1))
    return out


def test_device_nn_matches_f64_oracle_far_from_origin():
    rng = np.random.default_rng(0)
    # worst case for the expanded square: points ~100 m out, cm-scale NN gaps
    base = rng.uniform(-30, 30, (4000, 3)).astype(np.float32) + \
        np.array([80.0, -60.0, 5.0], np.float32)
    query = (base[:2500] + rng.normal(0, 0.05, (2500, 3))).astype(np.float32)
    got = nn_dists_device(base, query)
    want = _brute_nn(base, query)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(not os.path.isdir(REF_RESULT),
                    reason="reference artifacts not available")
def test_device_equals_native_on_reference_artifacts():
    from pcnerf_tpu.data.pcd_io import read_pcd
    from pcnerf_tpu.native import native_available, nn_distances
    if not native_available():
        pytest.skip("native library unavailable")
    for frame in (3, 28):
        gt = read_pcd(os.path.join(REF_RESULT, "source", f"{frame}_source.pcd"))
        pred = read_pcd(os.path.join(REF_RESULT, "infer",
                                     f"version_1_{frame}_two_step.pcd"))
        n = min(gt.shape[0], pred.shape[0])
        gt, pred = gt[:n], pred[:n]
        dev = nn_dists_device(pred, gt)
        nat = nn_distances(pred, gt)
        # a handful of argmin ties at the f32 noise floor may resolve to a
        # marginally farther neighbor; distances still agree to sub-mm
        np.testing.assert_allclose(dev, nat, rtol=1e-2, atol=5e-4)
        assert abs(dev.mean() - nat.mean()) < 1e-6
        cd_d, f_d = chamfer_fscore(pred, gt, use_device=True)
        cd_n, f_n = chamfer_fscore(pred, gt, use_device=False)
        assert abs(cd_d - cd_n) < 1e-4
        assert abs(f_d - f_n) < 1e-5


@pytest.mark.skipif(not os.path.isdir(REF_RESULT),
                    reason="reference artifacts not available")
def test_reproduces_baseline_md():
    """error_metrics must reproduce BASELINE.md's recomputed MaiCity PC-NeRF
    two-step numbers on the reference's shipped artifacts: CD 0.1718 /
    F 0.9555 (print_metrics.py semantics).  The native path scores all 10
    frames here (the device path is asserted equal to it per-frame above;
    the full-device 10-frame reproduction runs on real TPU via
    ``scripts/check_baseline_device.py`` — see RESULTS.md)."""
    from pcnerf_tpu.native import native_available
    if not native_available():
        pytest.skip("native library unavailable")
    from pcnerf_tpu.eval.report import error_metrics
    out = error_metrics(REF_RESULT, "version_1", "two-step", 0, 50,
                        use_device=False, verbose=False, save=False)
    assert abs(out["cd"] - 0.171849) < 5e-4, out["cd"]
    assert abs(out["fscore"] - 0.955458) < 5e-4, out["fscore"]
