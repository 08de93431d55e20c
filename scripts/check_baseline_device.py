"""Full-device reproduction of BASELINE.md on the reference's shipped
artifacts (run on real TPU; the CPU test backend is too slow for the
10-frame device path, so pytest covers 2 frames + the native path and this
script covers the rest).

    python scripts/check_baseline_device.py

Prints one JSON line per dataset cell with device-path CD/F and the
BASELINE.md expectation.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pcnerf_tpu.eval.report import error_metrics  # noqa: E402

CELLS = [
    # (result_dir, version, method, start, end, baseline_cd, baseline_f)
    ("/root/reference/logs/maicity00/maicity_00_1/render_result",
     "version_1", "two-step", 0, 50, 0.171849, 0.955458),
    ("/root/reference/logs/maicity00/maicity_00_1/render_result",
     "version_0", "two-step", 0, 50, 0.2973, 0.9227),
    ("/root/reference/logs/kitti00/1151_1200_view/render_result",
     "version_1", "two-step", 1150, 1200, 0.2239, 0.8908),
    ("/root/reference/logs/kitti00/1151_1200_view/render_result",
     "version_0", "two-step", 1150, 1200, 0.2201, 0.8904),
]


def main():
    ok = True
    for result_dir, version, method, start, end, b_cd, b_f in CELLS:
        out = error_metrics(result_dir, version, method, start, end,
                            use_device=True, verbose=False, save=False)
        good = abs(out["cd"] - b_cd) < 5e-4 and abs(out["fscore"] - b_f) < 5e-4
        ok &= good
        print(json.dumps({
            "dir": result_dir.split("/logs/")[1], "version": version,
            "device_cd": round(out["cd"], 6),
            "device_f": round(out["fscore"], 6),
            "baseline_cd": b_cd, "baseline_f": b_f, "match": good,
        }), flush=True)
    print(json.dumps({"all_match": ok}))
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
