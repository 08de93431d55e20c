"""Collect eval/baseline results from logs_bg/*.log into one table.

Each eval_scene.py run ends with a JSON line {"avg_error":..., "acc":...,
"cd":..., "fscore":...}; voxel_baseline.py prints one JSON line per voxel
size.  This tool greps them all and prints a sorted summary — the source
of truth for RESULTS.md edits.

    python scripts/collect_results.py [--match r4]
"""

import argparse
import glob
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--match", default="")
    a = p.parse_args()
    rows = []
    for path in sorted(glob.glob("logs_bg/*.log")):
        name = os.path.basename(path)[:-4]
        if a.match and a.match not in name:
            continue
        try:
            lines = open(path, errors="replace").read().splitlines()
        except OSError:
            continue
        for ln in lines:
            if not ln.startswith("{"):
                continue
            try:
                d = json.loads(ln)
            except json.JSONDecodeError:
                continue
            if "cd" in d and "fscore" in d:
                rows.append((name, d.get("baseline", "nerf"),
                             d.get("voxel", ""), d["avg_error"], d["acc"],
                             d["cd"], d["fscore"]))
    print(f"{'log':44s} {'kind':14s} {'vox':5} {'avg_err':>8} {'acc':>7} "
          f"{'cd':>8} {'f':>8}")
    for r in rows:
        print(f"{r[0]:44s} {r[1]:14s} {str(r[2]):5} {r[3]:8.4f} {r[4]:7.2f} "
              f"{r[5]:8.4f} {r[6]:8.4f}")


if __name__ == "__main__":
    main()
