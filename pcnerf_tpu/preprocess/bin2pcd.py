"""KITTI .bin -> .pcd conversion with dynamic-object removal.

Reference: ``data_preprocess/scripts/bin2pcd_folder.py`` (C26): streams each
velodyne .bin with its SemanticKITTI .label and drops the labeled dynamic /
unusable classes.  The byte-at-a-time struct loop becomes one vectorized
mask over the mmap'd arrays.

Usage:
    python -m pcnerf_tpu.preprocess.bin2pcd --input-dir .../velodyne \
        --label-dir .../labels --output-dir .../pcd
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from pcnerf_tpu.data.pcd_io import write_pcd

# semantic-kitti.yaml classes removed by the reference (bin2pcd_folder.py:26-43)
REMOVE_LABELS = frozenset(
    [0, 1, 10, 11, 13, 15, 16, 18, 20, 30, 31, 32, 99, 251]
    + list(range(252, 260)))


def convert_scan(bin_path: str, label_path: str) -> np.ndarray:
    pts = np.fromfile(bin_path, dtype=np.float32).reshape(-1, 4)[:, :3]
    labels = np.fromfile(label_path, dtype=np.uint32) & 0xFFFF
    keep = ~np.isin(labels, list(REMOVE_LABELS))
    return pts[keep]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input-dir", required=True)
    p.add_argument("--label-dir", required=True)
    p.add_argument("--output-dir", required=True)
    a = p.parse_args()
    os.makedirs(a.output_dir, exist_ok=True)
    for name in sorted(os.listdir(a.input_dir)):
        if not name.endswith(".bin"):
            continue
        stem = os.path.splitext(name)[0]
        pts = convert_scan(os.path.join(a.input_dir, name),
                           os.path.join(a.label_dir, stem + ".label"))
        write_pcd(os.path.join(a.output_dir, stem + ".pcd"), pts)
        print(f"{name}: {pts.shape[0]} points kept")


if __name__ == "__main__":
    main()
