"""Minimal, dependency-free PCD point-cloud IO.

Replaces the reference's three native readers (python-pcl ``pcl.load``,
Open3D ``read_point_cloud`` / ``write_point_cloud``) with a pure-numpy
implementation.  All artifacts the reference ships or produces are
``FIELDS x y z``, float32, ``DATA binary`` (or ascii), which this module
round-trips byte-compatibly so downstream tools (and the reference's own
``print_metrics.py``) can consume our outputs.
"""

from __future__ import annotations

import os

import numpy as np

_HEADER_TMPL = """# .PCD v0.7 - Point Cloud Data file format
VERSION 0.7
FIELDS x y z
SIZE 4 4 4
TYPE F F F
COUNT 1 1 1
WIDTH {n}
HEIGHT 1
VIEWPOINT 0 0 0 1 0 0 0
POINTS {n}
DATA {mode}
"""


def read_pcd(path: str) -> np.ndarray:
    """Read a PCD file, returning an (N, 3) float32 array of xyz.

    Supports ascii and binary encodings with arbitrary extra fields (extra
    fields are skipped; only x/y/z are returned, matching how the reference
    consumes clouds).
    """
    with open(path, "rb") as f:
        fields, sizes, types, counts = [], [], [], []
        n_points = 0
        mode = "ascii"
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            if line.startswith("#") or not line:
                continue
            key, _, rest = line.partition(" ")
            key = key.upper()
            if key == "FIELDS":
                fields = rest.split()
            elif key == "SIZE":
                sizes = [int(v) for v in rest.split()]
            elif key == "TYPE":
                types = rest.split()
            elif key == "COUNT":
                counts = [int(v) for v in rest.split()]
            elif key == "POINTS":
                n_points = int(rest)
            elif key == "DATA":
                mode = rest.strip().lower()
                break
        if not counts:
            counts = [1] * len(fields)

        np_types = {"F": "f", "I": "i", "U": "u"}
        dtype = np.dtype([
            (name if name not in ("_",) else f"_pad{i}",
             f"{np_types[t]}{s}", (c,) if c > 1 else ())
            for i, (name, s, t, c) in enumerate(zip(fields, sizes, types, counts))
        ])

        if mode == "ascii":
            raw = np.loadtxt(f, dtype=np.float64, ndmin=2)
            idx = [fields.index(k) for k in ("x", "y", "z")]
            return raw[:, idx].astype(np.float32)
        if mode == "binary":
            buf = f.read(dtype.itemsize * n_points)
            rec = np.frombuffer(buf, dtype=dtype, count=n_points)
            out = np.stack([rec["x"], rec["y"], rec["z"]], axis=-1)
            return np.ascontiguousarray(out).astype(np.float32)
        if mode == "binary_compressed":
            raise NotImplementedError("binary_compressed PCD not supported")
        raise ValueError(f"unknown PCD DATA mode: {mode}")


def write_pcd(path: str, points: np.ndarray, *, binary: bool = True) -> None:
    """Write an (N, 3) array as an x/y/z float32 PCD file."""
    pts = np.ascontiguousarray(np.asarray(points, dtype=np.float32).reshape(-1, 3))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    header = _HEADER_TMPL.format(n=pts.shape[0], mode="binary" if binary else "ascii")
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        if binary:
            f.write(pts.tobytes())
        else:
            np.savetxt(f, pts, fmt="%.8g")


def pcd_aabb(path_or_points, pad: float = 0.0):
    """Axis-aligned bounding box of a cloud, optionally padded.

    Mirrors the Open3D ``get_axis_aligned_bounding_box`` + ``extend_tmp``
    pattern used for child/parent AABBs (ipb2dmapping.py:553-626).
    Returns (min_bound - pad, max_bound + pad) as float64 arrays.
    """
    pts = read_pcd(path_or_points) if isinstance(path_or_points, str) else np.asarray(path_or_points)
    lo = pts.min(axis=0).astype(np.float64) - pad
    hi = pts.max(axis=0).astype(np.float64) + pad
    return lo, hi
