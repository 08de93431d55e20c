"""Headless AABB viewer (C32): child-NeRF boxes + clusters -> portable files.

Reference: ``data_preprocess/scripts/view_pcd_aabb{1,2}.py`` open an Open3D
GUI window over a folder of cluster PCDs and their bounding boxes.  This
environment (and any TPU pod) is headless, so the equivalent here exports the
same scene to files any local viewer opens:

  - ``aabb_wireframe.ply``: one PLY with every box as a 12-edge wireframe
    (vertex + edge elements — MeshLab/CloudCompare/Open3D all render these);
  - ``aabb_topdown.png``: an x/y orthographic projection of the boxes over a
    subsampled point cloud (matplotlib, optional).

Input is either the pipeline's ``child_aabbs.npy`` (pre-padded (C, 6) rows)
or a folder of ``{1..N}.pcd`` cluster files like the reference viewers take.

    python -m pcnerf_tpu.tools.view_aabb --artifacts artifacts/maicity00/maicity_00_1
"""

from __future__ import annotations

import argparse
import os

import numpy as np

# box corner index pairs forming the 12 AABB edges
_EDGES = [(0, 1), (0, 2), (0, 4), (1, 3), (1, 5), (2, 3), (2, 6),
          (3, 7), (4, 5), (4, 6), (5, 7), (6, 7)]


def box_corners(aabbs: np.ndarray) -> np.ndarray:
    """(C, 8, 3) corner points of (C, 6) [min, max] boxes; corner k takes
    max on axis a iff bit a of k is set."""
    lo, hi = aabbs[:, :3], aabbs[:, 3:]
    k = np.arange(8)
    take_hi = ((k[:, None] >> np.arange(3)) & 1).astype(bool)  # (8, 3)
    return np.where(take_hi[None], hi[:, None, :], lo[:, None, :])


def write_wireframe_ply(path: str, aabbs: np.ndarray) -> None:
    """Write all boxes as a single PLY with edge elements (ascii)."""
    corners = box_corners(np.asarray(aabbs, np.float64))
    c = corners.reshape(-1, 3)
    base = 8 * np.arange(len(aabbs))[:, None, None]
    edges = (np.array(_EDGES)[None] + base).reshape(-1, 2)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n"
                f"element vertex {len(c)}\n"
                "property float x\nproperty float y\nproperty float z\n"
                f"element edge {len(edges)}\n"
                "property int vertex1\nproperty int vertex2\nend_header\n")
        for p in c:
            f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        for a, b in edges:
            f.write(f"{a} {b}\n")


def read_wireframe_ply(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Parse back (vertices (V, 3), edges (E, 2)) — used by the tests."""
    with open(path) as f:
        lines = f.read().splitlines()
    nv = ne = 0
    for i, ln in enumerate(lines):
        if ln.startswith("element vertex"):
            nv = int(ln.split()[-1])
        elif ln.startswith("element edge"):
            ne = int(ln.split()[-1])
        elif ln == "end_header":
            body = i + 1
            break
    verts = np.array([[float(x) for x in ln.split()]
                      for ln in lines[body:body + nv]])
    edges = np.array([[int(x) for x in ln.split()]
                      for ln in lines[body + nv:body + nv + ne]])
    return verts, edges


def render_topdown(path: str, aabbs: np.ndarray,
                   points: np.ndarray | None = None,
                   max_points: int = 200_000) -> None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.collections import LineCollection

    fig, ax = plt.subplots(figsize=(14, 7))
    if points is not None and len(points):
        if len(points) > max_points:
            points = points[:: len(points) // max_points]
        ax.scatter(points[:, 0], points[:, 1], s=0.05, c=points[:, 2],
                   cmap="viridis", rasterized=True)
    lo, hi = aabbs[:, :3], aabbs[:, 3:]
    segs = []
    for (x0, y0), (x1, y1) in zip(lo[:, :2], hi[:, :2]):
        segs += [[(x0, y0), (x1, y0)], [(x1, y0), (x1, y1)],
                 [(x1, y1), (x0, y1)], [(x0, y1), (x0, y0)]]
    ax.add_collection(LineCollection(segs, colors="red", linewidths=0.25))
    ax.set_aspect("equal")
    ax.set_title(f"{len(aabbs)} child-NeRF AABBs (top-down)")
    fig.savefig(path, dpi=150, bbox_inches="tight")
    plt.close(fig)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--artifacts", required=True,
                   help="pipeline output dir containing child_aabbs.npy "
                        "(and source.pcd for the background points)")
    p.add_argument("--out", default=None, help="output dir (default: input)")
    a = p.parse_args()
    out = a.out or a.artifacts
    aabbs = np.load(os.path.join(a.artifacts, "child_aabbs.npy"))
    write_wireframe_ply(os.path.join(out, "aabb_wireframe.ply"), aabbs)
    pts = None
    src = os.path.join(a.artifacts, "source.pcd")
    if os.path.exists(src):
        from pcnerf_tpu.data.pcd_io import read_pcd
        pts = read_pcd(src)
    render_topdown(os.path.join(out, "aabb_topdown.png"), aabbs, pts)
    print(f"wrote {out}/aabb_wireframe.ply + aabb_topdown.png "
          f"({len(aabbs)} boxes)")


if __name__ == "__main__":
    main()
