"""Round-3 clustering sweep for the MaiCity PC-NeRF cell.

The per-ray cross-join (scripts/cross_ray_join.py, version_0 anchor) shows
our model WINS on rays where both trees assemble the same child group and
loses only on the ~21% whose group size differs — so the remaining CD gap is
child-set geometry.  th_dist=0.125 was recovered in round 2; this sweeps the
region-growing knobs (cluster_radius, min_cluster) the reference also never
published, scoring group-size agreement + row ratio on two test frames.

    PYTHONPATH=. JAX_PLATFORMS=cpu python scripts/sweep_maicity_cluster.py
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # keep the sweep off the TPU queue

from scripts import sweep_maicity_prep as base  # noqa: E402
from pcnerf_tpu.data.pcd_io import read_pcd  # noqa: E402
from pcnerf_tpu.presets import maicity00_data  # noqa: E402

base.FRAMES = [13, 28]


def main():
    cfg = maicity00_data()
    fused = read_pcd(os.path.join(cfg.result_path, "source.pcd")).astype("float32")
    print(f"fused cloud: {fused.shape[0]} points, frames {base.FRAMES}",
          flush=True)

    variants = [("baseline r=0.35 m=15", dict())]
    for r in (0.25, 0.30, 0.40, 0.50):
        variants.append((f"r={r}", dict(radius=r)))
    for m in (5, 10, 25, 40, 80):
        variants.append((f"m={m}", dict(min_cluster=m)))
    variants += [
        ("r=0.30 m=10", dict(radius=0.30, min_cluster=10)),
        ("r=0.40 m=25", dict(radius=0.40, min_cluster=25)),
        ("r=0.50 m=40", dict(radius=0.50, min_cluster=40)),
        ("r=0.25 m=5", dict(radius=0.25, min_cluster=5)),
    ]
    for name, kw in variants:
        kw = dict(th_dist=0.125, **kw)
        t0 = time.time()
        aabbs, k, n_ground = base.make_aabbs(fused, **kw)
        rows, eq, dmean = base.score(aabbs, cfg)
        print(f"{name:24s} children {aabbs.shape[0]:5d} clusters {k:4d} "
              f"ground {n_ground} | rows x{rows:.4f}, size== {eq:.4f}, "
              f"mean dsize {dmean:+.3f}  ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
