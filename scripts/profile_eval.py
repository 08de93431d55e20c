"""Two-step eval frame-time attribution (VERDICT r4 #5).

PERF.md reports ~36 s/frame KITTI two-step eval (vs the reference's ~72 s
class) but nothing says where those seconds go at eval shapes — the
(5120, 4097->12289) sort chain? the occupancy passes? host padding/D2H?
This script instruments ONE real KITTI frame end to end:

- host stages: cached test-ray load, group batching + padding, H2D;
- device stages via KNOCKOUT ablation of the jitted ``infer_batch`` (same
  method as scripts/trace_step.py — replace one stage with a shape-identical
  no-op at trace time, keep the rest of the program intact, difference =
  the stage's in-context marginal cost):
    - ``nopdf``:    importance bracketing + merge sort knocked out;
    - ``unisort``:  bracketing knocked out, (R, N+K) merge sort kept;
    - ``nosmooth``: the sigma=5 gaussian row-convolution knocked out;
    - ``occ_only``: occupancy passes alone (coarse + fine shapes).
- a full-frame wall measurement replicating run_inference's async dispatch.

Run on the real TPU (queue-serialized):

    python scripts/profile_eval.py [--frame N] [--batches 3]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def fetch(x) -> float:
    return float(np.asarray(x).ravel()[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frame", type=int, default=None,
                   help="test frame number (default: first test frame)")
    p.add_argument("--batches", type=int, default=3,
                   help="number of regular batches to profile")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--ckpt", default=os.path.join(
        REPO, "logs/kitti00/1151_1200_view/pcnerf/checkpoints/best"))
    a = p.parse_args()

    import jax
    import jax.numpy as jnp
    from pcnerf_tpu.eval import engine as E
    from pcnerf_tpu.eval.run import load_folded_models, load_test_rays
    from pcnerf_tpu.models import collapse_folded_params
    from pcnerf_tpu.ops import sampling as S
    from pcnerf_tpu.presets import kitti00_eval

    cfg = kitti00_eval(method=2, sparsity="20")
    mcfg = cfg.model
    # FUSED_EMBED=auto|on routes the occupancy matvec through the Pallas
    # fused-embedding kernel (ops/pallas_train.py) for the A/B in PERF.md
    mlp_mode = ("collapsed_fused"
                if os.environ.get("FUSED_EMBED", "off") in ("auto", "on")
                else "collapsed")

    frames = [j + 1 for j in range(cfg.data.data_start, cfg.data.data_end)
              if cfg.data.split.is_test_frame(j, cfg.data.data_start)]
    frame = a.frame or frames[0]

    t0 = time.time()
    fc, ff = load_folded_models(a.ckpt, cfg)
    t_load_ckpt = time.time() - t0

    t0 = time.time()
    rays, counts = load_test_rays(cfg, frame, create=False)
    t_load_rays = time.time() - t0

    wc, bc = collapse_folded_params(fc, mcfg)
    wf, bf = collapse_folded_params(ff, mcfg)
    fcc = {"w_eff": jnp.asarray(wc), "b_eff": jnp.asarray(bc)}
    ffc = {"w_eff": jnp.asarray(wf), "b_eff": jnp.asarray(bf)}
    kernel = jnp.asarray(E.scipy_gaussian_kernel1d(cfg.smooth_sigma))

    bs = cfg.batch_size
    pad_to = -(-int(bs + 1024) // 64) * 64
    pad_to_tail = -(-int(1.5 * bs + 1024) // 64) * 64

    t0 = time.time()
    batches = list(E.GroupBatcher(rays, counts).batches(bs, pad_to,
                                                        pad_to_tail))
    t_batching = time.time() - t0
    n_regular = sum(1 for b in batches if b[0].shape[0] == pad_to)
    print(f"[eval-profile] frame {frame}: {rays.shape[0]} rows, "
          f"{len(batches)} batches ({n_regular} regular pad {pad_to}, "
          f"tail pad {pad_to_tail}); ckpt {t_load_ckpt:.2f}s, "
          f"ray load {t_load_rays:.2f}s, batching {t_batching:.2f}s",
          flush=True)

    probe = [b for b in batches if b[0].shape[0] == pad_to][:a.batches]

    # H2D cost for one padded batch
    rp = probe[0][0]
    t0 = time.time()
    for _ in range(5):
        x = jnp.asarray(rp)
    fetch(x[0, 0])
    t_h2d = (time.time() - t0) / 5

    real_pdf = S.sample_pdf_merged
    real_smooth = E._smooth_rows

    def _nopdf(key, z_vals, bins, weights, n_samples, det):
        tail = z_vals[:, -1:] + (1e-3 * jnp.arange(1, n_samples + 1,
                                                   dtype=z_vals.dtype))
        return jnp.concatenate([z_vals, tail], axis=-1)

    def _unisort(key, z_vals, bins, weights, n_samples, det):
        near, far = z_vals[:, :1], z_vals[:, -1:]
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=z_vals.dtype)
        zi = near + (far - near) * u[None, :]
        return jnp.sort(jnp.concatenate([z_vals, zi], axis=-1), axis=-1)

    def _nosmooth(w, kern):
        return w

    def run_batches(tag):
        """Dispatch the probe batches through infer_batch (current patch
        state), fetch-barrier at the end; returns seconds per batch."""
        times = []
        for _ in range(a.reps):
            t0 = time.time()
            outs = []
            for rays_p, seg, valid, n_real in probe:
                pts, flag, _, _ = E.infer_batch(
                    fcc, ffc, jnp.asarray(rays_p), jnp.asarray(seg),
                    jnp.asarray(valid), kernel, mcfg=mcfg,
                    n_samples=cfg.n_samples, n_importance=cfg.n_importance,
                    method=cfg.depth_inference_method,
                    n_groups=rays_p.shape[0], mlp_mode=mlp_mode)
                outs.append(pts)
            for pts in outs:
                np.asarray(pts)
            times.append((time.time() - t0) / len(probe))
        return sorted(times)[len(times) // 2]

    results = {}
    variants = [
        ("full", None, None),
        ("nopdf", _nopdf, None),
        ("unisort", _unisort, None),
        ("nosmooth", None, _nosmooth),
    ]
    for tag, pdf_impl, smooth_impl in variants:
        S.sample_pdf_merged = pdf_impl or real_pdf
        E._smooth_rows = smooth_impl or real_smooth
        E.infer_batch.clear_cache()
        try:
            t_compile0 = time.time()
            run_batches(tag)   # compile + warm
            t_compile = time.time() - t_compile0
            sec = run_batches(tag)
        finally:
            S.sample_pdf_merged = real_pdf
            E._smooth_rows = real_smooth
        results[tag] = sec
        print(f"[knockout] {tag:9s} {sec * 1e3:9.1f} ms/batch "
              f"(first-call {t_compile:.1f}s)", flush=True)

    # occupancy passes alone at both shapes
    E.infer_batch.clear_cache()
    occ_impl = (E._occupancy_collapsed_fused if mlp_mode == "collapsed_fused"
                else E._occupancy_collapsed)
    occ = jax.jit(occ_impl, static_argnames=("mcfg",))
    rays_p = probe[0][0]
    o = jnp.asarray(rays_p[:, 0:3])
    d = jnp.asarray(rays_p[:, 3:6])
    for tag, ns in (("occ_coarse", cfg.n_samples),
                    ("occ_fine", cfg.n_samples + cfg.n_importance)):
        z = jnp.linspace(0.0, 1.0, ns, dtype=jnp.float32)
        z = jnp.broadcast_to(z[None, :], (rays_p.shape[0], ns)) * 80.0
        out = occ(fcc, o, d, z, mcfg)
        fetch(out[0, 0])
        times = []
        for _ in range(a.reps):
            t0 = time.time()
            for _ in range(3):
                out = occ(fcc, o, d, z, mcfg)
            fetch(out[0, 0])
            times.append((time.time() - t0) / 3)
        results[tag] = sorted(times)[len(times) // 2]
        print(f"[knockout] {tag:9s} {results[tag] * 1e3:9.1f} ms", flush=True)

    att = {
        "batch_ms": results["full"] * 1e3,
        "pdf_total_ms": (results["full"] - results["nopdf"]) * 1e3,
        "pdf_merge_sort_ms": (results["unisort"] - results["nopdf"]) * 1e3,
        "pdf_bracketing_ms": (results["full"] - results["unisort"]) * 1e3,
        "smoothing_ms": (results["full"] - results["nosmooth"]) * 1e3,
        "occ_coarse_ms": results["occ_coarse"] * 1e3,
        "occ_fine_ms": results["occ_fine"] * 1e3,
        "h2d_ms": t_h2d * 1e3,
        "host_batching_s_frame": t_batching,
        "ray_load_s_frame": t_load_rays,
        "n_batches_frame": len(batches),
    }
    att["projected_frame_s"] = (results["full"] * len(batches)
                                + t_batching + t_load_rays)
    print(json.dumps({"frame": frame, "knockouts_s": results,
                      "attribution": att}), flush=True)


if __name__ == "__main__":
    main()
