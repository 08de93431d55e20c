"""Training CLI: ``python -m pcnerf_tpu.train.run --preset kitti00_pcnerf``.

The ``train_kitti.py __main__`` equivalent; flag surface reduced to preset +
overrides (the full ~55-flag surface of ``nof_utils.get_opts`` lives in the
typed configs, see pcnerf_tpu/config.py and presets.py).
"""

from __future__ import annotations

import argparse
import dataclasses

from pcnerf_tpu.presets import PRESETS
from pcnerf_tpu.train.loop import fit


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", choices=sorted(PRESETS), required=True)
    p.add_argument("--sparsity", default="20")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--out", default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--warm-start", default=None,
                   help="reference .ckpt for prefix-filtered warm start")
    p.add_argument("--rebuild-data", action="store_true")
    p.add_argument("--skip-sanity-val", action="store_true")
    p.add_argument("--profile-steps", type=int, default=0,
                   help="capture a jax.profiler trace of the first N "
                        "post-warmup steps under <out>/trace")
    p.add_argument("--resume", action="store_true",
                   help="restore <out>/checkpoints/last and continue at the "
                        "interrupted step")
    p.add_argument("--art-dir", default=None,
                   help="train against this preprocessing tree instead of "
                        "the preset's (preprocessing ablations)")
    p.add_argument("--n-samples", type=int, default=None,
                   help="coarse samples/ray (default: preset's 768)")
    p.add_argument("--n-importance", type=int, default=None,
                   help="importance samples/ray (default: preset's 1536)")
    p.add_argument("--lambda-child-free", type=float, default=None,
                   help="child free-space loss weight override")
    p.add_argument("--lambda-child-depth", type=float, default=None,
                   help="child depth loss weight override")
    p.add_argument("--lambda-opacity", type=float, default=None,
                   help="opacity regularizer weight (reference "
                        "render.py:224 term; 0 disables)")
    p.add_argument("--fused-embed", default=None,
                   choices=["auto", "on", "off"],
                   help="Pallas fused-embedding collapse path "
                        "(ModelConfig.fused_embed; default off = the "
                        "XLA collapse path the published rows use)")
    p.add_argument("--lr-milestones", type=int, nargs="*", default=None,
                   help="override MultiStepLR epoch milestones (reference "
                        "train_kitti.py:113 hardcodes [5,120,256]); pass "
                        "with no values for a constant lr — used by the "
                        "step-matched sparsity rows, whose >5-epoch budgets "
                        "would otherwise hit the epoch-5 decay the 1-epoch "
                        "baseline protocol never reaches")
    a = p.parse_args()

    cfg = PRESETS[a.preset](sparsity=a.sparsity, compute_dtype=a.dtype)
    if a.fused_embed is not None:
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, fused_embed=a.fused_embed))
    if a.art_dir:
        from pcnerf_tpu.presets import override_art_dir
        data = override_art_dir(cfg.data, a.art_dir)
        cfg = dataclasses.replace(
            cfg, data=data,
            loss=dataclasses.replace(cfg.loss,
                                     sub_nerf_count=data.sub_nerf_count))
    if a.epochs is not None:
        cfg = dataclasses.replace(cfg, num_epochs=a.epochs)
    if a.seed is not None:
        cfg = dataclasses.replace(cfg, seed=a.seed)
    if a.batch_size is not None:
        cfg = dataclasses.replace(cfg, batch_size=a.batch_size)
    loss_over = {k: v for k, v in (
        ("lambda_child_free", a.lambda_child_free),
        ("lambda_child_depth", a.lambda_child_depth),
        ("lambda_opacity", a.lambda_opacity)) if v is not None}
    if loss_over:
        cfg = dataclasses.replace(
            cfg, loss=dataclasses.replace(cfg.loss, **loss_over))
    if a.lr_milestones is not None:
        cfg = dataclasses.replace(cfg, optim=dataclasses.replace(
            cfg.optim, decay_milestones=tuple(a.lr_milestones)))
    if a.n_samples is not None or a.n_importance is not None:
        r = cfg.render
        cfg = dataclasses.replace(cfg, render=dataclasses.replace(
            r, n_samples=a.n_samples or r.n_samples,
            n_importance=a.n_importance or r.n_importance))
    fit(cfg, out_dir=a.out, rebuild_data=a.rebuild_data,
        warm_start=a.warm_start, max_steps=a.max_steps,
        skip_sanity_val=a.skip_sanity_val, profile_steps=a.profile_steps,
        resume=a.resume)


if __name__ == "__main__":
    main()
