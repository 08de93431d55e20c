"""Training loop: the ``Trainer.fit`` equivalent.

Reference: ``train_kitti.py:261-297`` (PL Trainer) + the DataLoader plumbing
(:81-86).  One process drives the jitted train step; batches are sliced from
a device-resident ray buffer (no worker processes — the 16 CPU DataLoader
workers of the reference existed to amortize per-item Python cost that no
longer exists).  Host<->device traffic per step: zero (metrics are flushed in
bulk; see utils/logging.py).

Epoch semantics preserved: full validation pass before training
(``num_sanity_val_steps=-1``, train_kitti.py:289), per-epoch validation with
CD/F-score, best+last checkpoints monitored on train loss.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from pcnerf_tpu.config import TrainConfig
from pcnerf_tpu.data.raybuffer import load_or_build, val_subsample
from pcnerf_tpu.eval.metrics import chamfer_fscore
from pcnerf_tpu.train.system import (
    TrainState,
    init_train_state,
    lr_at_epoch,
    make_train_step,
    make_val_step,
)
from pcnerf_tpu.utils.ckpt import BestLastTracker, import_torch_ckpt
from pcnerf_tpu.utils.logging import MetricLogger
from pcnerf_tpu.utils.profiling import StepTimer, trace


def run_validation(cfg: TrainConfig, state: TrainState, val_step, rays_val,
                   ranges_val, key, mesh=None) -> dict:
    """Full pass over the val subsample; averages metrics over batches and
    computes CD/F on the concatenated predicted/gt points (the reference
    computes CD per batch and lets PL average — equivalent up to batch
    weighting; batches here are equal-sized).

    Under a ``mesh`` each batch is assembled dp-sharded from per-host rows
    (multihost.host_shard_batch) — on a multi-process mesh a host-local
    numpy slice cannot become a dp-global array any other way; the step's
    outputs are replicated, so the metric fetch below works on every
    process."""
    bs = cfg.batch_size_val
    n = (rays_val.shape[0] // bs) * bs
    metrics_acc, cds, fs = [], [], []
    for s in range(0, n, bs):
        k = np.asarray(jax.random.fold_in(key, s))
        rb, gb = rays_val[s:s + bs], ranges_val[s:s + bs]
        if mesh is not None:
            from pcnerf_tpu.parallel.multihost import host_shard_batch
            rb, gb = host_shard_batch(mesh, rb, gb)
        # without a mesh, numpy slices go straight to the jitted step:
        # uncommitted inputs are placed per the step's in_shardings
        m, pred_pts, gt_pts = val_step(state, rb, gb, k)
        metrics_acc.append(m)
        cd, f = chamfer_fscore(np.asarray(pred_pts), np.asarray(gt_pts))
        cds.append(cd)
        fs.append(f)
    out = {k: float(np.mean([float(m[k]) for m in metrics_acc]))
           for k in metrics_acc[0]}
    out["cd"] = float(np.mean(cds))
    out["fscore"] = float(np.mean(fs))
    return out


def fit(cfg: TrainConfig, *, out_dir: Optional[str] = None,
        rebuild_data: bool = False, warm_start: Optional[str] = None,
        max_steps: Optional[int] = None, skip_sanity_val: bool = False,
        profile_steps: int = 0, resume: bool = False,
        mesh: object = "auto", verbose: bool = True) -> TrainState:
    """Train; with ``profile_steps=N`` the first N post-warmup steps are
    captured as a jax.profiler trace under ``<out_dir>/trace`` and per-step
    timing percentiles land in ``<out_dir>/step_times.json``.

    ``resume=True`` restores ``<out_dir>/checkpoints/last`` (params, BN,
    optimizer state, step counter) and fast-forwards to the interrupted
    step — the data order is deterministic per (seed, epoch), so a resumed
    run consumes the same remaining batches a crash-free run would have.
    No-op if no checkpoint exists yet.

    ``mesh``: ``"auto"`` (default) trains data-parallel over ALL visible
    devices via the GSPMD step (parallel/gspmd.py) whenever more than one
    device is present and the batch sizes divide evenly — falling back to
    the single-chip step otherwise; pass an explicit ``jax.sharding.Mesh``
    to pin the layout, or ``None`` to force single-device.  The N-device
    run is step-for-step identical to the 1-device run (global-batch
    losses/BN, sharding-invariant RNG); tests/test_fit_mesh.py asserts it.

    The mesh path is PROCESS-COUNT-AGNOSTIC (SURVEY §2.4 / §7 hard part 6):
    after ``jax.distributed.initialize`` the same fit() call on every
    process trains over the process-spanning mesh — each process derives
    the identical (seed, epoch) permutation, materializes only its
    addressable batch rows (multihost.host_shard_batch), enters the
    collective orbax saves on a deterministic schedule, and process 0
    writes logs/DONE.  tests/test_multihost.py runs THIS function across 2
    real processes and asserts the loss curve, val metrics, and checkpoint
    equal the single-process run."""
    out_dir = out_dir or os.path.join("logs", cfg.exp_name)
    os.makedirs(out_dir, exist_ok=True)

    if mesh == "auto":
        n_dev = len(jax.devices())
        mesh = None
        if (n_dev > 1 and cfg.batch_size % n_dev == 0
                and cfg.batch_size_val % n_dev == 0):
            from pcnerf_tpu.parallel import make_mesh
            mesh = make_mesh(n_dev, tp=1)
    if mesh is not None and getattr(mesh, "size", 1) > 1:
        # The fused-embedding pallas kernels are opaque to GSPMD: on a
        # multi-device mesh the partitioner would gather the full batch
        # around them, defeating dp.  The dp-correct fused form lives in
        # the shard_map step (axis_name psum, tests/test_pallas_train.py);
        # the GSPMD fit path forces the XLA collapse instead.
        from pcnerf_tpu.models import fused_embed_active
        if fused_embed_active(cfg.model):
            import dataclasses as _dc
            cfg = _dc.replace(cfg, model=_dc.replace(cfg.model,
                                                     fused_embed="off"))
            if verbose:
                print("[fit] fused_embed disabled on the multi-device GSPMD "
                      "mesh (shard_map path carries the fused kernels)",
                      flush=True)
    # multi-process awareness: on a process-spanning mesh every process runs
    # this same fit() — compute is collective, host-side artifacts are split:
    # logs/DONE/timing are written by process 0 only, while orbax checkpoint
    # saves are entered by ALL processes (they are collective operations)
    # on a deterministic update-count schedule
    n_procs = jax.process_count()
    is_primary = jax.process_index() == 0

    # a stale completion sentinel (from a previous finished run in the same
    # out_dir) must not survive into a new/longer run: queue scripts key
    # train-skip decisions on DONE, and a mid-training restored checkpoint
    # without DONE must never be mistaken for a finished training
    # (ADVICE r2, high)
    done_path = os.path.join(out_dir, "DONE")
    if is_primary and os.path.exists(done_path):
        os.remove(done_path)
    # non-primary processes keep a full logger (its flush() feeds the
    # checkpoint tracker's loss) but write to a throwaway per-process dir
    log_dir = out_dir if is_primary else os.path.join(
        out_dir, f"_proc{jax.process_index()}")
    logger = MetricLogger(log_dir, use_tensorboard=is_primary)
    tracker = BestLastTracker(
        os.path.join(out_dir, "checkpoints"),
        min_interval_updates=10 if n_procs > 1 else None)
    timer = StepTimer()

    rays_tr, ranges_tr = load_or_build(cfg.data, "train", rebuild=rebuild_data)
    rays_v, ranges_v = load_or_build(cfg.data, "val", rebuild=rebuild_data)
    rays_val, ranges_val = val_subsample(rays_v, ranges_v,
                                         cfg.data.cloud_size_val)
    if verbose:
        print(f"[fit] train rays {rays_tr.shape}, val subsample "
              f"{rays_val.shape}", flush=True)

    key = jax.random.PRNGKey(cfg.seed)
    state = init_train_state(key, cfg)
    resume_step = 0
    if resume:
        from pcnerf_tpu.utils.ckpt import restore
        last = os.path.join(out_dir, "checkpoints", "last")
        if os.path.exists(last):
            state = restore(last, state)
            resume_step = int(state.step)
            skip_sanity_val = skip_sanity_val or resume_step > 0
            if verbose:
                print(f"[fit] resumed from {last} at step {resume_step}",
                      flush=True)
    if warm_start and resume_step > 0:
        # a restored checkpoint wins over warm_start: overwriting the restored
        # params while keeping the restored optimizer state / step counter
        # would be an inconsistent hybrid
        if verbose:
            print("[fit] warm_start ignored: resumed from a checkpoint",
                  flush=True)
        warm_start = None
    if warm_start:
        # reference warm start: load_ckpt merges prefix-filtered torch state
        # (train_kitti.py:32-36)
        pc, bc = import_torch_ckpt(warm_start, "nof_coarse")
        pf, bf = import_torch_ckpt(warm_start, "nof_fine")
        state = state._replace(params={"coarse": pc, "fine": pf},
                               bn={"coarse": bc, "fine": bf})

    if mesh is not None:
        from pcnerf_tpu.parallel import (make_gspmd_train_scan,
                                         make_gspmd_train_step,
                                         make_gspmd_val_step, replicate_state)
        state = replicate_state(state, mesh)
        train_step = make_gspmd_train_step(cfg, mesh)
        train_scan = make_gspmd_train_scan(cfg, mesh)
        val_step = make_gspmd_val_step(cfg, mesh)
        if verbose and is_primary:
            print(f"[fit] data-parallel over {mesh.devices.size} devices "
                  f"across {n_procs} process(es) (GSPMD dp mesh)", flush=True)
    else:
        from pcnerf_tpu.train.system import make_train_scan
        train_step = make_train_step(cfg)
        train_scan = make_train_scan(cfg)
        val_step = make_val_step(cfg)
    # K steps per device dispatch: at the reference batch size (256 rays) a
    # step is ~1 ms of device work, so per-step host dispatch dominates wall
    # clock; a lax.scan chunk amortizes it K-fold with identical math
    # (tests/test_train_scan.py).  Disabled while capturing a per-step trace.
    scan_k = cfg.scan_steps if profile_steps == 0 else 0

    if not skip_sanity_val:
        m = run_validation(cfg, state, val_step, rays_val, ranges_val,
                           jax.random.fold_in(key, 99_999), mesh=mesh)
        logger.log_val(0, m)
        if verbose and is_primary:
            print(f"[fit] sanity val: {m}", flush=True)

    n_batches = rays_tr.shape[0] // cfg.batch_size
    if mesh is None:
        # ship the UNSHUFFLED ray buffer to device ONCE; each epoch then
        # transfers only the 4-byte/ray permutation and gathers on device —
        # bit-identical rows to the host gather, without re-shipping the
        # ~240 MB buffer through the tunneled backend every epoch
        rays_tr_dev = jnp.asarray(rays_tr)
        ranges_tr_dev = jnp.asarray(ranges_tr)
    step = 0
    t0 = time.time()
    for epoch in range(cfg.num_epochs):
        if (epoch + 1) * n_batches <= resume_step:
            step = (epoch + 1) * n_batches   # epoch fully covered pre-resume
            continue
        # every process derives the identical permutation from (seed, epoch)
        # — the deterministic global shuffle (multihost.epoch_permutation's
        # construction); no cross-host communication
        perm = np.random.default_rng(cfg.seed + epoch).permutation(
            rays_tr.shape[0])[:n_batches * cfg.batch_size]
        if mesh is None:
            lr = jnp.float32(lr_at_epoch(cfg, epoch))
            p = jnp.asarray(perm.reshape(-1))
            epoch_rays = rays_tr_dev[p].reshape(
                n_batches, cfg.batch_size, 15)
            epoch_ranges = ranges_tr_dev[p].reshape(
                n_batches, cfg.batch_size)
        else:
            # under a mesh the buffers stay on host; each dispatch below
            # assembles its batch dp-sharded via host_shard_batch — on a
            # multi-process mesh each process materializes ONLY its
            # addressable rows, and host-local scalars (numpy lr/key) ride
            # the replicated in_shardings
            lr = np.float32(lr_at_epoch(cfg, epoch))
            epoch_rays = rays_tr[perm].reshape(
                n_batches, cfg.batch_size, 15)
            epoch_ranges = ranges_tr[perm].reshape(
                n_batches, cfg.batch_size)

        rate_step = step

        def _flush_and_report():
            nonlocal t0, rate_step
            last = logger.flush()
            tracker.update(last.get("loss", float("inf")), state)
            if verbose and is_primary:
                rate = cfg.batch_size * (step - rate_step) / max(
                    time.time() - t0, 1e-9)
                t0 = time.time()
                rate_step = step
                print(f"[fit] step {step}/{n_batches * cfg.num_epochs} "
                      f"loss={last.get('loss'):.4f} "
                      f"avg_err={last.get('avg_error'):.3f}m "
                      f"({rate:.0f} rays/s)", flush=True)

        b = 0
        while b < n_batches:
            if step < resume_step:
                step += 1
                b += 1
                continue
            # full scan chunks whenever K whole batches fit in every limit;
            # edges (epoch tail, max_steps tail) fall through to single steps
            if (scan_k > 1 and b + scan_k <= n_batches
                    and (max_steps is None or step + scan_k <= max_steps)):
                rb = epoch_rays[b:b + scan_k]
                gb = epoch_ranges[b:b + scan_k]
                kk, s0 = key, jnp.int32(step)
                if mesh is not None:
                    from pcnerf_tpu.parallel.multihost import \
                        host_shard_batch_stack
                    rb, gb = host_shard_batch_stack(mesh, rb, gb)
                    kk, s0 = np.asarray(key), np.int32(step)
                with timer.step(scale=scan_k):
                    state, ms = train_scan(state, rb, gb, kk, lr, s0)
                timer.mark_complete(ms["loss"][-1])
                logger.log_block(step, ms, scan_k)
                step += scan_k
                b += scan_k
                _flush_and_report()
                continue
            k = jax.random.fold_in(key, step)
            rb, gb = epoch_rays[b], epoch_ranges[b]
            if mesh is not None:
                from pcnerf_tpu.parallel.multihost import host_shard_batch
                rb, gb = host_shard_batch(mesh, rb, gb)
                k = np.asarray(k)
            profiling = epoch == 0 and 1 <= step <= profile_steps
            with trace(os.path.join(out_dir, "trace"), enabled=profiling):
                with timer.step():
                    state, metrics = train_step(state, rb, gb, k, lr)
                if profiling or step % cfg.log_every == cfg.log_every - 1:
                    timer.mark_complete(metrics["loss"])
            logger.log_step(step, metrics)
            step += 1
            b += 1
            if step % cfg.log_every == 0:
                _flush_and_report()
            if max_steps is not None and step >= max_steps:
                break
        if max_steps is not None and step >= max_steps:
            break

        m = run_validation(cfg, state, val_step, rays_val, ranges_val,
                           jax.random.fold_in(key, 10_000 + epoch), mesh=mesh)
        logger.log_val(step, m)
        if verbose and is_primary:
            print(f"[fit] epoch {epoch} val: {m}", flush=True)

    last = logger.flush()
    tracker.update(last.get("loss", float("inf")), state)
    tracker.final()   # flush any debounce-held best/last candidate (all
    #                   processes: the orbax save is collective)
    logger.close()
    if is_primary:
        timer.save(os.path.join(out_dir, "step_times.json"))
        # completion sentinel: written ONLY after the final checkpoint
        # flush, so "DONE exists" <=> "this out_dir's best/ checkpoint is
        # from a finished training" — the guard queue scripts must use
        # (not best/ existence)
        import json as _json
        with open(done_path, "w") as f:
            _json.dump({"step": int(step), "epochs": cfg.num_epochs,
                        "planned_steps": n_batches * cfg.num_epochs,
                        "max_steps": max_steps}, f)
    return state
