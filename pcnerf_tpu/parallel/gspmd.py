"""GSPMD data-parallel training: the single-chip train/val step jitted with
sharding annotations over a ``('dp', 'tp')`` mesh.

This is ``fit()``'s default multi-device path (train/loop.py) and the
scaling-book recipe applied: annotate the ray batch as sharded over ``dp``
and the parameters as replicated, and let XLA's SPMD partitioner insert the
collectives — the gradient all-reduce, the global BatchNorm batch-statistics
reduction (sync BN), and the psum'd per-child segment sums all fall out of
partitioning the single-chip program.  (Reference counterpart: none — the
reference is pinned to one GPU, ``train_kitti.py:287-288``; SURVEY.md §2.4
names this the new capability to build.)

Why this instead of the explicit ``shard_map`` step (sharded.py) inside
``fit()``:

- **bit-identical semantics by construction**: the program is the global
  single-chip program; losses, BN statistics and per-child groupings are
  global-batch quantities with no local-mean reassembly, and partitionable
  threefry makes every ``jax.random`` draw sharding-invariant, so an
  N-device run reproduces the 1-device loss sequence step for step;
- the optimizer update stays fully local (replicated params, replicated
  Adam moments) with exactly one gradient all-reduce per step over ICI.

The ``shard_map`` path remains for explicit tensor parallelism (column/row
MLP sharding with per-layer psums) and as an independent cross-check in
tests/test_sharding.py.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pcnerf_tpu.config import TrainConfig
from pcnerf_tpu.train.system import (TrainState, make_train_scan,
                                     make_train_step, make_val_step)


def mesh_is_multiprocess(mesh: Mesh) -> bool:
    """True when the mesh's devices span more than one process — host-local
    values must then be assembled into global arrays per process
    (multihost.make_global) instead of device_put from one host."""
    return len({d.process_index for d in mesh.devices.flat}) > 1


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place a TrainState fully replicated on the mesh.  On a multi-process
    mesh every process supplies its (identical, same-PRNGKey) host copy via
    the addressable-shard callback; single-process keeps the cheaper
    device_put."""
    if mesh_is_multiprocess(mesh):
        from pcnerf_tpu.parallel.multihost import replicate_tree
        return replicate_tree(mesh, state)
    return jax.device_put(state, NamedSharding(mesh, P()))


def make_gspmd_train_step(cfg: TrainConfig, mesh: Mesh):
    """(state, rays, gt, key, lr) -> (state, metrics), rays/gt sharded over
    ``dp``, everything else replicated.  Identical math to the single-chip
    step — same function, partitioned by XLA."""
    raw = make_train_step(cfg, jit=False)
    repl = NamedSharding(mesh, P())
    rays_s = NamedSharding(mesh, P("dp", None))
    gt_s = NamedSharding(mesh, P("dp"))
    return jax.jit(raw,
                   in_shardings=(repl, rays_s, gt_s, repl, repl),
                   out_shardings=(repl, repl),
                   donate_argnums=(0,))


def make_gspmd_train_scan(cfg: TrainConfig, mesh: Mesh):
    """The multi-step ``lax.scan`` trainer (train/system.py:make_train_scan)
    under the dp mesh: the (K, B, 15) batch stack is sharded over ``dp`` on
    the batch axis, params/opt/BN replicated — same math, one dispatch and
    one gradient all-reduce chain per K steps."""
    raw = make_train_scan(cfg, jit=False)
    repl = NamedSharding(mesh, P())
    rays_s = NamedSharding(mesh, P(None, "dp", None))
    gt_s = NamedSharding(mesh, P(None, "dp"))
    return jax.jit(raw,
                   in_shardings=(repl, rays_s, gt_s, repl, repl, repl),
                   out_shardings=(repl, repl),
                   donate_argnums=(0,))


def make_gspmd_val_step(cfg: TrainConfig, mesh: Mesh):
    """Validation step over the mesh; predicted/gt points come back fully
    REPLICATED (XLA inserts the all-gather): they are fetched to host for
    CD/F on every process, and a replicated output is host-fetchable on a
    multi-process mesh where a dp-sharded one is not (fit()'s validation is
    process-count-agnostic, tests/test_multihost.py)."""
    raw = make_val_step(cfg, jit=False)
    repl = NamedSharding(mesh, P())
    rays_s = NamedSharding(mesh, P("dp", None))
    gt_s = NamedSharding(mesh, P("dp"))
    return jax.jit(raw,
                   in_shardings=(repl, rays_s, gt_s, repl),
                   out_shardings=(repl, repl, repl))
