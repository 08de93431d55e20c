"""Multi-host runtime: process-spanning meshes and per-host data sharding.

Reference counterpart: none — the reference is a single process on one GPU
(``train_kitti.py:287-288``); this is the SURVEY §2.4 north-star capability.

Design:

- ``jax.distributed.initialize`` (mesh.init_distributed) brings up the
  cross-process runtime; after it, ``jax.devices()`` is the GLOBAL device
  list and a mesh built from it spans hosts.  dp is laid out to span hosts
  (gradients all-reduce once per step over DCN) while any tp stays inside a
  host's ICI domain (mesh.make_mesh).
- Data is sharded per host, never gathered: every process derives the SAME
  epoch permutation from (seed, epoch) — a deterministic global shuffle with
  no communication — and materializes only the rows of its addressable
  shards via ``jax.make_array_from_callback`` (:func:`make_global`).
- Replicated leaves (params, opt state) are assembled the same way; each
  process holds the full value (same PRNGKey init), so the callback is a
  plain copy.

The GSPMD train step (gspmd.py) is process-count-agnostic: the same jitted
program runs on 1 process x 8 virtual devices or 2 processes x 4, producing
identical losses (tests/test_multihost.py spawns real processes and asserts
equality with the single-process run).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_global(mesh: Mesh, pspec: P, value: np.ndarray) -> jax.Array:
    """Assemble a global array on the mesh from host-local data.

    Only the addressable shards' rows of ``value`` are read on each process
    — for a dp-sharded batch this is the per-host data sharding: no process
    ever materializes another host's rays on device.
    """
    sharding = NamedSharding(mesh, pspec)
    return jax.make_array_from_callback(value.shape, sharding,
                                        lambda idx: value[idx])


def replicate_tree(mesh: Mesh, tree):
    """Replicate a pytree of host-local arrays onto every device of a
    (possibly multi-process) mesh.  Every process must hold the same values
    (e.g. params initialized from the same PRNGKey)."""
    return jax.tree.map(
        lambda v: make_global(mesh, P(), np.asarray(v)), tree)


def epoch_permutation(seed: int, epoch: int, n_rays: int) -> np.ndarray:
    """Deterministic global shuffle: every process computes the identical
    permutation with no communication (fit() uses the same construction)."""
    return np.random.default_rng(seed + epoch).permutation(n_rays)


def host_shard_batch(mesh: Mesh, rays: np.ndarray, ranges: np.ndarray
                     ) -> Tuple[jax.Array, jax.Array]:
    """Place one global (B, 15)/(B,) batch dp-sharded onto the mesh, each
    process supplying only its addressable rows."""
    return (make_global(mesh, P("dp", None), rays),
            make_global(mesh, P("dp"), ranges))


def host_shard_batch_stack(mesh: Mesh, rays: np.ndarray, ranges: np.ndarray
                           ) -> Tuple[jax.Array, jax.Array]:
    """Place a (K, B, 15)/(K, B) scan-chunk stack onto the mesh, dp-sharded
    on the BATCH axis (axis 1) — the layout make_gspmd_train_scan expects."""
    return (make_global(mesh, P(None, "dp", None), rays),
            make_global(mesh, P(None, "dp"), ranges))
