"""Device mesh construction.

The scaling axes for this workload (SURVEY.md section 2.4):

- ``dp``: rays — the dominant axis; LiDAR rays are embarrassingly parallel
  up to the gradient all-reduce and the synchronized BatchNorm statistics.
- ``tp``: the MLP feature dimension — Megatron-style alternating
  column/row-parallel layers (models/nof.py).

On a multi-host pod slice, call :func:`init_distributed` first; the mesh is
then laid out so ``tp`` stays inside a host's ICI domain and ``dp`` spans
hosts (gradient psum rides ICI within a host and DCN across, which matches
the bandwidth hierarchy: tp communicates activations every other layer, dp
only gradients once per step).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(coordinator: str | None = None, num_processes=None,
                     process_id=None) -> None:
    """Multi-host runtime init (no-op on a single host)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mesh(n_devices: int | None = None, tp: int = 1,
              devices=None) -> Mesh:
    """Mesh with axes ('dp', 'tp'); dp = n_devices // tp."""
    if devices is None:
        devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    n = len(devices)
    if n % tp != 0:
        raise ValueError(f"{n} devices not divisible by tp={tp}")
    arr = np.asarray(devices).reshape(n // tp, tp)
    return Mesh(arr, ("dp", "tp"))
