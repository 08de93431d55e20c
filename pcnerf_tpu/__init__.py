"""pcnerf_tpu — a TPU-native (JAX/XLA/Pallas) framework for parent–child neural
radiance fields over sparse LiDAR frames, built from scratch with the
capabilities of the PC-NeRF reference (IEEE TIV 2024, arXiv:2402.09325).

Layering (mirrors SURVEY.md §1, re-designed TPU-first):

- ``pcnerf_tpu.data``        ray-buffer compiler, PCD/pose IO, dataset registry
- ``pcnerf_tpu.models``      positional embedding + NOF occupancy MLP family
- ``pcnerf_tpu.ops``         ray/AABB geometry, sampling, compositing, kernels
- ``pcnerf_tpu.train``       jitted train/val steps, optimizer, checkpointing
- ``pcnerf_tpu.eval``        one/two-step depth inference engine + metrics
- ``pcnerf_tpu.parallel``    device meshes, shard_map train step, collectives
- ``pcnerf_tpu.preprocess``  fusion / ground filter / clustering / grid split
- ``pcnerf_tpu.native``      C++ acceleration (ground filter, clustering)

Everything on the compute path is functional JAX: params are pytrees, steps are
``jit``-compiled pure functions, multi-chip scaling is a ``Mesh`` + shardings.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: on the tunneled axon backend a cold
# compile of the train step takes minutes (remote compile service); the
# cache turns reruns into seconds.  Opt out with PCNERF_NO_JAX_CACHE=1.
if not _os.environ.get("PCNERF_NO_JAX_CACHE"):
    import jax as _jax

    _cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                      ".jax_cache"))
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

from pcnerf_tpu.config import (  # noqa: F401
    ModelConfig,
    RenderConfig,
    LossConfig,
    OptimConfig,
    DataConfig,
    TrainConfig,
    EvalConfig,
)
