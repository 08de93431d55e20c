"""Sharded training: the single-chip train step lifted onto a (dp, tp) mesh
with ``shard_map``.

Placement:
  - rays/ranges: sharded over ``dp``, replicated over ``tp``;
  - MLP layers: even layers column-parallel (output features sharded over
    ``tp``, BatchNorm parameters and running stats sharded with them), odd
    layers row-parallel (input dim sharded; one psum over ``tp`` inside the
    forward); head and odd-layer BN replicated;
  - gradients: pmean over ``dp`` (XLA lowers this to an ICI all-reduce
    overlapped with the backward where possible); tp-sharded parameters need
    no tp reduction — their gradients are per-shard by construction;
  - BatchNorm batch statistics: pmean over ``dp`` (sync BN), keeping the
    N-chip run statistically identical to 1-chip;
  - optimizer state (Adam moments) shards exactly like the parameters, so
    the update is fully local.

There is no pipeline axis: the whole 9-layer MLP fits in VMEM many times
over, so PP would only add bubbles; the reference has no attention/experts,
so SP/EP do not apply (SURVEY.md section 2.4).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pcnerf_tpu.config import TrainConfig
from pcnerf_tpu.train.system import TrainState, make_optimizer, make_train_step


def _model_pspecs():
    """PartitionSpec pytree for one NOF model's params."""
    layers = []
    for i in range(8):
        if i % 2 == 0:   # column-parallel
            layers.append({"w": P(None, "tp"), "b": P("tp"),
                           "scale": P("tp"), "bias": P("tp")})
        else:            # row-parallel
            layers.append({"w": P("tp", None), "b": P(),
                           "scale": P(), "bias": P()})
    return {"layers": layers, "head": {"w": P(), "b": P()}}


def _bn_pspecs():
    return {"mean": [P("tp") if i % 2 == 0 else P() for i in range(8)],
            "var": [P("tp") if i % 2 == 0 else P() for i in range(8)]}


def param_pspecs() -> TrainState:
    """PartitionSpec pytree matching a TrainState."""
    params = {"coarse": _model_pspecs(), "fine": _model_pspecs()}
    bn = {"coarse": _bn_pspecs(), "fine": _bn_pspecs()}
    opt = (optax.EmptyState(),
           optax.ScaleByAdamState(count=P(), mu=params, nu=params))
    return TrainState(params=params, bn=bn, opt_state=opt, step=P())


def shard_train_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place a replicated TrainState onto the mesh per :func:`param_pspecs`."""
    specs = param_pspecs()
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs)


def make_sharded_train_step(cfg: TrainConfig, mesh: Mesh):
    """shard_map'd train step: (state, rays, gt, key, lr) -> (state, metrics).

    rays: (B, 15) global batch, B divisible by the dp size.
    """
    inner = make_train_step(cfg, axis_name="dp", tp_axis="tp", donate=False)
    state_spec = param_pspecs()

    def step(state, rays, gt, key, lr):
        key = jax.random.fold_in(key, jax.lax.axis_index("dp"))
        return inner(state, rays, gt, key, lr)

    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=(state_spec, P("dp", None), P("dp"), P(), P()),
        out_specs=(state_spec, P()),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,))
