"""Multi-chip sharded train step on the 8-device virtual CPU mesh:
dp x tp correctness vs the single-chip step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcnerf_tpu.config import LossConfig, ModelConfig, RenderConfig, TrainConfig
from pcnerf_tpu.parallel import make_mesh, make_sharded_train_step, shard_train_state
from pcnerf_tpu.train import init_train_state, make_train_step


def _cfg():
    return TrainConfig(
        batch_size=64,
        model=ModelConfig(feature_size=64, n_freq=4),
        render=RenderConfig(n_samples=32, n_importance=64, perturb=0.0,
                            noise_std=0.0),
        loss=LossConfig(sub_nerf_count=16),
    )


def _batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    B = cfg.batch_size
    dirs = rng.normal(size=(B, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    r = rng.uniform(10, 30, B).astype(np.float32)
    rays = np.zeros((B, 15), np.float32)
    rays[:, 3:6] = dirs
    rays[:, 6] = 0.5
    rays[:, 7] = 40.0
    rays[:, 8] = 3
    rays[:, 9] = rng.integers(1, 17, B)
    rays[:, 10] = r - 1
    rays[:, 11] = r + 1
    rays[:, 12] = r - 0.05
    rays[:, 13] = r + 1
    rays[:, 14] = r
    return jnp.asarray(rays), jnp.asarray(r)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_step_matches_single_chip():
    cfg = _cfg()
    rays, gt = _batch(cfg)
    key = jax.random.PRNGKey(0)
    lr = jnp.float32(5e-4)

    single = make_train_step(cfg)
    state0 = init_train_state(jax.random.PRNGKey(1), cfg)
    s1, m1 = single(state0, rays, gt, key, lr)

    mesh = make_mesh(8, tp=2)
    sharded_step = make_sharded_train_step(cfg, mesh)
    state0b = shard_train_state(init_train_state(jax.random.PRNGKey(1), cfg),
                                mesh)
    s2, m2 = sharded_step(state0b, rays, gt, key, lr)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-4)
    # parameters after one update agree (perturb/noise off => deterministic)
    for i in (0, 1, 7):
        np.testing.assert_allclose(
            np.asarray(s1.params["coarse"]["layers"][i]["w"]),
            np.asarray(s2.params["coarse"]["layers"][i]["w"]),
            atol=2e-5, err_msg=f"layer {i}")
    np.testing.assert_allclose(np.asarray(s1.params["fine"]["head"]["w"]),
                               np.asarray(s2.params["fine"]["head"]["w"]),
                               atol=2e-5)
    # BN running stats (sync BN) agree with the full-batch stats
    np.testing.assert_allclose(np.asarray(s1.bn["coarse"]["var"][0]),
                               np.asarray(s2.bn["coarse"]["var"][0]),
                               rtol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_divide_losses_match_single_chip_under_dp():
    """use_child_nerf_divide=True under dp: the per-child grouping must run
    over the GLOBAL batch (psum'd segment sums/counts) and the pmean'd
    gradient must equal the single-chip gradient (VERDICT round-1 #5).

    The child distribution is deliberately nonuniform: most rays land in
    child 1, several children appear on only one shard, child 16 never
    appears — exercising the count>=1 guards across shard boundaries."""
    import dataclasses
    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, loss=dataclasses.replace(cfg.loss, use_child_nerf_divide=True,
                                      lambda_child_free=1e3,
                                      lambda_child_depth=1e2))
    rays, gt = _batch(cfg, seed=7)
    # nonuniform children: half the batch in child 1, a few singletons
    ids = np.asarray(rays[:, 9]).copy()
    ids[: cfg.batch_size // 2] = 1
    ids[cfg.batch_size // 2:cfg.batch_size // 2 + 5] = [11, 12, 13, 14, 15]
    rays = rays.at[:, 9].set(jnp.asarray(ids))

    key = jax.random.PRNGKey(0)
    lr = jnp.float32(5e-4)
    single = make_train_step(cfg)
    s1, m1 = single(init_train_state(jax.random.PRNGKey(1), cfg),
                    rays, gt, key, lr)

    mesh = make_mesh(8, tp=1)
    step = make_sharded_train_step(cfg, mesh)
    state0 = shard_train_state(init_train_state(jax.random.PRNGKey(1), cfg),
                               mesh)
    s2, m2 = step(state0, rays, gt, key, lr)

    for k in ("loss", "loss_range", "child_free_loss", "child_depth_loss"):
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=2e-4,
                                   err_msg=k)
    for i in (0, 3, 7):
        np.testing.assert_allclose(
            np.asarray(s1.params["coarse"]["layers"][i]["w"]),
            np.asarray(s2.params["coarse"]["layers"][i]["w"]),
            atol=2e-5, err_msg=f"layer {i}")
    np.testing.assert_allclose(np.asarray(s1.params["fine"]["head"]["w"]),
                               np.asarray(s2.params["fine"]["head"]["w"]),
                               atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_only_mesh():
    cfg = _cfg()
    rays, gt = _batch(cfg, seed=3)
    mesh = make_mesh(8, tp=1)
    step = make_sharded_train_step(cfg, mesh)
    state = shard_train_state(init_train_state(jax.random.PRNGKey(2), cfg),
                              mesh)
    state, m = step(state, rays, gt, jax.random.PRNGKey(0), jnp.float32(5e-4))
    assert np.isfinite(float(m["loss"]))
