"""Multi-device data-parallel tests on the 8 virtual CPU devices
(SURVEY.md §4: multi-host tests runnable on CPU via
xla_force_host_platform_device_count)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from booster_gym_tpu.algo import PPO
from booster_gym_tpu.envs import make_task
from booster_gym_tpu.parallel import make_mesh, shard_batch_pytree
from booster_gym_tpu.utils.config import load_task_cfg


@pytest.fixture(scope="module")
def sharded_trainer():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    cfg = load_task_cfg("T1")
    cfg["env"]["num_envs"] = 16
    cfg["terrain"]["type"] = "plane"
    cfg["runner"]["horizon_length"] = 4
    cfg["runner"]["mini_epochs"] = 2
    env = make_task(cfg)
    ppo = PPO(env, cfg)
    env_params, ts = ppo.init(jax.random.PRNGKey(0))
    mesh = make_mesh(8)
    ppo.set_mesh(mesh)  # fused update kernels need shard_map under a mesh
    env_params = shard_batch_pytree(mesh, env_params, 16)
    ts = shard_batch_pytree(mesh, ts, 16)
    return ppo, env_params, ts, mesh


def test_env_batch_is_sharded(sharded_trainer):
    ppo, env_params, ts, mesh = sharded_trainer
    # env-state leaves with the batch axis are split over dp
    sharding = ts.env_state.sim.q.sharding
    assert len(sharding.device_set) == 8
    # params are replicated
    leaf = jax.tree.leaves(ts.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_sharded_train_iteration_runs(sharded_trainer):
    ppo, env_params, ts, mesh = sharded_trainer
    step = jax.jit(ppo.train_iteration)
    ts2, metrics = step(env_params, ts)
    for k, v in metrics.items():
        assert np.all(np.isfinite(np.asarray(v))), k
    # params stay replicated after the gradient update (XLA inserts the
    # psum over dp — the scaling-book recipe, no hand-written collectives)
    leaf = jax.tree.leaves(ts2.params)[0]
    assert leaf.sharding.is_fully_replicated
    ts3, metrics3 = step(env_params, ts2)
    assert np.isfinite(float(metrics3["kl_mean"]))


def test_sharded_matches_single_device(sharded_trainer):
    """Same seed, sharded vs unsharded: metrics agree to f32 tolerance."""
    ppo, env_params, ts, mesh = sharded_trainer
    step = jax.jit(ppo.train_iteration)
    _, m_sharded = step(env_params, ts)

    ppo1 = PPO(ppo.env, ppo.cfg)  # no mesh: plain single-device kernels
    env_params1, ts1 = ppo1.init(jax.random.PRNGKey(0))
    _, m_single = jax.jit(ppo1.train_iteration)(env_params1, ts1)
    np.testing.assert_allclose(
        float(m_sharded["reward"]), float(m_single["reward"]), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(
        float(m_sharded["value_loss"]), float(m_single["value_loss"]), rtol=5e-2)
