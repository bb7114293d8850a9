"""PPO math + trainer tests (SURVEY.md §4: GAE golden values, network
shapes, end-to-end train-iteration smoke)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from booster_gym_tpu.algo import ActorCritic, PPO, discount_values
from booster_gym_tpu.algo.networks import normal_entropy, normal_kl, normal_log_prob
from booster_gym_tpu.envs import make_task
from booster_gym_tpu.utils.config import load_task_cfg


def reference_gae(rewards, dones, values, last_values, gamma, lam):
    """Direct numpy port of the reference recurrence (utils/utils.py:33-44)
    as an independent oracle."""
    T = rewards.shape[0]
    advantages = np.zeros_like(rewards)
    last_advantage = np.zeros_like(rewards[-1])
    for t in reversed(range(T)):
        nonterminal = 1.0 - dones[t].astype(np.float64)
        next_values = last_values if t == T - 1 else values[t + 1]
        delta = rewards[t] + gamma * nonterminal * next_values - values[t]
        last_advantage = delta + gamma * lam * nonterminal * last_advantage
        advantages[t] = last_advantage
    return advantages


def test_gae_matches_reference_recurrence():
    rng = np.random.default_rng(0)
    T, B = 24, 16
    rewards = rng.normal(size=(T, B))
    dones = rng.random((T, B)) < 0.05
    values = rng.normal(size=(T, B))
    last_values = rng.normal(size=B)
    ours = np.asarray(discount_values(
        jnp.asarray(rewards, jnp.float32), jnp.asarray(dones),
        jnp.asarray(values, jnp.float32), jnp.asarray(last_values, jnp.float32),
        0.995, 0.95))
    expect = reference_gae(rewards, dones, values, last_values, 0.995, 0.95)
    np.testing.assert_allclose(ours, expect, rtol=1e-4, atol=1e-4)


def test_normal_math():
    rng = np.random.default_rng(1)
    mu = jnp.asarray(rng.normal(size=(5, 12)), jnp.float32)
    std = jnp.asarray(np.exp(rng.normal(size=(5, 12)) * 0.1), jnp.float32)
    x = jnp.asarray(rng.normal(size=(5, 12)), jnp.float32)
    # against scipy
    from scipy import stats

    lp = stats.norm.logpdf(np.asarray(x), np.asarray(mu), np.asarray(std)).sum(-1)
    np.testing.assert_allclose(np.asarray(normal_log_prob(mu, std, x)), lp, rtol=1e-4)
    ent = stats.norm.entropy(np.asarray(mu), np.asarray(std)).sum(-1)
    np.testing.assert_allclose(np.asarray(normal_entropy(std)), ent, rtol=1e-4)
    # KL identity: KL(p ‖ p) = 0
    np.testing.assert_allclose(np.asarray(normal_kl(mu, std, mu, std)), 0.0, atol=1e-5)


def test_network_shapes_and_logstd():
    net = ActorCritic(12, 47, 14)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((3, 47)), jnp.zeros((3, 14)))
    mu, std = net.apply(params, jnp.zeros((3, 47)), method=ActorCritic.act)
    assert mu.shape == (3, 12) and std.shape == (3, 12)
    np.testing.assert_allclose(np.asarray(std), np.exp(-2.0), rtol=1e-5)
    v = net.apply(params, jnp.zeros((3, 47)), jnp.zeros((3, 14)),
                  method=ActorCritic.est_value)
    assert v.shape == (3,)


@pytest.fixture(scope="module")
def tiny_trainer():
    cfg = load_task_cfg("T1")
    cfg["env"]["num_envs"] = 8
    cfg["terrain"]["type"] = "plane"
    cfg["runner"]["horizon_length"] = 8
    cfg["runner"]["mini_epochs"] = 2
    env = make_task(cfg)
    ppo = PPO(env, cfg)
    env_params, ts = jax.jit(ppo.init)(jax.random.PRNGKey(0))
    return ppo, env_params, ts


def test_train_iteration_runs(tiny_trainer):
    ppo, env_params, ts = tiny_trainer
    step = jax.jit(ppo.train_iteration)
    ts2, metrics = step(env_params, ts)
    for k, v in metrics.items():
        assert np.all(np.isfinite(np.asarray(v))), k
    assert int(ts2.iteration) == 1
    # params actually changed
    diff = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), ts.params, ts2.params)
    assert max(jax.tree.leaves(diff)) > 0

    ts3, metrics3 = step(env_params, ts2)
    assert int(ts3.iteration) == 2
    assert np.isfinite(metrics3["kl_mean"])


def test_adaptive_lr_bounds(tiny_trainer):
    ppo, env_params, ts = tiny_trainer
    step = jax.jit(ppo.train_iteration)
    lr = float(ts.lr)
    for _ in range(3):
        ts, metrics = step(env_params, ts)
    assert 1e-5 - 1e-9 <= float(ts.lr) <= 1e-2 + 1e-9


def test_flat_optimizer_matches_optax(tiny_trainer):
    """PPO._flat_optimizer_step == optax.chain(clip_by_global_norm,
    inject_hyperparams(adam)) tree-exactly: same params, same optimizer
    state (counts, mu, nu, hyperparams), both below and above the
    grad-norm clip threshold."""
    import optax

    ppo, env_params, ts = tiny_trainer
    params = ts.params
    opt_state = ts.opt_state
    lr = jnp.asarray(3e-4, jnp.float32)

    for scale in (1e-3, 1e3):   # far below / far above clip=1.0
        key = jax.random.PRNGKey(int(scale))
        leaves, treedef = jax.tree.flatten(params)
        ks = jax.random.split(key, len(leaves))
        grads = jax.tree.unflatten(
            treedef, [scale * jax.random.normal(k, l.shape)
                      for k, l in zip(ks, leaves)])

        inject = opt_state[1]._replace(
            hyperparams={**opt_state[1].hyperparams, "learning_rate": lr})
        updates, ref_state = ppo.tx.update(
            grads, (opt_state[0], inject), params)
        ref_params = optax.apply_updates(params, updates)

        got_params, got_state = jax.jit(ppo._flat_optimizer_step)(
            grads, params, opt_state, lr)

        for a, b in zip(jax.tree.leaves(got_params),
                        jax.tree.leaves(ref_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
        assert (jax.tree.structure(got_state)
                == jax.tree.structure(ref_state))
        for a, b in zip(jax.tree.leaves(got_state),
                        jax.tree.leaves(ref_state)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-8)
