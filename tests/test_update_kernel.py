"""Fused-update Pallas kernels vs jax.grad of the XLA loss.

The kernel hand-derives the gradients of the reference PPO loss
(utils/runner.py:131-164: clipped surrogate + value + bound losses; the
entropy term is closed-form in logstd and added by the caller).  These
tests check, in interpret mode on CPU, that the kernel's gradients match
jax.grad of the identical loss built from the flax networks — including
the subgradient conventions at clip boundaries and max ties — across
tile-accumulation, row padding/masking, and the shard_map (mesh) path.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from booster_gym_tpu.algo.networks import ActorCritic, normal_log_prob
from booster_gym_tpu.algo.update_kernel import FusedUpdate


def _make(compute_dtype, T=3, B=96, seed=0):
    no, npv, na = 47, 14, 12
    net = ActorCritic(na, no, npv, compute_dtype=compute_dtype)
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    params = net.init(ks[0], jnp.zeros((1, no)), jnp.zeros((1, npv)))
    obs = jax.random.normal(ks[1], (T, B, no))
    priv = jax.random.normal(ks[2], (T, B, npv))
    act = 0.1 * jax.random.normal(ks[3], (T, B, na))
    adv = jax.random.normal(ks[4], (T, B))
    ret = jax.random.normal(ks[5], (T, B))
    # old_logp near the current policy so ratios straddle the clip range
    mu0, std0 = net.apply(params, obs, method=ActorCritic.act)
    old_logp = normal_log_prob(mu0, std0, act) + 0.3 * jax.random.normal(
        ks[6], (T, B))
    return net, params, obs, priv, act, adv, ret, old_logp


def _xla_loss(net, clip_ratio=0.2, bound_coef=10.0):
    def loss_fn(p, obs, priv, act, adv, ret, old_logp):
        mu, std = net.apply(p, obs, method=ActorCritic.act)
        values = net.apply(p, obs, priv, method=ActorCritic.est_value)
        value_loss = jnp.mean(jnp.square(values - ret))
        logp = normal_log_prob(mu, std, act)
        ratio = jnp.exp(logp - old_logp)
        surr = -adv * ratio
        surr_c = -adv * jnp.clip(ratio, 1.0 - clip_ratio, 1.0 + clip_ratio)
        actor_loss = jnp.mean(jnp.maximum(surr, surr_c))
        bound = (jnp.mean(jnp.square(jnp.clip(mu - 1.0, min=0.0)))
                 + jnp.mean(jnp.square(jnp.clip(mu + 1.0, max=0.0))))
        return value_loss + actor_loss + bound_coef * bound
    return loss_fn


def _assert_tree_close(a, b, rtol, atol):
    flat_a, _ = jax.tree.flatten(a)
    flat_b, _ = jax.tree.flatten(b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


def test_grads_match_xla_f32():
    """f32 compute: the kernel's hand-derived gradients equal jax.grad of
    the identical loss — the exactness anchor for the backward math."""
    net, params, obs, priv, act, adv, ret, old_logp = _make("f32")
    # tile=128 with N=288 rows: 3 grid steps — exercises cross-tile f32
    # accumulation AND 96 masked padding rows
    fused = FusedUpdate(47, 14, 12, clip_ratio=0.2, bound_coef=10.0,
                        compute_dtype="f32", tile=128, interpret=True)
    grads, mu, val = jax.jit(fused.grads)(
        params, obs, priv, act, adv, ret, old_logp)

    ref_grads = jax.jit(jax.grad(_xla_loss(net)))(
        params, obs, priv, act, adv, ret, old_logp)
    mu_ref, _ = net.apply(params, obs, method=ActorCritic.act)
    val_ref = net.apply(params, obs, priv, method=ActorCritic.est_value)

    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref),
                               rtol=2e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(val), np.asarray(val_ref),
                               rtol=2e-4, atol=1e-7)
    _assert_tree_close(grads, ref_grads, rtol=2e-4, atol=1e-7)


def test_grads_bf16_at_least_as_accurate_as_xla_bf16():
    """bf16 compute: the two bf16 paths round differently (the kernel
    accumulates weight grads in f32 and computes ELU in f32), so instead of
    comparing them to each other, both are compared against the f32-truth
    gradient — the kernel must be no farther from truth than XLA's bf16
    path on every leaf (it is in fact 2-4x closer)."""
    net32, params, obs, priv, act, adv, ret, old_logp = _make("f32")
    g_true = jax.jit(jax.grad(_xla_loss(net32)))(
        params, obs, priv, act, adv, ret, old_logp)
    net16 = ActorCritic(12, 47, 14, compute_dtype="bf16")
    g_xla16 = jax.jit(jax.grad(_xla_loss(net16)))(
        params, obs, priv, act, adv, ret, old_logp)
    fused = FusedUpdate(47, 14, 12, clip_ratio=0.2, bound_coef=10.0,
                        compute_dtype="bf16", tile=128, interpret=True)
    g_k16, mu, val = jax.jit(fused.grads)(
        params, obs, priv, act, adv, ret, old_logp)

    mu_ref, _ = net16.apply(params, obs, method=ActorCritic.act)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref),
                               rtol=0.05, atol=5e-3)
    for t, x, k in zip(jax.tree.leaves(g_true), jax.tree.leaves(g_xla16),
                       jax.tree.leaves(g_k16)):
        err_xla = float(jnp.max(jnp.abs(x - t)))
        err_kern = float(jnp.max(jnp.abs(k - t)))
        assert err_kern <= 1.5 * err_xla + 1e-6, (err_kern, err_xla)


def test_values_match_est_value():
    net, params, obs, priv, *_ = _make("f32")
    fused = FusedUpdate(47, 14, 12, clip_ratio=0.2, bound_coef=10.0,
                        compute_dtype="f32", tile=128, interpret=True)
    vals = jax.jit(fused.values)(params, obs, priv)
    ref = net.apply(params, obs, priv, method=ActorCritic.est_value)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref),
                               rtol=1e-5, atol=1e-7)


def test_grads_under_mesh_match_single_device():
    """shard_map path: per-device kernels + gradient psum must equal the
    single-device full-batch gradient exactly (global-N mean scaling)."""
    from booster_gym_tpu.parallel import make_mesh

    net, params, obs, priv, act, adv, ret, old_logp = _make("f32", B=64)
    single = FusedUpdate(47, 14, 12, clip_ratio=0.2, bound_coef=10.0,
                         compute_dtype="f32", tile=128, interpret=True)
    g1, mu1, v1 = jax.jit(single.grads)(
        params, obs, priv, act, adv, ret, old_logp)

    mesh = make_mesh(8)
    sharded = FusedUpdate(47, 14, 12, clip_ratio=0.2, bound_coef=10.0,
                          compute_dtype="f32", tile=128, interpret=True,
                          mesh=mesh)
    g8, mu8, v8 = jax.jit(sharded.grads)(
        params, obs, priv, act, adv, ret, old_logp)

    # per-device row tiles reassociate the f32 dot accumulation -> ~1e-7
    # noise in mu/values; the psum adds the same on the gradients
    np.testing.assert_allclose(np.asarray(mu8), np.asarray(mu1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v8), np.asarray(v1),
                               rtol=1e-5, atol=1e-6)
    _assert_tree_close(g8, g1, rtol=1e-5, atol=1e-6)


def _gae_xla(net, params, obs, priv, obs_last, priv_last, rew, done, timeout,
             gamma=0.995, lam=0.95):
    from booster_gym_tpu.algo.ppo import discount_values

    values = net.apply(params, obs, priv, method=ActorCritic.est_value)
    last_values = net.apply(params, obs_last, priv_last,
                            method=ActorCritic.est_value)
    rwd = jnp.where(timeout, values, rew)
    adv = discount_values(rwd, done | timeout, values, last_values,
                          gamma, lam)
    return adv, values + adv


@pytest.mark.parametrize("B", [128, 96])  # 96: masked lane padding
def test_gae_kernel_matches_xla(B):
    """Fused values+GAE kernel == est_value (incl. the in-kernel bootstrap
    value at the last observation) -> timeout bootstrap ->
    discount_values, including the masked advantage sums."""
    net, params, obs, priv, *_ = _make("f32", T=5, B=B)
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    rew = jax.random.normal(ks[0], (5, B))
    done = jax.random.bernoulli(ks[1], 0.2, (5, B))
    timeout = jax.random.bernoulli(ks[2], 0.1, (5, B))
    obs_last = jax.random.normal(ks[3], (B, 47))
    priv_last = jax.random.normal(ks[3], (B, 14))

    adv_ref, ret_ref = jax.jit(functools.partial(_gae_xla, net))(
        params, obs, priv, obs_last, priv_last, rew, done, timeout)

    fused = FusedUpdate(47, 14, 12, clip_ratio=0.2, bound_coef=10.0,
                        compute_dtype="f32", tile=128, interpret=True)
    nonterm = 1.0 - (done | timeout).astype(jnp.float32)
    adv, ret, sa, sa2 = jax.jit(
        functools.partial(fused.gae, gamma=0.995, lam=0.95))(
        params, obs, priv, obs_last, priv_last, rew, nonterm,
        timeout.astype(jnp.float32))

    np.testing.assert_allclose(np.asarray(adv), np.asarray(adv_ref),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret), np.asarray(ret_ref),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(float(sa), float(jnp.sum(adv_ref)),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(sa2), float(jnp.sum(adv_ref ** 2)),
                               rtol=1e-4, atol=1e-4)


def test_grads_stats_matches_grads_and_reference_metrics():
    """grads_stats == grads on pre-normalized advantages, and its metric
    sums reproduce the exact reference formulas computed in XLA."""
    net, params, obs, priv, act, adv, ret, old_logp = _make("f32")
    mean = jnp.mean(adv)
    rstd = 1.0 / (jnp.std(adv, ddof=1) + 1e-8)
    adv_n = (adv - mean) * rstd

    fused = FusedUpdate(47, 14, 12, clip_ratio=0.2, bound_coef=10.0,
                        compute_dtype="f32", tile=128, interpret=True)
    g_ref, mu_ref, val_ref = jax.jit(fused.grads)(
        params, obs, priv, act, adv_n, ret, old_logp)

    mu_old, std_old = net.apply(params, obs, method=ActorCritic.act)
    g, st, mu_out, logp_out = jax.jit(fused.grads_stats)(
        params, obs, priv, act, adv, ret, old_logp, mu_old, mean, rstd)
    # the kernel's forward comes back for the self-consistent old-policy
    # carry: it must equal the flax forward (f32 exactness anchor)
    np.testing.assert_allclose(
        np.asarray(jnp.moveaxis(mu_out, 0, -1)), np.asarray(mu_old),
        rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(logp_out),
                               np.asarray(normal_log_prob(mu_old, std_old, act)),
                               rtol=2e-4, atol=1e-5)
    # grads_stats contracts dW over the lane (sample) axis, grads over the
    # row axis: different f32 summation order, ~1e-7 reassociation noise
    _assert_tree_close(g, g_ref, rtol=2e-4, atol=5e-7)

    # reference metric formulas (utils/runner.py:146-162) on mu/values
    N = mu_ref.shape[0] * mu_ref.shape[1]
    na = 12
    value_loss = jnp.mean(jnp.square(val_ref - ret))
    logp = normal_log_prob(mu_ref, std_old, act)
    ratio = jnp.exp(logp - old_logp)
    surr = -adv_n * ratio
    surr_c = -adv_n * jnp.clip(ratio, 0.8, 1.2)
    actor_loss = jnp.mean(jnp.maximum(surr, surr_c))
    b_hi = jnp.mean(jnp.square(jnp.clip(mu_ref - 1.0, min=0.0)))
    b_lo = jnp.mean(jnp.square(jnp.clip(mu_ref + 1.0, max=0.0)))
    np.testing.assert_allclose(float(st["vl"] / N), float(value_loss),
                               rtol=1e-4)
    np.testing.assert_allclose(float(st["al"] / N), float(actor_loss),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        float(st["bhi"] / (N * na) + st["blo"] / (N * na)),
        float(b_hi + b_lo), rtol=1e-4, atol=1e-9)
    # KL sums: mu_old == mu_new here, so the quadratic term is ~0
    np.testing.assert_allclose(np.asarray(st["klsq"]), 0.0, atol=1e-8)


def test_gae_under_mesh_matches_single_device():
    from booster_gym_tpu.parallel import make_mesh

    net, params, obs, priv, *_ = _make("f32", T=4, B=128)
    ks = jax.random.split(jax.random.PRNGKey(11), 5)
    rew = jax.random.normal(ks[0], (4, 128))
    done = jax.random.bernoulli(ks[1], 0.2, (4, 128))
    timeout = jax.random.bernoulli(ks[2], 0.1, (4, 128))
    obs_last = jax.random.normal(ks[3], (128, 47))
    priv_last = jax.random.normal(ks[4], (128, 14))
    nonterm = 1.0 - (done | timeout).astype(jnp.float32)
    tf = timeout.astype(jnp.float32)

    single = FusedUpdate(47, 14, 12, clip_ratio=0.2, bound_coef=10.0,
                         compute_dtype="f32", tile=128, interpret=True)
    a1, r1, sa1, sa21 = jax.jit(
        functools.partial(single.gae, gamma=0.995, lam=0.95))(
        params, obs, priv, obs_last, priv_last, rew, nonterm, tf)

    sharded = FusedUpdate(47, 14, 12, clip_ratio=0.2, bound_coef=10.0,
                          compute_dtype="f32", tile=128, interpret=True,
                          mesh=make_mesh(8))
    a8, r8, sa8, sa28 = jax.jit(
        functools.partial(sharded.gae, gamma=0.995, lam=0.95))(
        params, obs, priv, obs_last, priv_last, rew, nonterm, tf)
    np.testing.assert_allclose(np.asarray(a8), np.asarray(a1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r8), np.asarray(r1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(sa8), float(sa1), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(sa28), float(sa21), rtol=1e-5,
                               atol=1e-5)


def test_policy_old_logp_matches_flax():
    """The consistency pre-pass (kernel-path mu/old_logp at rollout params)
    equals the flax forward at f32; shapes round-trip through prepare()."""
    net, params, obs, priv, act, adv, ret, old_logp = _make("f32")
    fused = FusedUpdate(47, 14, 12, clip_ratio=0.2, bound_coef=10.0,
                        compute_dtype="f32", tile=128, interpret=True)
    mu_ref, std_ref = net.apply(params, obs, method=ActorCritic.act)
    prep = fused.prepare(obs, priv, act, mu_ref, old_logp)
    muT0, logp0 = jax.jit(fused.policy_old_logp)(params, prep)
    assert muT0.shape == (12,) + obs.shape[:-1]
    assert logp0.shape == obs.shape[:-1]
    np.testing.assert_allclose(
        np.asarray(jnp.moveaxis(muT0, 0, -1)), np.asarray(mu_ref),
        rtol=2e-4, atol=1e-6)
    lp_ref = normal_log_prob(mu_ref, std_ref, act)
    np.testing.assert_allclose(np.asarray(logp0), np.asarray(lp_ref),
                               rtol=2e-4, atol=1e-5)


def test_opt_stage_matches_flat_optimizer():
    """The fused optimizer+staging kernel == PPO._flat_optimizer_step
    (which is itself pinned tree-exactly against optax), plus the staged
    weights equal the cast/transposed updated params."""
    import optax

    from booster_gym_tpu.envs import make_task
    from booster_gym_tpu.algo import PPO
    from booster_gym_tpu.utils.config import load_task_cfg

    cfg = load_task_cfg("T1")
    cfg["env"]["num_envs"] = 4
    cfg["terrain"]["type"] = "plane"
    cfg["algorithm"]["compute_dtype"] = "f32"
    env = make_task(cfg)
    ppo = PPO(env, cfg)
    params = ppo.network.init(jax.random.PRNGKey(0), jnp.zeros((1, 47)),
                              jnp.zeros((1, 14)))
    opt_state = ppo.tx.init(params)
    # a non-trivial optimizer state: run two reference steps first
    key = jax.random.PRNGKey(1)
    for i in range(2):
        key, k = jax.random.split(key)
        g = jax.tree.map(
            lambda p: jax.random.normal(k, p.shape) * 0.5, params)
        params, opt_state = jax.jit(ppo._flat_optimizer_step)(
            g, params, opt_state, jnp.float32(3e-4))

    key, k = jax.random.split(key)
    grads = jax.tree.map(lambda p: jax.random.normal(k, p.shape) * 2.0,
                         params)
    # reference: entropy grad on logstd, then the flat step
    grads_ref = jax.tree.map(lambda x: x, grads)
    grads_ref["params"]["logstd"] = (
        grads_ref["params"]["logstd"] + ppo.entropy_coef)
    lr = jnp.float32(1e-3)
    p_ref, s_ref = jax.jit(ppo._flat_optimizer_step)(
        grads_ref, params, opt_state, lr)

    fused = FusedUpdate(47, 14, 12, clip_ratio=0.2, bound_coef=10.0,
                        compute_dtype="f32", tile=128, interpret=True)
    adam_state = opt_state[1].inner_state[0]
    p2, m2, v2, staged = jax.jit(functools.partial(
        fused.opt_stage, entropy_coef=ppo.entropy_coef, b1=ppo.adam_b1,
        b2=ppo.adam_b2, eps=ppo.adam_eps, max_norm=ppo.grad_norm_clip))(
        fused.param_leaves(grads), fused.param_leaves(params),
        fused.param_leaves(adam_state.mu), fused.param_leaves(adam_state.nu),
        adam_state.count, lr)

    _assert_tree_close(fused.leaves_to_tree(p2), p_ref, rtol=1e-5, atol=1e-7)
    ref_adam = s_ref[1].inner_state[0]
    _assert_tree_close(fused.leaves_to_tree(m2), ref_adam.mu,
                       rtol=1e-5, atol=1e-7)
    _assert_tree_close(fused.leaves_to_tree(v2), ref_adam.nu,
                       rtol=1e-5, atol=1e-7)
    # staged weights are the cast/transposed updated params
    ref_staged = fused.stage_leaves(p2)
    for k2 in ("aWT", "abT", "cWT", "cbT"):
        for a, b in zip(staged[k2], ref_staged[k2]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_iteration_fused_matches_xla():
    """Full train_iteration: fused vs xla update backends, f32 compute —
    identical rollout (same seed), near-identical update numerics."""
    from booster_gym_tpu.algo import PPO
    from booster_gym_tpu.envs import make_task
    from booster_gym_tpu.utils.config import load_task_cfg

    metrics = {}
    states = {}
    for backend in ("fused", "xla"):
        cfg = load_task_cfg("T1")
        cfg["env"]["num_envs"] = 8
        cfg["terrain"]["type"] = "plane"
        cfg["runner"]["horizon_length"] = 8
        cfg["runner"]["mini_epochs"] = 2
        cfg["algorithm"]["compute_dtype"] = "f32"
        cfg["algorithm"]["update_backend"] = backend
        env = make_task(cfg)
        ppo = PPO(env, cfg)
        env_params, ts = jax.jit(ppo.init)(jax.random.PRNGKey(0))
        ts2, m = jax.jit(ppo.train_iteration)(env_params, ts)
        metrics[backend] = m
        states[backend] = ts2

    for k in ("value_loss", "actor_loss", "bound_loss", "entropy", "kl_mean"):
        np.testing.assert_allclose(
            float(metrics["fused"][k]), float(metrics["xla"][k]),
            rtol=1e-4, atol=1e-6, err_msg=k)
    _assert_tree_close(states["fused"].params, states["xla"].params,
                       rtol=1e-4, atol=1e-6)
