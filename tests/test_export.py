"""Export-path test: JAX actor -> TorchScript parity (reference:
export_model.py:26-30 produces the artifact deploy/utils/policy.py loads)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from booster_gym_tpu.algo.networks import ActorCritic
from export_model import actor_params_to_torch


def test_torchscript_actor_matches_jax():
    net = ActorCritic(12, 47, 14, compute_dtype="f32")
    params = net.init(jax.random.PRNGKey(3), jnp.zeros((1, 47)), jnp.zeros((1, 14)))
    actor = actor_params_to_torch(params)
    scripted = torch.jit.script(actor)

    rng = np.random.default_rng(0)
    obs = rng.normal(size=(5, 47)).astype(np.float32)
    mu_jax, _ = net.apply(params, jnp.asarray(obs), method=ActorCritic.act)
    with torch.no_grad():
        mu_torch = scripted(torch.from_numpy(obs)).numpy()
    np.testing.assert_allclose(np.asarray(mu_jax), mu_torch, atol=1e-5)


def test_stablehlo_actor_matches_jax(tmp_path):
    """StableHLO export (jax.export, symbolic batch) reloads and matches
    the flax actor numerically at multiple batch sizes."""
    from jax import export as jax_export

    from export_model import export_stablehlo

    net = ActorCritic(12, 47, 14, compute_dtype="f32")
    params = net.init(jax.random.PRNGKey(5), jnp.zeros((1, 47)), jnp.zeros((1, 14)))
    path = str(tmp_path / "actor.stablehlo")
    export_stablehlo(params, path)

    with open(path, "rb") as f:
        exp = jax_export.deserialize(bytearray(f.read()))
    rng = np.random.default_rng(1)
    for batch in (1, 7):
        obs = rng.normal(size=(batch, 47)).astype(np.float32)
        out = exp.call(jnp.asarray(obs))
        mu_jax, _ = net.apply(params, jnp.asarray(obs), method=ActorCritic.act)
        np.testing.assert_allclose(np.asarray(out), np.asarray(mu_jax), atol=1e-5)


def test_roundtrip_through_file(tmp_path):
    net = ActorCritic(12, 47, 14, compute_dtype="f32")
    params = net.init(jax.random.PRNGKey(4), jnp.zeros((1, 47)), jnp.zeros((1, 14)))
    actor = actor_params_to_torch(params)
    path = str(tmp_path / "actor.pt")
    torch.jit.script(actor).save(path)

    from booster_gym_tpu.eval.mujoco_eval import torchscript_policy

    pol = torchscript_policy(path)
    obs = np.zeros(47, np.float32)
    out = pol(obs)
    assert out.shape == (12,)
    mu_jax, _ = net.apply(params, jnp.asarray(obs[None]), method=ActorCritic.act)
    np.testing.assert_allclose(out, np.asarray(mu_jax)[0], atol=1e-5)
