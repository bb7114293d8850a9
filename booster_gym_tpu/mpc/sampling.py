"""Sampling-based whole-body MPC over the TPU dynamics core.

The north-star's "(a) sampling/DDP-style whole-body MPC solver over the same
dynamics + cost model" (BASELINE.json): an MPPI planner that rolls out K
perturbed PD-target sequences through the batched physics engine — the same
engine PPO trains against — scores them with a task cost, and
exponentially-weights the update.  Use cases: standup / push-recovery
(deploy_standup.py's learned policy has this planner as its model-based
counterpart) and trajectory optimization for new behaviors.

Everything is one jitted program: the K-sample rollout is the engine's env
batch (samples ARE envs), so the planner inherits the Pallas substep kernel
on TPU and shards over chips like training does.
"""

import functools

import jax
import jax.numpy as jnp

from booster_gym_tpu.physics.types import SimState


def _tile_state(state: SimState, K):
    """Broadcast a single-env state [1, ...] to K rollout samples."""
    return jax.tree.map(lambda x: jnp.repeat(x, K, axis=0), state)


def standup_cost(state: SimState, default_dof_pos, target_height=0.68):
    """Stage cost for standup / push-recovery: get high, get upright, move
    toward the default pose, stay calm."""
    from booster_gym_tpu.math.quat import quat_rotate_inverse

    up = quat_rotate_inverse(
        state.root_quat, jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]),
                                          state.root_pos.shape))
    height_err = jnp.square(state.root_pos[:, 2] - target_height)
    tilt = jnp.sum(jnp.square(up[:, :2]), axis=-1)
    posture = jnp.sum(jnp.square(state.q - default_dof_pos), axis=-1)
    effort = 0.01 * jnp.sum(jnp.square(state.qd), axis=-1)
    return 20.0 * height_err + 5.0 * tilt + 0.5 * posture + effort


class SamplingMPC:
    """MPPI over PD-target deltas.

    plan(state1, key) -> (dof_targets [nd], info): one planning step from a
    single-env SimState (leading dim 1).
    """

    def __init__(self, env, cost_fn=None, horizon=16, num_samples=256,
                 sigma=0.15, temperature=0.05, decimation=None):
        self.env = env
        self.model = env.model
        self.horizon = horizon
        self.num_samples = num_samples
        self.sigma = sigma
        self.temperature = temperature
        self.decimation = decimation or env.decimation
        self.cost_fn = cost_fn or functools.partial(
            standup_cost, default_dof_pos=env.default_dof_pos)
        nd = self.model.num_dofs
        self._mean = jnp.zeros((horizon, nd))
        self._plan = jax.jit(self._plan_impl)

    def _rollout(self, dyn_k, state_k, target_seq):
        """Roll K samples through the physics for horizon control steps.
        target_seq: [H, K, nd] absolute PD targets."""
        kp = jnp.asarray(self.env.base_stiffness, jnp.float32)
        kd = jnp.asarray(self.env.base_damping, jnp.float32)
        limits = self.env.torque_limits
        K = target_seq.shape[1]
        zeros3 = jnp.zeros((K, 3))

        def control_step(sim, targets):
            def substep(sim, _):
                tau = jnp.clip(
                    kp * (targets - sim.q) - kd * sim.qd, -limits, limits)
                sim, *_rest = self.env.substep(sim, dyn_k, tau, zeros3, zeros3)
                return sim, None
            sim, _ = jax.lax.scan(substep, sim, None, length=self.decimation)
            return sim, self.cost_fn(sim)

        sim, costs = jax.lax.scan(control_step, state_k, target_seq)
        return sim, costs  # costs: [H, K]

    def _plan_impl(self, state1, dyn1, mean, key):
        K, H = self.num_samples, self.horizon
        nd = self.model.num_dofs
        noise = self.sigma * jax.random.normal(key, (H, K, nd))
        deltas = mean[:, None, :] + noise
        # sample 0 carries the unperturbed mean (CEM-style elitism guard)
        deltas = deltas.at[:, 0, :].set(mean)
        targets = self.env.default_dof_pos + deltas
        targets = jnp.clip(targets, self.env.dof_lower, self.env.dof_upper)

        state_k = _tile_state(state1, K)
        dyn_k = jax.tree.map(lambda x: jnp.repeat(x, K, axis=0), dyn1)
        _, costs = self._rollout(dyn_k, state_k, targets)
        total = jnp.sum(costs, axis=0)                    # [K]

        # MPPI exponential weighting
        w = jax.nn.softmax(-(total - total.min()) / self.temperature)
        new_mean = jnp.einsum("k,hkj->hj", w, deltas)
        info = {
            "best_cost": total.min(),
            "mean_cost": total.mean(),
            "ess": 1.0 / jnp.sum(w * w),
        }
        # receding horizon: emit first action, shift mean
        action_targets = self.env.default_dof_pos + new_mean[0]
        shifted = jnp.concatenate([new_mean[1:], new_mean[-1:]], axis=0)
        return action_targets, shifted, info

    def plan(self, state1, dyn1, key):
        targets, self._mean, info = self._plan(state1, dyn1, self._mean, key)
        return targets, info

    def reset(self):
        self._mean = jnp.zeros_like(self._mean)
