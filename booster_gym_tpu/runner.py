"""Training / evaluation runner.

The TPU-native analog of the reference Runner (reference: utils/runner.py):
builds the task + PPO trainer, jits one full train iteration (rollout +
update, donated buffers), loops on the host only for logging and
checkpointing.  There is no sim-device/rl-device copy boundary
(utils/runner.py:113-118) — the whole pipeline is resident on the
accelerator.
"""

import random

import numpy as np
import jax
import jax.numpy as jnp

from booster_gym_tpu.algo.ppo import PPO
from booster_gym_tpu.envs import make_task
from booster_gym_tpu.utils.recorder import Recorder, load_checkpoint, resolve_checkpoint


class Runner:
    def __init__(self, cfg, test=False):
        self.cfg = cfg
        self.test = test
        self._set_seed()
        self.env = make_task(cfg)
        self.ppo = PPO(self.env, cfg)
        self._train_iteration = jax.jit(self.ppo.train_iteration, donate_argnums=(1,))
        self._step = jax.jit(self.env.step)
        self._act = jax.jit(self.ppo.act)

    def _set_seed(self):
        seed = self.cfg["basic"]["seed"]
        if seed == -1:
            seed = np.random.randint(0, 10000)
            self.cfg["basic"]["seed"] = seed
        print(f"Setting seed: {seed}")
        random.seed(seed)
        np.random.seed(seed)
        self.seed = seed

    # ------------------------------------------------------------------
    def _init_state(self):
        env_params, ts = self.ppo.init(jax.random.PRNGKey(self.seed))
        ckpt = self.cfg["basic"].get("checkpoint")
        if ckpt:
            path = resolve_checkpoint(ckpt)
            print(f"Loading model from {path}")
            saved = load_checkpoint(path)
            ts = ts.replace(params=saved["params"])
            # each piece restores independently, like the reference's
            # try/except ladder (utils/runner.py:88-97)
            try:
                ts = ts.replace(opt_state=jax.tree.unflatten(
                    jax.tree.structure(ts.opt_state),
                    jax.tree.leaves(saved["opt_state"])))
            except Exception as e:  # pragma: no cover
                print(f"Failed to load optimizer: {e}")
            try:
                ts = ts.replace(
                    lr=jnp.asarray(saved["lr"]),
                    iteration=jnp.asarray(saved["iteration"], jnp.int32))
            except Exception as e:  # pragma: no cover
                print(f"Failed to load lr/iteration: {e}")
            try:
                ts = ts.replace(env_state=ts.env_state.replace(
                    curriculum_prob=jnp.asarray(saved["curriculum"])))
            except Exception as e:  # pragma: no cover
                print(f"Failed to load curriculum: {e}")
        return env_params, ts

    def _checkpoint_dict(self, ts):
        return {
            "params": ts.params,
            "opt_state": ts.opt_state,
            "lr": ts.lr,
            "iteration": ts.iteration,
            "curriculum": ts.env_state.curriculum_prob,
        }

    # ------------------------------------------------------------------
    def train(self):
        recorder = Recorder(self.cfg)
        env_params, ts = self._init_state()
        max_iterations = self.cfg["basic"]["max_iterations"]
        save_interval = self.cfg["runner"]["save_interval"]
        import time as _time

        t_last = _time.time()
        steps_per_iter = self.cfg["runner"]["horizon_length"] * self.env.num_envs
        for it in range(int(ts.iteration), max_iterations):
            ts, metrics = self._train_iteration(env_params, ts)
            if (it + 1) % 10 == 0 or it == 0:
                metrics = jax.device_get(metrics)
                now = _time.time()
                n_iters = 1 if it == 0 else 10
                fps = steps_per_iter * n_iters / (now - t_last)
                t_last = now
                metrics["env_steps_per_sec"] = fps
                recorder.record_statistics(metrics, it)
                print(
                    f"epoch: {it + 1}/{max_iterations} reward={metrics['reward']:.3f} "
                    f"steps/s={fps:,.0f}")
            if (it + 1) % save_interval == 0:
                recorder.save(self._checkpoint_dict(ts), it + 1)
        recorder.save(self._checkpoint_dict(ts), max_iterations)
        return ts

    # ------------------------------------------------------------------
    def play(self, num_steps=None, deterministic=True):
        """Deterministic policy rollout (reference: utils/runner.py:217-241).
        Returns stacked trajectory arrays for rendering/analysis."""
        env_params, ts = self._init_state()
        state, obs = ts.env_state, ts.obs
        traj = []
        n = num_steps or 10 * int(1.0 / self.env.dt)
        for _ in range(n):
            mu, std = self._act(ts.params, obs)
            act = mu if deterministic else mu + std * np.random.normal(size=mu.shape)
            state, obs, rew, done, info = self._step(env_params, state, act)
            traj.append({
                "root_pos": np.asarray(state.sim.root_pos),
                "root_quat": np.asarray(state.sim.root_quat),
                "q": np.asarray(state.sim.q),
                "rew": np.asarray(rew),
                "done": np.asarray(done),
            })
        return traj
