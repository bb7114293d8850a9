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
from booster_gym_tpu.parallel import (
    initialize_distributed,
    make_mesh,
    shard_batch_pytree,
)
from booster_gym_tpu.utils.recorder import Recorder, load_checkpoint, resolve_checkpoint


class Runner:
    def __init__(self, cfg, test=False):
        self.cfg = cfg
        self.test = test
        # multi-host first (must precede any jax computation); a loud no-op
        # on single-host runs (parallel/mesh.py)
        self.distributed = initialize_distributed()
        self._set_seed()
        self.env = make_task(cfg)
        self.ppo = PPO(self.env, cfg)
        self.mesh = self._build_mesh()
        if self.mesh is not None:
            self.env.set_mesh(self.mesh)
            self.ppo.set_mesh(self.mesh)
        self._train_iteration = jax.jit(self.ppo.train_iteration, donate_argnums=(1,))
        self._step = jax.jit(self.env.step)
        self._act = jax.jit(self.ppo.act)

    def _build_mesh(self):
        """Env-batch data parallelism over every available device (the
        reference trains on exactly one GPU, SURVEY.md §2.4; here
        `python train.py` uses the whole slice).  Uses the largest device
        count that divides num_envs; 1 device needs no mesh."""
        if self.cfg["basic"].get("data_parallel", True) is False:
            return None
        n = len(jax.devices())
        B = self.env.num_envs
        while n > 1 and B % n != 0:
            n -= 1
        if n <= 1:
            return None
        if n < len(jax.devices()):
            print(f"data-parallel: num_envs={B} not divisible by "
                  f"{len(jax.devices())} devices; using {n}")
        else:
            print(f"data-parallel: {n} devices x {B // n} envs/device")
        return make_mesh(n)

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
        if self.mesh is not None:
            # env-batch leaves shard over dp, everything else replicates;
            # jit propagates these shardings through the train iteration
            env_params = shard_batch_pytree(self.mesh, env_params, self.env.num_envs)
            ts = shard_batch_pytree(self.mesh, ts, self.env.num_envs)
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
                # RNG stream resumes where it left off (SURVEY §5.4 lists
                # RNG as unsaved in the reference; older checkpoints lack it)
                if "key" in saved:
                    ts = ts.replace(key=jnp.asarray(saved["key"], jnp.uint32))
            except Exception as e:  # pragma: no cover
                print(f"Failed to load rng key: {e}")
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
            "key": ts.key,
        }

    # ------------------------------------------------------------------
    def train(self):
        recorder = Recorder(self.cfg)
        env_params, ts = self._init_state()
        max_iterations = self.cfg["basic"]["max_iterations"]
        save_interval = self.cfg["runner"]["save_interval"]
        import time as _time

        # --profile: capture a jax.profiler trace of iterations 11-13 (after
        # compile+warmup) viewable in TensorBoard / Perfetto (SURVEY.md §5.1)
        profile_dir = self.cfg["basic"].get("profile")
        if profile_dir is True:
            profile_dir = f"{recorder.dir}/profile"

        t_last = _time.time()
        steps_per_iter = self.cfg["runner"]["horizon_length"] * self.env.num_envs
        # trace iterations are relative to the resume point so `--checkpoint`
        # resumes can still be profiled; trace_active pairs every start with
        # exactly one stop (incl. the end-of-loop finally)
        start_it = int(ts.iteration)
        trace_active = False
        try:
            for it in range(start_it, max_iterations):
                if profile_dir and it == start_it + 10:
                    jax.profiler.start_trace(profile_dir)
                    trace_active = True
                ts, metrics = self._train_iteration(env_params, ts)
                if trace_active and it >= start_it + 13:
                    jax.block_until_ready(metrics)
                    jax.profiler.stop_trace()
                    trace_active = False
                    print(f"profiler trace written to {profile_dir}")
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
        finally:
            if trace_active:
                jax.block_until_ready(ts)
                jax.profiler.stop_trace()
                print(f"profiler trace written to {profile_dir}")
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
