import time
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from booster_gym_tpu.algo import PPO
from booster_gym_tpu.envs import make_task
from booster_gym_tpu.utils.config import load_task_cfg

cfg = load_task_cfg("T1")
cfg["env"]["num_envs"] = 4096
cfg["terrain"]["type"] = "plane"
env = make_task(cfg)
ppo = PPO(env, cfg)
env_params, ts = ppo.init(jax.random.PRNGKey(0))
print("init done", flush=True)

state = ts.env_state
actions = jnp.zeros((4096, 12))


def timeit(name, fn, *args, n=50):
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    dt = (time.time() - t0) / n * 1000
    print(f"{name}: {dt:.2f} ms", flush=True)
    return dt


# full env step
step = jax.jit(env.step)
t_step = timeit("env.step", step, env_params, state, actions)

# physics inner loop only
def phys_only(params, state, actions):
    dof_targets = env.default_dof_pos + 0.25 * actions
    z = jnp.zeros((4096, 3))
    return env._physics_inner_loop_packed(params, state, dof_targets, z, z)

t_phys = timeit("physics inner loop", jax.jit(phys_only), env_params, state, actions)

# full train iteration
it = jax.jit(ppo.train_iteration, donate_argnums=(1,))
out = it(env_params, ts)
jax.block_until_ready(out[1]["reward"])
ts2 = out[0]
t0 = time.time()
n = 10
for _ in range(n):
    ts2, m = it(env_params, ts2)
jax.block_until_ready(m["reward"])
t_iter = (time.time() - t0) / n * 1000
print(f"train_iteration: {t_iter:.2f} ms", flush=True)
print(f"breakdown: physics {24*t_phys:.1f} | env-layer {24*(t_step-t_phys):.1f} "
      f"| update+rest {t_iter-24*t_step:.1f}  (per iter)", flush=True)

# update-only estimate: time the inner epoch math via a fabricated buffer
print(f"env-steps/s: {24*4096/t_iter*1000:,.0f}", flush=True)
