import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax
from booster_gym_tpu.algo import PPO
from booster_gym_tpu.envs import make_task
from booster_gym_tpu.utils.config import load_task_cfg

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
cfg = load_task_cfg("T1")
cfg["env"]["num_envs"] = B
cfg["terrain"]["type"] = "trimesh"
env = make_task(cfg)
ppo = PPO(env, cfg)
env_params, ts = ppo.init(jax.random.PRNGKey(0))
print("init done", flush=True)
it = jax.jit(ppo.train_iteration, donate_argnums=(1,))
ts, m = it(env_params, ts)
jax.block_until_ready(m["reward"])
print("compiled", flush=True)
for _ in range(3):
    ts, m = it(env_params, ts)
jax.block_until_ready(m["reward"])
t0 = time.time()
n = 20
for _ in range(n):
    ts, m = it(env_params, ts)
jax.block_until_ready(m["reward"])
t_iter = (time.time() - t0) / n * 1000
print(f"rough {B} envs: {t_iter:.2f} ms/iter -> {24*B/t_iter*1000:,.0f} env-steps/s "
      f"reward={float(m['reward']):.3f}", flush=True)

# record the measurement where the round record can see it (VERDICT r3
# weak #5: the rough number lived only in commit messages)
import json
steps = 24 * B / t_iter * 1000
rec = {"metric": "rough_env_steps_per_sec_per_chip", "num_envs": B,
       "terrain": "trimesh", "ms_per_iter": round(t_iter, 2),
       "value": round(steps, 1), "backend": jax.default_backend()}
out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "benchmarks", "rough_r05.json")
with open(out, "w") as f:
    json.dump(rec, f, indent=1)
print(f"wrote {out}: {json.dumps(rec)}", flush=True)
