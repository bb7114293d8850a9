import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax
from booster_gym_tpu.algo import PPO
from booster_gym_tpu.envs import make_task
from booster_gym_tpu.utils.config import load_task_cfg

cfg = load_task_cfg("T1")
cfg["env"]["num_envs"] = 4096
cfg["terrain"]["type"] = "plane"
if "--tile" in sys.argv:
    cfg["algorithm"]["update_tile"] = int(sys.argv[sys.argv.index("--tile") + 1])
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
print(f"train_iteration: {t_iter:.2f} ms -> {24*4096/t_iter*1000:,.0f} env-steps/s", flush=True)

# the production dispatch: 10-iteration device chunks (runner.py)
chunked = jax.jit(ppo.train_iterations, static_argnums=(2,),
                  donate_argnums=(1,))
ts, m = chunked(env_params, ts, 10)
jax.block_until_ready(m["reward"])
t0 = time.time()
for _ in range(2):
    ts, m = chunked(env_params, ts, 10)
jax.block_until_ready(m["reward"])
t_chunk = (time.time() - t0) / 20 * 1000
print(f"train_iterations(10): {t_chunk:.2f} ms/iter -> "
      f"{24*4096/t_chunk*1000:,.0f} env-steps/s", flush=True)

if "--trace" in sys.argv:
    tdir = sys.argv[sys.argv.index("--trace") + 1]
    with jax.profiler.trace(tdir):
        for _ in range(3):
            ts, m = it(env_params, ts)
        jax.block_until_ready(m["reward"])
    print("trace written:", tdir, "(parse with tools/parse_trace.py <dir> 40 3)", flush=True)
