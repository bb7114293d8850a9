"""Train flat-terrain T1 for N iterations, logging the reward curve to a
jsonl (benchmarks/ by default) — the reward-parity artifact (BASELINE.md
"PPO reward @5k iters")."""
import sys, os, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
from booster_gym_tpu.algo import PPO
from booster_gym_tpu.envs import make_task
from booster_gym_tpu.utils.config import load_task_cfg

iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
dtype = sys.argv[2] if len(sys.argv) > 2 else "bf16"
terrain = sys.argv[4] if len(sys.argv) > 4 else "plane"
name = "flat" if terrain == "plane" else "rough"
out = (sys.argv[3] if len(sys.argv) > 3 and sys.argv[3] != "-"
       else f"benchmarks/reward_curve_{name}_{dtype}.jsonl")
cfg = load_task_cfg("T1")
cfg["terrain"]["type"] = terrain
cfg["algorithm"]["compute_dtype"] = dtype
env = make_task(cfg)
ppo = PPO(env, cfg)
env_params, ts = ppo.init(jax.random.PRNGKey(42))
it = jax.jit(ppo.train_iteration, donate_argnums=(1,))
os.makedirs(os.path.dirname(out), exist_ok=True)
t0 = time.time()
with open(out, "w") as f:
    for i in range(iters):
        ts, m = it(env_params, ts)
        if (i + 1) % 50 == 0 or i == 0:
            r = float(m["reward"])
            f.write(json.dumps({"iter": i + 1, "reward": round(r, 3),
                                "lr": float(m["lr"]), "kl": float(m["kl_mean"]),
                                "steps": float(m["steps"])}) + "\n")
            f.flush()
            if (i + 1) % 500 == 0 or i == 0:
                print(f"[{dtype}] iter {i+1}: reward {r:.2f} "
                      f"({time.time()-t0:.0f}s)", flush=True)
print(f"[{dtype}] final reward {float(m['reward']):.2f} in {time.time()-t0:.0f}s -> {out}",
      flush=True)
