"""Task registry — new tasks register here, mirroring the reference's
envs/__init__.py + eval() dispatch (reference: utils/runner.py:27-28)."""

from booster_gym_tpu.envs.standup import T1Standup
from booster_gym_tpu.envs.t1 import T1

# T1Serial is the same task class on the full 23-DoF serial asset — the env
# is config-driven end to end (obs/action dims, gains, assets all follow
# envs/configs/T1Serial.yaml).  T1Standup trains the deploy stack's
# fall-recovery policy on that asset (envs/standup.py).
TASKS = {"T1": T1, "T1Serial": T1, "T1Standup": T1Standup}


def make_task(cfg):
    # basic.env_class lets a derived config file (its own task name /
    # yaml, e.g. the T1StandupFT fine-tune stage) reuse a registered env
    # class; --task on the CLI selects the CONFIG, env_class the CLASS.
    name = cfg["basic"].get("env_class") or cfg["basic"]["task"]
    if name not in TASKS:
        raise KeyError(f"Unknown task {name}; known: {sorted(TASKS)}")
    return TASKS[name](cfg)


__all__ = ["T1", "TASKS", "make_task"]
