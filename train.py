"""Train a policy: python train.py --task=T1 [--num_envs=N ...]
(reference entry point: train.py)."""

from booster_gym_tpu.utils.config import build_cfg, parse_args
from booster_gym_tpu.runner import Runner

if __name__ == "__main__":
    runner = Runner(build_cfg(parse_args()), test=False)
    runner.train()
