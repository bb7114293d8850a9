"""Evaluate a trained policy deterministically in the training sim and
optionally record a video (reference entry point: play.py)."""

import numpy as np

from booster_gym_tpu.utils.config import build_cfg, parse_args
from booster_gym_tpu.runner import Runner

if __name__ == "__main__":
    cfg = build_cfg(parse_args())
    runner = Runner(cfg, test=True)
    traj = runner.play()
    rews = np.stack([t["rew"] for t in traj])
    print(f"played {len(traj)} steps, mean reward/step: {rews.mean():.4f}")
    if cfg["viewer"].get("record_video", False):
        try:
            from booster_gym_tpu.eval.render import render_trajectory

            path = render_trajectory(cfg, traj, env_idx=cfg["viewer"].get("record_env_idx", 0))
            print(f"video written to {path}")
        except Exception as e:
            print(f"video rendering unavailable: {e}")
