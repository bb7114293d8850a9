"""Cross-sim evaluation of a trained policy in MuJoCo.

Reference entry point: play_mujoco.py (1150 lines of harness around the same
core).  This CLI drives booster_gym_tpu.eval.mujoco_eval:

  * --checkpoint: our JAX checkpoint (-1 = newest) OR a TorchScript .pt
  * headless by default: runs scripted commands, reports tracking metrics,
    optionally records states and renders video (if a GL backend exists);
  * --interactive: passive MuJoCo viewer with keyboard commands (requires a
    display).

Usage:
  python play_mujoco.py --task=T1 --checkpoint=-1 --seconds=10 --vx=0.4
  python play_mujoco.py --task=T1 --policy_pt=deploy/models/T1.pt
"""

import argparse

import numpy as np


def build_policy(args, cfg):
    if args.policy_pt:
        from booster_gym_tpu.eval.mujoco_eval import torchscript_policy

        return torchscript_policy(args.policy_pt)
    from booster_gym_tpu.algo import PPO
    from booster_gym_tpu.envs import make_task
    from booster_gym_tpu.eval.mujoco_eval import jax_policy
    from booster_gym_tpu.utils.recorder import load_checkpoint, resolve_checkpoint

    cfg_small = dict(cfg)
    cfg_small["env"] = dict(cfg["env"], num_envs=1)
    env = make_task(cfg_small)
    ppo = PPO(env, cfg_small)
    saved = load_checkpoint(resolve_checkpoint(args.checkpoint))
    return jax_policy(ppo, saved["params"])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--task", default="T1")
    parser.add_argument("--checkpoint", default="-1")
    parser.add_argument("--policy_pt", default=None,
                        help="TorchScript actor (.pt); overrides --checkpoint")
    parser.add_argument("--seconds", type=float, default=10.0)
    parser.add_argument("--vx", type=float, default=0.4)
    parser.add_argument("--vy", type=float, default=0.0)
    parser.add_argument("--vyaw", type=float, default=0.0)
    parser.add_argument("--gait_frequency", type=float, default=1.5)
    parser.add_argument("--video", default=None, help="output mp4 path")
    parser.add_argument("--interactive", action="store_true")
    parser.add_argument("--no_joystick", action="store_true",
                        help="Force keyboard input in interactive mode.")
    args = parser.parse_args()

    from booster_gym_tpu.eval.mujoco_eval import MujocoEval
    from booster_gym_tpu.utils.config import load_task_cfg

    cfg = load_task_cfg(args.task)
    policy = build_policy(args, cfg)
    ev = MujocoEval(cfg, policy)

    if args.interactive:
        import mujoco.viewer

        from booster_gym_tpu.eval.input_devices import (
            CommandState, make_command_source)

        # joystick if plugged in (reference: play_mujoco.py:139-278 pygame
        # path), keyboard map otherwise; v / X-button toggles state
        # recording, rendered to --video on exit
        state = CommandState(args.vx, args.vy, args.vyaw, args.gait_frequency)
        source, on_key_cmd = make_command_source(
            state, prefer_joystick=not args.no_joystick)
        saved = {"snap": None}
        recording = {"on": False, "qpos": []}

        def on_key(keycode):
            if on_key_cmd is not None:
                on_key_cmd(keycode)

        with mujoco.viewer.launch_passive(
                ev.model, ev.data, key_callback=on_key) as viewer:
            while viewer.is_running():
                source.poll()
                if state.pop_flag("save_state"):
                    saved["snap"] = ev.save_state()
                if state.pop_flag("load_state") and saved["snap"] is not None:
                    ev.restore_state(saved["snap"])
                if state.pop_flag("reset"):
                    ev.reset()
                if state.pop_flag("toggle_recording"):
                    recording["on"] = not recording["on"]
                    print("recording" if recording["on"]
                          else f"stopped ({len(recording['qpos'])} states)")
                ev.gait_frequency = state.gait_frequency
                ev.substep(state.cmd)
                if recording["on"]:
                    recording["qpos"].append(ev.data.qpos.copy())
                viewer.cam.lookat[:] = ev.data.qpos[:3]
                viewer.sync()
        if recording["qpos"] and args.video:
            from booster_gym_tpu.envs.t1 import _resolve_asset
            from booster_gym_tpu.eval.render import render_states_to_video

            dt = ev.model.opt.timestep
            qpos = np.stack(recording["qpos"])
            path = render_states_to_video(
                _resolve_asset(cfg["asset"]["mujoco_file"]),
                qpos[:: max(1, int(1 / (50 * dt)))], args.video, fps=50)
            print(f"video written to {path}")
        return

    traj = ev.run(args.seconds, commands=(args.vx, args.vy, args.vyaw),
                  gait_frequency=args.gait_frequency)
    qpos = traj["qpos"]
    h = qpos[:, 2]
    dt = ev.model.opt.timestep
    # achieved base velocity in the heading frame over the run
    disp = qpos[-1, :2] - qpos[0, :2]
    print(f"ran {args.seconds:.1f}s  height min/mean: {h.min():.3f}/{h.mean():.3f}")
    print(f"displacement: {np.linalg.norm(disp):.2f} m "
          f"(commanded vx={args.vx} -> ideal {abs(args.vx) * args.seconds:.2f} m)")
    fell = h.min() < 0.4
    print("FELL" if fell else "stayed upright")

    if args.video:
        from booster_gym_tpu.envs.t1 import _resolve_asset
        from booster_gym_tpu.eval.render import render_states_to_video

        path = render_states_to_video(
            _resolve_asset(cfg["asset"]["mujoco_file"]),
            qpos[:: max(1, int(1 / (50 * dt)))], args.video, fps=50)
        print(f"video written to {path}")


if __name__ == "__main__":
    main()
