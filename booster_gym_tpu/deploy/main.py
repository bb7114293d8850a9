"""Deploy entry point: python -m booster_gym_tpu.deploy.main --config=T1.yaml
[--net=IP] [--standup] [--upper-body=policy|teleop|sine]

(reference entry points: deploy/deploy.py:425-458 and deploy_standup.py.)
"""

import argparse
import os
import signal
import sys
import time

import yaml

from booster_gym_tpu.deploy.controller import Controller, UpperBodyMode
from booster_gym_tpu.deploy.remote_control import RemoteControlService
from booster_gym_tpu.deploy.sdk import SdkRobot


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="T1.yaml")
    parser.add_argument("--net", default="127.0.0.1")
    parser.add_argument("--standup", action="store_true",
                        help="enable the fall-recovery state machine")
    parser.add_argument("--upper-body", default="policy",
                        choices=[m.value for m in UpperBodyMode])
    args = parser.parse_args()

    cfg_path = args.config
    if not os.path.exists(cfg_path):
        cfg_path = os.path.join(os.path.dirname(__file__), "configs", args.config)
    with open(cfg_path, "r", encoding="utf-8") as f:
        cfg = yaml.safe_load(f)

    signal.signal(signal.SIGINT, lambda *_: sys.exit(0))
    print(f"Connecting to robot at {args.net} ...")
    robot = SdkRobot(net=args.net)
    remote = RemoteControlService()
    with Controller(
        cfg, robot, remote,
        enable_standup=args.standup,
        upper_body_mode=UpperBodyMode(args.upper_body),
        sim_time=True,
    ) as controller:
        time.sleep(2)
        controller.start_custom_mode()
        controller.start_rl_gait()
        try:
            while controller.running:
                controller.run()
            controller.robot.change_mode("damping")
        except KeyboardInterrupt:
            controller.cleanup()


if __name__ == "__main__":
    main()
