"""Config loading + CLI overrides.

Mirrors the reference's YAML-per-task + argparse-override scheme
(reference: utils/runner.py:44-68) with the same flag names, minus the
device flags that have no meaning on a single resident TPU pipeline.
"""

import argparse
import os

import yaml

_CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "envs", "configs")


def load_task_cfg(task):
    path = os.path.join(_CONFIG_DIR, f"{task}.yaml")
    with open(path, "r", encoding="utf-8") as f:
        return yaml.safe_load(f)


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--task", required=True, type=str, help="Name of the task to run.")
    parser.add_argument("--checkpoint", type=str, help="Checkpoint path (-1 for newest).")
    parser.add_argument("--num_envs", type=int, help="Number of environments.")
    parser.add_argument("--headless", type=bool, help="Run without visualization.")
    parser.add_argument("--seed", type=int, help="Random seed.")
    parser.add_argument("--max_iterations", type=int, help="Training iterations.")
    parser.add_argument("--terrain", type=str, help="Override terrain type (plane/trimesh).")
    parser.add_argument("--profile", nargs="?", const=True, default=None,
                        help="Capture a jax.profiler trace (optional dir).")
    parser.add_argument("--no_data_parallel", action="store_true",
                        help="Disable the device mesh (single-device run).")
    return parser.parse_args(argv)


def build_cfg(args):
    cfg = load_task_cfg(args.task)
    if getattr(args, "profile", None) is not None:
        cfg["basic"]["profile"] = args.profile
    if getattr(args, "no_data_parallel", False):
        cfg["basic"]["data_parallel"] = False
    for key in ("checkpoint", "headless", "seed", "max_iterations"):
        val = getattr(args, key, None)
        if val is not None:
            cfg["basic"][key] = val
    if getattr(args, "num_envs", None) is not None:
        cfg["env"]["num_envs"] = args.num_envs
    if getattr(args, "terrain", None) is not None:
        cfg["terrain"]["type"] = args.terrain
    cfg["basic"]["task"] = args.task
    return cfg
