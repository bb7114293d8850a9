"""Run logging + checkpointing.

Mirrors the reference Recorder (reference: utils/recorder.py): per-run
logs/<timestamp>/ directory with a config snapshot, TensorBoard scalars
(W&B optional), and checkpoints under nn/.  Differences by design:

  * episode statistics are already aggregated on device by the PPO scan
    (algo/ppo.py), so this class only writes scalars — there is no per-step
    host loop (utils/recorder.py:36-62 is the hot-path anti-pattern);
  * checkpoints also store iteration, adaptive LR, and optimizer state,
    fixing the resume gaps SURVEY.md §5.4 documents in the reference.
"""

import os
import pickle
import glob
import time

import numpy as np
import yaml
import jax


class Recorder:
    def __init__(self, cfg, root="logs"):
        self.cfg = cfg
        name = time.strftime("%Y-%m-%d-%H-%M-%S", time.localtime())
        self.dir = os.path.join(root, name)
        os.makedirs(self.dir, exist_ok=True)
        self.model_dir = os.path.join(self.dir, "nn")
        os.makedirs(self.model_dir, exist_ok=True)

        self.writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.writer = SummaryWriter(os.path.join(self.dir, "summaries"))
        except Exception:
            pass
        self.use_wandb = bool(cfg["runner"].get("use_wandb", False))
        if self.use_wandb:
            try:
                import wandb

                wandb.init(
                    project=cfg["basic"]["task"], dir=self.dir, name=name,
                    notes=cfg["basic"].get("description", ""), config=cfg)
            except Exception:
                self.use_wandb = False

        with open(os.path.join(self.dir, "config.yaml"), "w") as f:
            yaml.dump(cfg, f)
        self._scalars_path = os.path.join(self.dir, "scalars.jsonl")

    def record_statistics(self, statistics, it):
        import json

        row = {"it": int(it)}
        for key, value in statistics.items():
            v = float(np.asarray(value))
            row[key] = v
            # reward-term paths mirror the reference's episode/ prefix scheme
            if self.writer is not None:
                self.writer.add_scalar(key, v, it)
        if self.use_wandb:
            import wandb

            wandb.log({k: v for k, v in row.items() if k != "it"}, step=it)
        with open(self._scalars_path, "a") as f:
            f.write(json.dumps(row) + "\n")

    def save(self, state_dict, it):
        """Checkpoint a pytree to nn/model_<it> via orbax (versioned,
        atomic-rename directory format — SURVEY.md §7.6); falls back to a
        pickle .ckpt only if orbax is unavailable."""
        host = jax.tree.map(lambda x: np.asarray(x), state_dict)
        try:
            import orbax.checkpoint as ocp

            path = os.path.abspath(os.path.join(self.model_dir, f"model_{it}"))
            with ocp.PyTreeCheckpointer() as ckptr:
                ckptr.save(path, host, force=True)
        except ImportError:  # pragma: no cover
            path = os.path.join(self.model_dir, f"model_{it}.ckpt")
            with open(path, "wb") as f:
                pickle.dump(host, f)
        print(f"Saving model to {path}")
        return path


def resolve_checkpoint(checkpoint, root="logs"):
    """-1 selects the newest checkpoint across runs (reference:
    utils/runner.py:85-86, export_model.py:20-21); both orbax directories
    (model_<it>/) and legacy pickle files (model_<it>.ckpt) qualify."""
    if checkpoint in (-1, "-1"):
        paths = sorted(
            glob.glob(os.path.join(root, "**", "*.ckpt"), recursive=True)
            + [os.path.dirname(p) for p in glob.glob(
                os.path.join(root, "**", "_CHECKPOINT_METADATA"), recursive=True)],
            key=os.path.getmtime)
        if not paths:
            raise FileNotFoundError(f"no checkpoints under {root}")
        return paths[-1]
    return checkpoint


def load_checkpoint(path):
    """Load either checkpoint format (orbax dir / pickle file)."""
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckptr:
            return ckptr.restore(os.path.abspath(path))
    with open(path, "rb") as f:
        return pickle.load(f)
