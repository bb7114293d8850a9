"""Export a trained actor to TorchScript for the deploy stack.

Reference entry point: export_model.py (loads .pth, scripts model.actor,
saves .pt at export_model.py:26-30).  Here: load a JAX checkpoint, copy the
actor MLP weights into a torch module with the reference architecture
(utils/model.py:18-27), TorchScript it, save .pt — the deploy stack
(deploy/utils/policy.py) consumes the artifact unchanged.

Usage: python export_model.py --task=T1 --checkpoint=-1 [--output=path.pt]
"""

import argparse
import os

import numpy as np


def actor_params_to_torch(params):
    """JAX ActorCritic params -> torch.nn.Sequential actor (TorchScript-able)."""
    import torch

    actor = params["params"]["actor"]
    layers = []
    dense_keys = sorted(actor.keys(), key=lambda k: int(k.split("_")[-1]))
    for i, k in enumerate(dense_keys):
        kernel = np.asarray(actor[k]["kernel"])  # [in, out]
        bias = np.asarray(actor[k]["bias"])
        lin = torch.nn.Linear(kernel.shape[0], kernel.shape[1])
        with torch.no_grad():
            lin.weight.copy_(torch.from_numpy(kernel.T))
            lin.bias.copy_(torch.from_numpy(bias))
        layers.append(lin)
        if i < len(dense_keys) - 1:
            layers.append(torch.nn.ELU())
    return torch.nn.Sequential(*layers)


def export(checkpoint_path, output=None):
    import torch

    from booster_gym_tpu.utils.recorder import load_checkpoint, resolve_checkpoint

    path = resolve_checkpoint(checkpoint_path)
    print(f"Loading model from {path}")
    saved = load_checkpoint(path)
    actor = actor_params_to_torch(saved["params"])
    scripted = torch.jit.script(actor)
    if output is None:
        output = os.path.splitext(path)[0] + ".pt"
    scripted.save(output)
    print(f"Saved TorchScript actor to {output}")
    return output


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--task", type=str, default="T1")
    parser.add_argument("--checkpoint", type=str, default="-1")
    parser.add_argument("--output", type=str, default=None)
    args = parser.parse_args()
    export(args.checkpoint, args.output)
