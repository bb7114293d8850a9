"""Export a trained actor for the deploy stack.

Reference entry point: export_model.py (loads .pth, scripts model.actor,
saves .pt at export_model.py:26-30).  Formats:

  * torchscript (default): copy the actor MLP weights into a torch module
    with the reference architecture (utils/model.py:18-27), TorchScript it,
    save .pt — the deploy stack (deploy/utils/policy.py) consumes the
    artifact unchanged;
  * stablehlo: jax.export serialization (symbolic batch dim) — the
    TPU/XLA-native deployable artifact, reloadable with
    jax.export.deserialize on any XLA runtime;
  * onnx: via torch.onnx (requires the onnx package; gated).

Usage: python export_model.py --task=T1 --checkpoint=-1 \
           [--format=torchscript|stablehlo|onnx|all] [--output=path]
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


def actor_apply_fn(params):
    """Pure-JAX actor forward (dense->ELU chain mirroring
    algo/networks.ActorCritic.act's mean path) built directly from the
    checkpointed params — no flax module needed at export time."""
    import jax.numpy as jnp

    actor = params["params"]["actor"]
    dense_keys = sorted(actor.keys(), key=lambda k: int(k.split("_")[-1]))
    weights = [(jnp.asarray(np.asarray(actor[k]["kernel"])),
                jnp.asarray(np.asarray(actor[k]["bias"]))) for k in dense_keys]

    def apply(obs):
        x = obs
        for i, (w, b) in enumerate(weights):
            x = x @ w + b
            if i < len(weights) - 1:
                x = jnp.where(x > 0, x, jnp.expm1(x))  # ELU
        return x

    return apply, weights[0][0].shape[0]


def export_stablehlo(params, output):
    """Serialize the actor as a StableHLO artifact with a symbolic batch
    dim; reload with jax.export.deserialize(...).call(obs)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    apply, num_obs = actor_apply_fn(params)
    (batch,) = jax_export.symbolic_shape("batch")
    exp = jax_export.export(jax.jit(apply))(
        jax.ShapeDtypeStruct((batch, num_obs), jnp.float32))
    with open(output, "wb") as f:
        f.write(exp.serialize())
    print(f"Saved StableHLO actor to {output}")
    return output


def export_onnx(actor_torch, num_obs, output):
    import torch

    try:
        import onnx  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "ONNX export needs the onnx package (not in this image); "
            "use --format=stablehlo for a torch-free artifact") from e
    torch.onnx.export(
        actor_torch, torch.zeros(1, num_obs), output,
        input_names=["obs"], output_names=["action"],
        dynamic_axes={"obs": {0: "batch"}, "action": {0: "batch"}})
    print(f"Saved ONNX actor to {output}")
    return output


def standup_module(actor, cfg):
    """Wrap the trained standup actor in the deploy-interface module:
    forward(obs [B,42], stacked_obs [B,deploy_stack,42]) -> [B,12], the
    exact call signature StandupPolicy.inference drives (reference
    deploy/utils/standup_policy.py:152-159).  The policy was trained on
    the newest `train_stack` frames, so the module slices them from the
    deploy-side 50-frame stack (newest first in both)."""
    import torch

    scfg = cfg["standup"]

    class StandupActor(torch.nn.Module):
        def __init__(self, actor, train_stack):
            super().__init__()
            self.actor = actor
            self.train_stack = train_stack

        def forward(self, obs, stacked_obs):
            x = stacked_obs[:, : self.train_stack, :]
            x = x.reshape(x.shape[0], -1)
            return self.actor(x)

    return StandupActor(actor, int(scfg["train_stack"]))


def export(checkpoint_path, output=None, fmt="torchscript", task=None):
    import torch

    from booster_gym_tpu.utils.recorder import load_checkpoint, resolve_checkpoint

    path = resolve_checkpoint(checkpoint_path)
    print(f"Loading model from {path}")
    saved = load_checkpoint(path)
    base = output or (path[:-5] if path.endswith(".ckpt") else path)
    base = os.path.splitext(base)[0] if base.endswith((".pt", ".mlir")) else base
    standup_cfg = None
    if task:
        from booster_gym_tpu.utils.config import load_task_cfg

        cfg = load_task_cfg(task)
        if "standup" in cfg:
            standup_cfg = cfg
    outputs = []
    if fmt in ("torchscript", "all"):
        actor = actor_params_to_torch(saved["params"])
        if standup_cfg is not None:
            actor = standup_module(actor, standup_cfg)
        torch.jit.script(actor).save(base + ".pt")
        print(f"Saved TorchScript actor to {base}.pt")
        outputs.append(base + ".pt")
    if fmt in ("stablehlo", "all"):
        outputs.append(export_stablehlo(saved["params"], base + ".stablehlo"))
    if fmt == "onnx" or (fmt == "all" and _has_onnx()):
        actor = actor_params_to_torch(saved["params"])
        num_obs = actor[0].in_features
        outputs.append(export_onnx(actor, num_obs, base + ".onnx"))
    return outputs[0] if len(outputs) == 1 else outputs


def _has_onnx():
    try:
        import onnx  # noqa: F401

        return True
    except ImportError:
        return False


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--task", type=str, default="T1")
    parser.add_argument("--checkpoint", type=str, default="-1")
    parser.add_argument("--output", type=str, default=None)
    parser.add_argument("--format", type=str, default="torchscript",
                        choices=["torchscript", "stablehlo", "onnx", "all"])
    args = parser.parse_args()
    export(args.checkpoint, args.output, args.format, task=args.task)
