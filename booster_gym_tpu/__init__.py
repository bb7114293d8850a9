"""Booster Gym TPU — a TPU-native humanoid locomotion training framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Nyro-Robotics/booster_gym (reference: /root/reference): batched articulated
rigid-body dynamics, the T1 locomotion task, PPO training sharded over TPU
meshes, cross-sim MuJoCo evaluation, policy export, and the robot deploy
stack.

Layer map (TPU-first, not a port):

    CLI           train.py / play.py / export_model.py / play_mujoco.py
    algo/         PPO as a single jitted train-iteration (rollout lax.scan +
                  full-batch mini-epoch scan), flax actor-critic
    envs/         T1 task as a pure function (state, action, key) -> step
    physics/      batched Featherstone dynamics + compliant/TGS contact,
                  vmapped over envs, static-topology unrolled
    terrain/      heightfield generators + on-device bilinear queries
    model/        URDF parser -> static RobotModel pytree
    math/         quaternion / SO(3) / spatial algebra
    parallel/     device mesh + sharding helpers (env-batch DP over ICI)
"""

__version__ = "0.1.0"

import os as _os

# mujoco (the cross-sim oracle / offline renderer) binds its GL backend by
# MUJOCO_GL at import time; the headless default (glfw/X11) hard-aborts at
# first offscreen render.  Default to Mesa software EGL before anything can
# import mujoco.  Real-display interactive use is untouched.
if "MUJOCO_GL" not in _os.environ and not _os.environ.get("DISPLAY"):
    _os.environ["MUJOCO_GL"] = "egl"

import jax as _jax

# Physics kernels are f32 small-matmul chains; TPU matmuls default to bf16
# passes, which is far too coarse for contact dynamics (observed ~6e-3 error
# per 3x3 matmul).  Force full f32 matmul precision framework-wide; the RL
# MLPs are a negligible fraction of the FLOPs so this costs nothing.
_jax.config.update("jax_default_matmul_precision", "highest")

# XLA compiles of the physics programs take minutes through this TPU's
# remote compile service; a persistent cache makes every process after the
# first start in seconds.
#
# The cache dir is namespaced by a host-CPU signature: XLA:CPU AOT results
# encode the compiling machine's ISA features but the cache key does NOT,
# so loading entries produced on a different CPU risks SIGILL ("Machine
# type used for compilation doesn't match...").  A different machine simply
# gets a fresh subdirectory and recompiles.


def _host_cpu_tag():
    import hashlib
    import platform

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    h = hashlib.sha256(feats.encode()).hexdigest()[:8]
    return f"{platform.machine()}-{h}"


if not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    _cache = _os.path.join(
        _os.path.dirname(__file__), "..", ".jax_cache", _host_cpu_tag())
    try:
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _os.path.abspath(_cache))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

