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

import jax as _jax

# Physics kernels are f32 small-matmul chains; TPU matmuls default to bf16
# passes, which is far too coarse for contact dynamics (observed ~6e-3 error
# per 3x3 matmul).  Force full f32 matmul precision framework-wide; the RL
# MLPs are a negligible fraction of the FLOPs so this costs nothing.
_jax.config.update("jax_default_matmul_precision", "highest")

# XLA compiles of the physics programs take minutes through this TPU's
# remote compile service; a persistent cache makes every process after the
# first start in seconds.
if not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    _cache = _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache")
    try:
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _os.path.abspath(_cache))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

