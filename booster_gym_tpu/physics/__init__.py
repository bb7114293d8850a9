from booster_gym_tpu.physics.types import SimState, DynParams, SimConfig
from booster_gym_tpu.physics.engine import make_substep

__all__ = ["SimState", "DynParams", "SimConfig", "make_substep"]
