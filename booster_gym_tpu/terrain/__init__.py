from booster_gym_tpu.terrain.heightfield import Terrain

__all__ = ["Terrain"]
