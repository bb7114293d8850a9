from booster_gym_tpu.mpc.sampling import SamplingMPC, standup_cost

__all__ = ["SamplingMPC", "standup_cost"]
