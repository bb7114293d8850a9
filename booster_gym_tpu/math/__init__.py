from booster_gym_tpu.math.quat import (
    quat_mul,
    quat_conj,
    quat_rotate,
    quat_rotate_inverse,
    quat_from_euler_xyz,
    euler_xyz_from_quat,
    quat_to_matrix,
    quat_from_axis_angle,
    quat_integrate,
    quat_normalize,
    wrap_to_pi,
)
from booster_gym_tpu.math.spatial import (
    skew,
    spatial_inertia_at_origin,
    rotate_inertia,
)

__all__ = [
    "quat_mul",
    "quat_conj",
    "quat_rotate",
    "quat_rotate_inverse",
    "quat_from_euler_xyz",
    "euler_xyz_from_quat",
    "quat_to_matrix",
    "quat_from_axis_angle",
    "quat_integrate",
    "quat_normalize",
    "wrap_to_pi",
    "skew",
    "spatial_inertia_at_origin",
    "rotate_inertia",
]
