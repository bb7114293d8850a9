import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

MJCF = "/root/reference/resources/T1/T1_locomotion.xml"


def test_body_count_and_order(t1_model):
    assert t1_model.num_bodies == 13
    assert t1_model.num_dofs == 12
    assert t1_model.body_names[0] == "Trunk"
    assert "left_foot_link" in t1_model.body_names
    assert t1_model.dof_names[0] == "Left_Hip_Pitch"
    assert t1_model.dof_names[6] == "Right_Hip_Pitch"


def test_merged_inertials_match_mujoco(t1_model):
    """Fixed-joint collapsing must reproduce MuJoCo's merged trunk exactly."""
    mj = mujoco.MjModel.from_xml_path(MJCF)
    np.testing.assert_allclose(t1_model.body_mass.sum(), mj.body_mass.sum(), rtol=1e-5)
    # trunk (mj body 1; ours 0)
    np.testing.assert_allclose(t1_model.body_mass[0], mj.body_mass[1], rtol=1e-5)
    np.testing.assert_allclose(t1_model.body_com[0], mj.body_ipos[1], atol=1e-6)
    eig = np.sort(np.linalg.eigvalsh(t1_model.body_inertia[0]))
    np.testing.assert_allclose(eig, np.sort(mj.body_inertia[1]), rtol=1e-4)


def test_all_body_masses_match_mujoco(t1_model):
    mj = mujoco.MjModel.from_xml_path(MJCF)
    mj_names = [
        mujoco.mj_id2name(mj, mujoco.mjtObj.mjOBJ_BODY, i) for i in range(mj.nbody)
    ]
    for i, name in enumerate(t1_model.body_names):
        j = mj_names.index(name)
        np.testing.assert_allclose(
            t1_model.body_mass[i], mj.body_mass[j], rtol=1e-5, err_msg=name
        )
        np.testing.assert_allclose(t1_model.body_com[i], mj.body_ipos[j], atol=1e-5)


def test_dof_limits(t1_model):
    # reference reads these from the asset (envs/t1.py:59-67)
    i = t1_model.dof_names.index("Left_Knee_Pitch")
    assert t1_model.dof_lower[i] == 0.0
    assert t1_model.dof_upper[i] == pytest.approx(2.34)
    assert t1_model.dof_effort[i] == pytest.approx(60.0)
    i = t1_model.dof_names.index("Left_Ankle_Roll")
    assert t1_model.dof_effort[i] == pytest.approx(15.0)


def test_foot_collision_corners_match_feet_edge_pos(t1_model):
    """The foot box's bottom corners are the reference's feet_edge_pos
    (envs/T1.yaml:79-82)."""
    foot = t1_model.body_index("left_foot_link")
    pts = t1_model.point_pos[t1_model.point_body == foot]
    bottom = pts[pts[:, 2] < -0.02]
    expect = np.array(
        [[0.1215, 0.05, -0.03], [0.1215, -0.05, -0.03],
         [-0.1015, 0.05, -0.03], [-0.1015, -0.05, -0.03]]
    )
    got = bottom[np.lexsort((bottom[:, 1], bottom[:, 0]))]
    exp = expect[np.lexsort((expect[:, 1], expect[:, 0]))]
    np.testing.assert_allclose(got, exp, atol=1e-6)


def test_kinematic_tree(t1_model):
    lf = t1_model.body_index("left_foot_link")
    chain = []
    b = lf
    while b != -1:
        chain.append(t1_model.body_names[b])
        b = int(t1_model.parent[b])
    assert chain == [
        "left_foot_link", "Ankle_Cross_Left", "Shank_Left", "Hip_Yaw_Left",
        "Hip_Roll_Left", "Hip_Pitch_Left", "Trunk",
    ]
