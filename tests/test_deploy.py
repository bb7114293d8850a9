"""Deploy-stack tests against the MockRobot (the test-ladder analog of the
reference's Webots rung, SURVEY.md §4)."""

import os

import numpy as np
import pytest
import yaml

torch = pytest.importorskip("torch")

from booster_gym_tpu.deploy.controller import Controller, ControlMode, UpperBodyMode
from booster_gym_tpu.deploy.policy import WalkPolicy, mirror_act_matrix, mirror_obs_matrix
from booster_gym_tpu.deploy.remote_control import ScriptedRemote
from booster_gym_tpu.deploy.rotate import rotate_vector_inverse_rpy
from booster_gym_tpu.deploy.sdk import NUM_JOINTS, MockRobot
from booster_gym_tpu.deploy.timer import Timer, TimerConfig

PRETRAINED = "/root/reference/deploy/models/T1.pt"
CFG_PATH = os.path.join(
    os.path.dirname(__file__), "..", "booster_gym_tpu", "deploy", "configs", "T1.yaml")


@pytest.fixture(scope="module")
def deploy_cfg():
    with open(CFG_PATH) as f:
        return yaml.safe_load(f)


def test_rotate_inverse_rpy():
    v = rotate_vector_inverse_rpy(0.0, 0.0, np.pi / 2, np.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(v, [0.0, -1.0, 0.0], atol=1e-9)
    v = rotate_vector_inverse_rpy(0.0, np.pi / 2, 0.0, np.array([0.0, 0.0, -1.0]))
    np.testing.assert_allclose(v, [1.0, 0.0, 0.0], atol=1e-9)


def test_timer_sim_ticks():
    t = Timer(TimerConfig(time_step=0.002))
    assert t.get_time() == 0.0
    for _ in range(500):
        t.tick_timer_if_sim()
    assert t.get_time() == pytest.approx(1.0)
    t.advance(500)
    assert t.get_time() == pytest.approx(2.0)
    t.reset()
    assert t.get_time() == 0.0


def test_mock_robot_pd_dynamics():
    """The MockRobot runs the firmware PD law on rigid joint inertias:
    position servos converge to the target, torque-only commands produce
    the physical steady state (dq -> tau / damping)."""
    robot = MockRobot(dt=0.002)
    robot.init_channels(lambda s: None)
    cmd = robot.make_low_cmd()
    cmd.motor_cmd[0].q = 0.5
    cmd.motor_cmd[0].kp = 50.0
    cmd.motor_cmd[0].kd = 5.0
    cmd.motor_cmd[1].tau = 1.0  # torque mode: kp == kd == 0
    robot.publish_low_cmd(cmd)
    robot.tick(2500)  # 5 s
    assert robot.q[0] == pytest.approx(0.5, abs=1e-3)
    assert abs(robot.dq[0]) < 1e-3
    # steady-state velocity of a torque-driven damped joint
    assert robot.dq[1] == pytest.approx(1.0 / robot.damping[1], rel=0.05)
    # uncommanded joints stay put
    assert robot.q[2] == 0.0


def test_mirror_matrices_are_involutions():
    mo = mirror_obs_matrix()
    ma = mirror_act_matrix()
    np.testing.assert_allclose(mo @ mo, np.eye(42), atol=1e-6)
    np.testing.assert_allclose(ma @ ma, np.eye(12), atol=1e-6)


@pytest.mark.skipif(not os.path.exists(PRETRAINED), reason="no pretrained policy")
def test_walk_policy_obs_and_targets(deploy_cfg):
    pol = WalkPolicy(deploy_cfg, policy_path=PRETRAINED)
    dof_pos = np.asarray(deploy_cfg["common"]["default_qpos"], np.float32)
    targets = pol.inference(
        time_now=0.02, dof_pos=dof_pos, dof_vel=np.zeros(NUM_JOINTS, np.float32),
        base_ang_vel=np.zeros(3, np.float32),
        projected_gravity=np.array([0, 0, -1], np.float32),
        vx=0.3, vy=0.0, vyaw=0.0)
    assert targets.shape == (NUM_JOINTS,)
    # upper body stays at defaults; legs move by bounded actions
    np.testing.assert_allclose(targets[:11], dof_pos[:11])
    assert np.all(np.abs(targets[11:] - dof_pos[11:]) <= 1.0 + 1e-6)
    # command smoothing is rate-limited by the policy interval
    assert abs(pol.smoothed_commands[0]) <= pol.policy_interval + 1e-6


@pytest.mark.skipif(not os.path.exists(PRETRAINED), reason="no pretrained policy")
def test_controller_against_mock_robot(deploy_cfg):
    robot = MockRobot(dt=deploy_cfg["common"]["dt"])
    remote = ScriptedRemote(vx=0.3, auto_start=True)
    ctrl = Controller(deploy_cfg, robot, remote, policy_path=PRETRAINED, sim_time=True)
    ctrl.start_custom_mode(wait=False)
    assert robot.mode_changes == ["custom"]
    ctrl.start_rl_gait(wait=False, threaded_publisher=False)
    # drive 100 ms of the control loop by hand: tick robot, infer, publish
    n_pub = 0
    for step in range(50):
        robot.tick()
        ctrl.run_inference_step()
        ctrl.publish_step()
        n_pub += 1
    assert len(robot.published) >= n_pub
    last = robot.published[-1]
    assert np.all(np.isfinite(last))
    # parallel ankles are torque-commanded: their published q equals the
    # measured joint position, not the filtered target
    for i in deploy_cfg["mech"]["parallel_mech_indexes"]:
        assert last[i] == pytest.approx(robot.q[i], abs=1e-5)
    ctrl.cleanup()


@pytest.mark.skipif(not os.path.exists(PRETRAINED), reason="no pretrained policy")
def test_fall_detection_stops_controller(deploy_cfg):
    robot = MockRobot()
    remote = ScriptedRemote(auto_start=True)
    ctrl = Controller(deploy_cfg, robot, remote, policy_path=PRETRAINED, sim_time=True)
    ctrl.start_custom_mode(wait=False)
    robot.rpy = np.array([1.2, 0.0, 0.0])  # fallen
    robot.tick()
    assert ctrl.running is False
    ctrl.cleanup()


@pytest.mark.skipif(not os.path.exists(PRETRAINED), reason="no pretrained policy")
def test_standup_state_machine(deploy_cfg):
    robot = MockRobot()
    remote = ScriptedRemote(auto_start=True)
    # no standup artifact is shipped; fake it with the walking policy module
    # wrapped to the standup signature is not possible, so only exercise the
    # state transitions with standup disabled at the policy level
    ctrl = Controller(deploy_cfg, robot, remote, policy_path=PRETRAINED, sim_time=True)
    ctrl.standup_policy = object()  # sentinel: enables the state machine
    ctrl.start_custom_mode(wait=False)
    robot.tick()
    assert ctrl.control_mode is ControlMode.NORMAL
    robot.rpy = np.array([1.2, 0.0, 0.0])
    robot.tick()
    assert ctrl.control_mode is ControlMode.IDLE  # fallen, no request yet
    remote.request_standup()
    robot.tick()
    assert ctrl.control_mode is ControlMode.STANDUP
    robot.rpy = np.zeros(3)
    robot.tick()
    # standup stays latched until operator resets (reference behavior)
    assert ctrl.control_mode is ControlMode.STANDUP
    ctrl.cleanup()


@pytest.mark.skipif(not os.path.exists(PRETRAINED), reason="no pretrained policy")
def test_teleop_stale_freezes_arm_targets(deploy_cfg):
    """When the teleop stream goes stale the controller explicitly freezes
    arm targets instead of chasing manual_upper_body_positions updates."""

    class FakeClient:
        def __init__(self):
            self.is_stale = False

        def stale(self):
            return self.is_stale

    robot = MockRobot(dt=deploy_cfg["common"]["dt"])
    remote = ScriptedRemote(auto_start=True)
    ctrl = Controller(deploy_cfg, robot, remote, policy_path=PRETRAINED,
                      sim_time=True, upper_body_mode=UpperBodyMode.TELEOP)
    client = FakeClient()
    ctrl.set_teleop_client(client)
    ctrl.start_custom_mode(wait=False)
    ctrl.start_rl_gait(wait=False, threaded_publisher=False)

    # live stream: arm targets follow incoming positions
    ctrl.set_upper_body_positions(np.full(10, 0.25, np.float32))
    robot.tick(10)
    ctrl.run_inference_step()
    live = ctrl.dof_target[:10].copy()
    np.testing.assert_allclose(live, 0.25, atol=1e-6)

    # stale stream: new positions arrive but targets hold the last pose
    client.is_stale = True
    ctrl.set_upper_body_positions(np.full(10, 0.9, np.float32))
    for _ in range(10):
        robot.tick(10)
        ctrl.run_inference_step()
    np.testing.assert_allclose(ctrl.dof_target[:10], live, atol=1e-6)

    # recovery: fresh messages resume tracking
    client.is_stale = False
    robot.tick(10)
    ctrl.run_inference_step()
    np.testing.assert_allclose(ctrl.dof_target[:10], 0.9, atol=1e-6)
    ctrl.cleanup()


STANDUP_MODEL = os.path.join(
    os.path.dirname(__file__), "..", "models", "T1_standup.pt")


@pytest.mark.skipif(
    not (os.path.exists(PRETRAINED) and os.path.exists(STANDUP_MODEL)),
    reason="needs walking + standup artifacts")
def test_standup_policy_runs_in_controller(deploy_cfg):
    """The STANDUP control mode driven by OUR trained fall-recovery policy
    (models/T1_standup.pt, produced by train.py --task=T1Standup and
    exported behind the deploy interface): the full wrapper pipeline —
    42-dim frames, 50-frame newest-first stack, mirror-averaged inference,
    action scale/clip (reference deploy/utils/standup_policy.py:137-170) —
    must produce finite, rate-sane joint targets from a fallen state."""
    import copy

    cfg = copy.deepcopy(deploy_cfg)
    cfg["policy"]["standup_policy_path"] = STANDUP_MODEL
    robot = MockRobot()
    remote = ScriptedRemote(auto_start=True)
    ctrl = Controller(cfg, robot, remote, policy_path=PRETRAINED,
                      sim_time=True, enable_standup=True,
                      standup_policy_path=STANDUP_MODEL)
    ctrl.start_custom_mode(wait=False)
    # fall, then request standup
    robot.rpy = np.array([0.0, 1.4, 0.0])
    robot.tick()
    assert ctrl.control_mode is ControlMode.IDLE
    remote.request_standup()
    robot.tick()
    assert ctrl.control_mode is ControlMode.STANDUP

    targets = []
    for _ in range(100):           # 2 s of the 50 Hz inference loop
        robot.tick(10)
        if ctrl.run_inference_step():
            targets.append(ctrl.dof_target.copy())
        ctrl.publish_step()
    t = np.asarray(targets)
    assert len(t) >= 90
    assert np.all(np.isfinite(t))
    # the policy commands the standup joint subset away from pure defaults
    idx = cfg["policy"]["standup_joint_indices"]
    moved = np.abs(t[-1, idx] - t[0, idx]).max()
    assert moved > 1e-4, "standup policy produced frozen targets"
    # and stays within the wrapper's clip envelope around the defaults
    default = np.asarray(cfg["common"]["default_qpos"])
    scale = cfg["policy"]["control"]["action_scale"]
    clip = cfg["policy"]["normalization"]["standup_clip_actions"]
    assert np.all(np.abs(t[:, idx] - default[idx]) <= scale * clip + 1e-5)
    ctrl.cleanup()
