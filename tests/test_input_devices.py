"""Command-input sources for the MuJoCo harness (reference:
play_mujoco.py:139-278 joystick/keyboard input)."""

import numpy as np
import pytest

from booster_gym_tpu.eval.input_devices import (
    CommandState,
    JoystickCommands,
    KeyboardCommands,
    make_command_source,
)


def test_keyboard_map():
    s = CommandState()
    kb = KeyboardCommands(s)
    for c in "wwa":
        kb(ord(c))
    np.testing.assert_allclose(s.cmd, [0.2, 0.1, 0.0], atol=1e-6)
    kb(ord("e"))
    assert s.cmd[2] == pytest.approx(-0.1)
    kb(ord(" "))
    np.testing.assert_allclose(s.cmd, 0.0)
    kb(ord("="))
    assert s.gait_frequency == pytest.approx(1.6)
    kb(ord("v"))
    assert s.pop_flag("toggle_recording") is True
    assert s.pop_flag("toggle_recording") is False
    kb(ord("r"))
    assert s.pop_flag("reset") is True


def test_joystick_requires_hardware():
    # no joystick in this container: constructing must raise so
    # make_command_source falls back to keyboard
    s = CommandState()
    with pytest.raises(Exception):
        JoystickCommands(s)
    src, key_cb = make_command_source(s, prefer_joystick=True)
    assert isinstance(src, KeyboardCommands)
    assert key_cb is src


class _FakeJoystick:
    """Deterministic pygame.joystick.Joystick stand-in."""

    def __init__(self, axes, buttons):
        self.axes = axes
        self.buttons = buttons

    def init(self):
        pass

    def get_name(self):
        return "fake"

    def get_axis(self, i):
        return self.axes[i]

    def get_numaxes(self):
        return len(self.axes)

    def get_button(self, i):
        return self.buttons[i]


def test_joystick_mapping_deadzone_and_buttons():
    s = CommandState()
    js = JoystickCommands.__new__(JoystickCommands)
    js.state = s
    js.deadzone = 0.1
    js.scale = np.array([1.0, 0.5, 1.0], np.float32)
    js.gait_range = (1.0, 2.0)
    js._record_was_down = False

    class _PG:
        class event:
            @staticmethod
            def pump():
                pass

    js._pg = _PG
    # half-forward stick (axis 1 = -0.55 after inversion -> +vx), small
    # sideways inside deadzone, full trigger
    js.js = _FakeJoystick(
        axes=[0.05, -0.55, 0.0, 0.0, 0.0, 1.0], buttons=[0, 0, 0])
    js.poll()
    assert s.cmd[0] == pytest.approx((0.55 - 0.1) / 0.9, rel=1e-5)
    assert s.cmd[1] == 0.0  # deadzone
    assert s.gait_frequency == pytest.approx(2.0)

    # stop button zeroes commands; record button edge-triggers once
    js.js = _FakeJoystick(
        axes=[0.0, -1.0, 0.0, 0.0, 0.0, -1.0], buttons=[1, 0, 1])
    js.poll()
    np.testing.assert_allclose(s.cmd, 0.0)
    assert s.pop_flag("toggle_recording") is True
    js.poll()  # still held: no retrigger
    assert s.pop_flag("toggle_recording") is False
