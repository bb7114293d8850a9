"""Offline video renderer: chunking/order/writer logic driven end-to-end
through the spawn worker pool and the cv2 mp4 writer (reference analog:
play_mujoco.py:451-688's mp.Process batch renderer).  Skips only if no GL
backend can do an offscreen render in this environment (Mesa software EGL
normally can)."""

import os

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")
cv2 = pytest.importorskip("cv2")

from booster_gym_tpu.envs.t1 import _resolve_asset
from booster_gym_tpu.eval.render import _gl_available, render_states_to_video

pytestmark = pytest.mark.skipif(
    not _gl_available(), reason="no offscreen GL backend")


def test_render_states_to_video_end_to_end(tmp_path):
    mjcf = _resolve_asset("resources/T1/T1_locomotion.xml")
    n = 12
    qpos = np.zeros((n, 19), np.float32)
    qpos[:, 2] = 0.72
    qpos[:, 3] = 1.0
    qpos[:, 0] = np.linspace(0.0, 1.0, n)  # walk the camera target forward
    out = str(tmp_path / "clip.mp4")
    path = render_states_to_video(
        mjcf, qpos, out, fps=25, width=160, height=120, workers=2)
    assert path == out and os.path.getsize(out) > 0

    cap = cv2.VideoCapture(out)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == n
    assert cap.get(cv2.CAP_PROP_FPS) == pytest.approx(25.0)
    ok, frame = cap.read()
    assert ok and frame.shape == (120, 160, 3)
    assert (frame > 0).sum() > 100  # actual rendered content, not black
    cap.release()


def test_render_missing_dir_created(tmp_path):
    mjcf = _resolve_asset("resources/T1/T1_locomotion.xml")
    qpos = np.zeros((2, 19), np.float32)
    qpos[:, 2] = 0.72
    qpos[:, 3] = 1.0
    out = str(tmp_path / "nested" / "dir" / "clip.mp4")
    render_states_to_video(
        mjcf, qpos, out, fps=25, width=96, height=64, workers=1)
    assert os.path.getsize(out) > 0
