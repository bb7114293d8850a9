"""Teleop reception-path tests against the in-repo WebSocket spoofer
(reference ladder: deploy/websocket_spoofer.py feeding
deploy/upper_body_controller.py, exercised here without VR hardware):
live stream, limit clipping, malformed-message rejection, staleness
watchdog, and server-restart reconnection."""

import asyncio
import json
import socket
import threading
import time

import numpy as np
import pytest

websockets = pytest.importorskip("websockets")

from booster_gym_tpu.deploy.teleop import (
    UPPER_BODY_LIMITS,
    WebSocketArmClient,
    clip_upper_body,
)
from booster_gym_tpu.deploy.teleop_spoofer import JointTargetGenerator, serve


class StubController:
    def __init__(self):
        self.manual_upper_body_positions = np.zeros(10, np.float32)
        self.dof_pos_latest = np.zeros(23, np.float32)
        self.applied = []

    def set_upper_body_positions(self, p):
        self.applied.append(np.array(p))


class SpooferThread:
    """Runs the spoofer server on its own asyncio loop; stoppable."""

    def __init__(self, port, mode="sine", rate_hz=200.0):
        self.port = port
        self.mode = mode
        self.rate_hz = rate_hz
        self.loop = None
        self.thread = None

    def start(self):
        started = threading.Event()

        def run():
            self.loop = asyncio.new_event_loop()
            asyncio.set_event_loop(self.loop)

            async def main():
                self.task = asyncio.ensure_future(
                    serve("127.0.0.1", self.port, self.mode, self.rate_hz))
                await asyncio.sleep(0.05)
                started.set()
                await self.task

            try:
                self.loop.run_until_complete(main())
            except (Exception, asyncio.CancelledError):
                pass
            finally:
                self.loop.close()

        self.thread = threading.Thread(target=run, daemon=True)
        self.thread.start()
        assert started.wait(5.0)

    def stop(self):
        # cancelling the serve task exits the websockets.serve context,
        # which closes the listener and all live connections
        if self.loop is not None and not self.loop.is_closed():
            self.loop.call_soon_threadsafe(self.task.cancel)
        self.thread.join(timeout=5.0)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _wait(cond, timeout=5.0):
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        if cond():
            return True
        time.sleep(0.02)
    return False


def test_generator_modes_respect_limits():
    for mode in ("sine", "random", "fixed"):
        gen = JointTargetGenerator(mode=mode)
        for t in np.linspace(0, 10, 50):
            p = gen.positions_at(t)
            assert np.all(p >= UPPER_BODY_LIMITS[:, 0] - 1e-6)
            assert np.all(p <= UPPER_BODY_LIMITS[:, 1] + 1e-6)


def test_clip_upper_body():
    wild = np.full(10, 100.0)
    np.testing.assert_allclose(clip_upper_body(wild), UPPER_BODY_LIMITS[:, 1])


def test_stream_and_reconnect():
    port = _free_port()
    spoofer = SpooferThread(port)
    spoofer.start()

    ctrl = StubController()
    client = WebSocketArmClient(
        ctrl, uri=f"ws://127.0.0.1:{port}", backoff_initial_s=0.05,
        backoff_max_s=0.2)
    client.start()
    try:
        # live stream: messages arrive, targets applied within limits
        assert _wait(lambda: client.session.messages >= 5)
        assert not client.stale()
        last = ctrl.applied[-1]
        assert np.all(last >= UPPER_BODY_LIMITS[:, 0] - 1e-6)
        assert np.all(last <= UPPER_BODY_LIMITS[:, 1] + 1e-6)
        assert client.session.snapshot()["connections"] == 1

        # server dies -> client notices, stream goes stale
        spoofer.stop()
        assert _wait(lambda: not client.session.connected)
        time.sleep(client.stale_timeout_s + 0.1)
        assert client.stale()

        # server returns on the same port -> client reconnects by itself
        spoofer2 = SpooferThread(port)
        spoofer2.start()
        n_before = client.session.messages
        assert _wait(lambda: client.session.snapshot()["connections"] >= 2, 10.0)
        assert _wait(lambda: client.session.messages > n_before)
        assert not client.stale()
        spoofer2.stop()
    finally:
        client.stop()


def test_malformed_messages_dropped():
    ctrl = StubController()
    client = WebSocketArmClient(ctrl, uri="ws://unused")
    client._apply_targets([1.0] * 3)          # wrong shape
    client._apply_targets([float("nan")] * 10)  # non-finite
    assert client.session.dropped == 2
    assert client.session.messages == 0
    assert ctrl.applied == []


def test_rate_clamp_and_smoothing():
    ctrl = StubController()
    client = WebSocketArmClient(ctrl, uri="ws://unused",
                                smoothing=1.0, max_step=0.1)
    client._apply_targets([1.0] * 10)
    # one message may move each joint at most max_step from the hold pose
    assert np.all(np.abs(ctrl.applied[-1]) <= 0.1 + 1e-6)
    for _ in range(30):
        client._apply_targets([1.0] * 10)
    expected = clip_upper_body(np.ones(10))
    np.testing.assert_allclose(ctrl.applied[-1], expected, atol=1e-5)
