"""Upper-body VR teleoperation client + mock tracking source.

Re-design of the reference's WebSocket arm-teleop path (reference:
deploy/upper_body_controller.py): receive target joint positions for the 10
upper-body joints over WebSocket, clip to per-joint limits, feed them into
the Controller; stream observed joint positions back.  A MockArmTracking
source generates sine/fixed trajectories in-process for tests without VR
hardware (reference: upper_body_controller.py MockArmTrackingSystem).
"""

import json
import logging
import threading
import time

import numpy as np

logger = logging.getLogger(__name__)

# per-joint position limits for [head(2), left arm(4), right arm(4)]
UPPER_BODY_LIMITS = np.array(
    [
        [-1.57, 1.57], [-0.35, 1.22],
        [-3.31, 1.22], [-2.2, 0.0], [-2.0, 2.0], [-2.0, 0.0],
        [-3.31, 1.22], [0.0, 2.2], [-2.0, 2.0], [0.0, 2.0],
    ],
    dtype=np.float32,
)


def clip_upper_body(positions):
    p = np.asarray(positions, np.float32)[: len(UPPER_BODY_LIMITS)]
    return np.clip(p, UPPER_BODY_LIMITS[: len(p), 0], UPPER_BODY_LIMITS[: len(p), 1])


class MockArmTracking:
    """In-process tracking source: sine sweep or fixed pose at a given rate."""

    def __init__(self, controller, mode="sine", rate_hz=100.0, amplitude=0.3):
        self.controller = controller
        self.mode = mode
        self.rate_hz = rate_hz
        self.amplitude = amplitude
        self.base = controller.manual_upper_body_positions.copy()
        self._running = False
        self._thread = None

    def positions_at(self, t):
        if self.mode == "sine":
            return clip_upper_body(
                self.base + self.amplitude * np.sin(2 * np.pi * 0.2 * t))
        return clip_upper_body(self.base)

    def start(self):
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self):
        t0 = time.time()
        while self._running:
            self.controller.set_upper_body_positions(self.positions_at(time.time() - t0))
            time.sleep(1.0 / self.rate_hz)

    def stop(self):
        self._running = False


class WebSocketArmClient:
    """Connects to a VR tracking server; applies received target_positions to
    the controller and streams back observed positions."""

    def __init__(self, controller, uri="ws://localhost:8765", stream_back=True):
        self.controller = controller
        self.uri = uri
        self.stream_back = stream_back
        self._running = False

    async def _session(self):
        import websockets

        async with websockets.connect(self.uri) as ws:
            logger.info("teleop connected to %s", self.uri)
            while self._running:
                raw = await ws.recv()
                msg = json.loads(raw)
                if "target_positions" in msg:
                    self.controller.set_upper_body_positions(
                        clip_upper_body(msg["target_positions"]))
                if self.stream_back:
                    observed = self.controller.dof_pos_latest[:10].tolist()
                    await ws.send(json.dumps({"observed_positions": observed}))

    def run_forever(self):
        import asyncio

        self._running = True
        while self._running:
            try:
                asyncio.run(self._session())
            except Exception as e:
                logger.warning("teleop connection lost (%s); retrying", e)
                time.sleep(1.0)

    def stop(self):
        self._running = False
