"""Native C++ publisher vs the Python publish pipeline: same math, paced
loop keeps its deadlines."""

import os
import time

import numpy as np
import pytest
import yaml

from booster_gym_tpu.deploy import native

if not native.available():
    pytest.skip("no C++ toolchain for the native publisher", allow_module_level=True)

CFG_PATH = os.path.join(
    os.path.dirname(__file__), "..", "booster_gym_tpu", "deploy", "configs", "T1.yaml")


@pytest.fixture(scope="module")
def cfg():
    with open(CFG_PATH) as f:
        return yaml.safe_load(f)


def python_publish_step(cfg, filtered, targets, measured, teleop=False):
    """The reference pipeline in numpy (controller.publish_step semantics)."""
    n = len(filtered)
    w = np.full(n, 0.8)
    if teleop:
        w[:10] = 0.9
    filtered = filtered * w + targets * (1 - w)
    q = filtered.copy()
    tau = np.zeros(n)
    mask = np.ones(n)
    for i in cfg["mech"]["parallel_mech_indexes"]:
        q[i] = measured[i]
        tau[i] = np.clip(
            (filtered[i] - measured[i]) * cfg["common"]["stiffness"][i],
            -cfg["common"]["torque_limit"][i], cfg["common"]["torque_limit"][i])
        mask[i] = 0.0
    return filtered, q, tau, mask


def test_native_matches_python_pipeline(cfg):
    rng = np.random.default_rng(0)
    n = 23
    pub = native.NativePublisher(cfg)
    q0 = rng.normal(0, 0.2, n).astype(np.float32)
    pub.init_filtered(q0)
    filtered_py = q0.astype(np.float64).copy()
    for step in range(20):
        targets = rng.normal(0, 0.3, n).astype(np.float32)
        measured = rng.normal(0, 0.3, n).astype(np.float32)
        pub.set_targets(targets, measured)
        q_c, tau_c, mask_c = pub.step()
        filtered_py, q_py, tau_py, mask_py = python_publish_step(
            cfg, filtered_py, targets, measured)
        np.testing.assert_allclose(q_c, q_py, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(tau_c, tau_py, rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(mask_c, mask_py)


def test_paced_loop_holds_rate(cfg):
    pub = native.NativePublisher(cfg)
    pub.init_filtered(np.zeros(23, np.float32))
    pub.set_targets(np.zeros(23, np.float32), np.zeros(23, np.float32))
    calls = []
    t0 = time.perf_counter()
    overruns = pub.run_loop(lambda q, tau, m: calls.append(time.perf_counter()), 250)
    elapsed = time.perf_counter() - t0
    assert len(calls) == 250
    # 250 periods at 2 ms = 0.5 s; allow generous slack on a busy CI box
    assert 0.4 < elapsed < 1.5, elapsed
    assert overruns < 50
