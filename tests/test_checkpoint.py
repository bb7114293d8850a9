"""Checkpoint/resume roundtrip (SURVEY.md §5.4: the reference loses
iteration/LR on resume — utils/runner.py:82-97; ours restores them)."""

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from booster_gym_tpu.runner import Runner
from booster_gym_tpu.utils.config import load_task_cfg
from booster_gym_tpu.utils.recorder import load_checkpoint, resolve_checkpoint


def tiny_cfg(tmpdir, checkpoint=None):
    cfg = load_task_cfg("T1")
    cfg["env"]["num_envs"] = 8
    cfg["terrain"]["type"] = "plane"
    cfg["runner"]["horizon_length"] = 4
    cfg["runner"]["mini_epochs"] = 2
    cfg["runner"]["save_interval"] = 2
    cfg["basic"]["max_iterations"] = 2
    cfg["basic"]["checkpoint"] = checkpoint
    cfg["basic"]["seed"] = 11
    return cfg


def test_train_save_resume_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    runner = Runner(tiny_cfg(tmp_path))
    ts = runner.train()  # 2 iterations, saves model_2.ckpt
    path = resolve_checkpoint(-1, root="logs")
    saved = load_checkpoint(path)
    assert int(saved["iteration"]) == 2
    assert "params" in saved and "opt_state" in saved and "curriculum" in saved

    # resume: params identical, iteration restored, training continues
    cfg2 = tiny_cfg(tmp_path, checkpoint=-1)
    cfg2["basic"]["max_iterations"] = 3
    runner2 = Runner(cfg2)
    env_params, ts2 = runner2._init_state()
    assert int(ts2.iteration) == 2
    a = jax.tree.leaves(ts.params)[0]
    b = jax.tree.leaves(ts2.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the RNG stream resumes exactly where training left off
    np.testing.assert_array_equal(np.asarray(ts.key), np.asarray(ts2.key))
    ts3 = runner2.train()  # runs iteration 2 -> 3
    assert int(ts3.iteration) == 3


def test_export_roundtrip_from_saved_checkpoint(tmp_path, monkeypatch):
    torch = pytest.importorskip("torch")
    monkeypatch.chdir(tmp_path)
    runner = Runner(tiny_cfg(tmp_path))
    runner.train()
    from export_model import export

    out = export(-1, output=str(tmp_path / "actor.pt"))
    module = torch.jit.load(out)
    with torch.no_grad():
        res = module(torch.zeros(1, 47))
    assert res.shape == (1, 12)
    assert np.all(np.isfinite(res.numpy()))
