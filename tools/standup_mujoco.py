"""Cross-sim check of the trained standup policy in MuJoCo.

Drops the 23-DoF serial model into fallen poses in MuJoCo (the independent
CPU oracle, like eval/mujoco_eval.py for walking), lets it settle under
PD-hold, then drives the DEPLOY wrapper itself — StandupPolicy with its
50-frame stack and mirror-averaged inference
(booster_gym_tpu/deploy/policy.py, reference
deploy/utils/standup_policy.py:137-170) — on the exported artifact and
reports whether the robot gets up.

Usage: python tools/standup_mujoco.py [--model models/T1_standup.pt]
           [--seconds 8] [--drops 4] [--out benchmarks/standup_mujoco.json]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import yaml

from booster_gym_tpu.eval.mujoco_eval import load_mjcf, quat_rotate_inverse_np
from booster_gym_tpu.utils.config import load_task_cfg


def run_drop(mujoco, model, data, pol, tcfg, pitch, yaw, seconds, roll=0.0,
             category=""):
    """One fallen-settle-standup episode; returns its outcome record."""
    dt = tcfg["sim"]["dt"]
    decimation = tcfg["control"]["decimation"]
    nd = model.nu
    default = np.zeros(nd, np.float32)
    kp = np.zeros(nd, np.float32)
    kd = np.zeros(nd, np.float32)
    names = [mujoco.mj_id2name(model, mujoco.mjtObj.mjOBJ_ACTUATOR, i)
             for i in range(nd)]
    angle_cfg = tcfg["init_state"]["default_joint_angles"]
    for i, n in enumerate(names):
        found = False
        for key, val in angle_cfg.items():
            if key != "default" and key in n:
                default[i] = val
                found = True
        if not found:
            default[i] = angle_cfg["default"]
        for key in tcfg["control"]["stiffness"]:
            if key in n:
                kp[i] = tcfg["control"]["stiffness"][key]
                kd[i] = tcfg["control"]["damping"][key]

    # fallen init: near-horizontal drop, then settle under PD-hold
    data.qpos[:] = 0.0
    data.qvel[:] = 0.0
    # wxyz quaternion: yaw about z after pitch about y after roll about x
    cr, sr = np.cos(roll / 2), np.sin(roll / 2)
    cp, sp = np.cos(pitch / 2), np.sin(pitch / 2)
    cy, sy = np.cos(yaw / 2), np.sin(yaw / 2)
    data.qpos[3:7] = [
        cy * cp * cr + sy * sp * sr,
        cy * cp * sr - sy * sp * cr,
        cy * sp * cr + sy * cp * sr,
        sy * cp * cr - cy * sp * sr,
    ]
    data.qpos[2] = 0.5
    data.qpos[7:] = default
    mujoco.mj_forward(model, data)

    def pd_step(targets):
        q = data.qpos.astype(np.float32)[7:]
        qd = data.qvel.astype(np.float32)[6:]
        tau = kp * (targets - q) - kd * qd
        data.ctrl[:] = tau
        mujoco.mj_step(model, data)

    for _ in range(int(1.0 / dt)):           # 1 s settle
        pd_step(default)

    pol.reset()
    heights, upz = [], []
    n_steps = int(seconds / dt)
    targets = default.copy()
    for i in range(n_steps):
        if i % decimation == 0:
            q = data.qpos.astype(np.float32)[7:]
            qd = data.qvel.astype(np.float32)[6:]
            quat_xyzw = data.qpos[3:7][[1, 2, 3, 0]].astype(np.float32)
            gyro = data.qvel[3:6].astype(np.float32)
            pg = quat_rotate_inverse_np(quat_xyzw, np.array([0.0, 0.0, -1.0]))
            targets = pol.inference(i * dt, q, qd, gyro, pg)
        pd_step(targets)
        heights.append(float(data.qpos[2]))
        upz.append(float(quat_rotate_inverse_np(
            data.qpos[3:7][[1, 2, 3, 0]].astype(np.float32),
            np.array([0.0, 0.0, -1.0]))[2]))

    h = np.asarray(heights)
    u = np.asarray(upz)
    # success: trunk near standing height and upright, sustained 1 s
    win = int(1.0 / dt)
    ok = False
    for s in range(0, len(h) - win):
        if (h[s:s + win] > 0.55).all() and (u[s:s + win] < -0.9).all():
            ok = True
            break
    return {
        "category": category,
        "pitch_deg": round(np.degrees(pitch), 1),
        "roll_deg": round(np.degrees(roll), 1),
        "yaw_deg": round(np.degrees(yaw), 1),
        "start_height": round(float(h[0]), 3),
        "end_height": round(float(h[-1]), 3),
        "max_height": round(float(h.max()), 3),
        "end_upright": round(float(-u[-1]), 3),
        "success": bool(ok),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="models/T1_standup.pt")
    ap.add_argument("--seconds", type=float, default=8.0)
    ap.add_argument("--drops", type=int, default=4)
    ap.add_argument("--out", default="benchmarks/standup_mujoco.json")
    ap.add_argument("--no-mirror", action="store_true",
                    help="bypass the wrapper's mirror averaging (diagnose "
                         "asymmetric get-up strategies)")
    args = ap.parse_args()

    import mujoco

    from booster_gym_tpu.deploy.policy import StandupPolicy
    from booster_gym_tpu.envs.t1 import _resolve_asset

    tcfg = load_task_cfg("T1Standup")
    dcfg_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "booster_gym_tpu/deploy/configs/T1.yaml")
    with open(dcfg_path) as f:
        dcfg = yaml.safe_load(f)

    # the reference serial MJCF's <contact> pairs were authored for
    # WALKING: feet/thigh/hand/torso/head touch the ground but the calves
    # (shins) have no ground pair at all — a kneeling get-up falls through
    # the floor in stock MuJoCo.  Patch the physically-missing pairs in
    # for this check only (our engine's URDF-derived contact points cover
    # the shins; reference resources/T1/T1_serial.xml:211-236).
    path = _resolve_asset(tcfg["asset"]["mujoco_file"])
    with open(path) as f:
        xml = f.read()
    base = os.path.dirname(os.path.abspath(path))
    import re

    xml = re.sub(r'meshdir="([^"]+)"',
                 lambda m: f'meshdir="{os.path.join(base, m.group(1))}"', xml)
    if '"ground"' in xml and "<geom name=\"ground\"" not in xml:
        xml = xml.replace(
            "<worldbody>",
            '<worldbody>\n    <geom name="ground" type="plane" '
            'pos="0 0 0" size="0 0 1" condim="3"/>', 1)
    xml = xml.replace(
        "</contact>",
        '  <pair geom1="left_calf" geom2="ground" />\n'
        '    <pair geom1="right_calf" geom2="ground" />\n'
        '    <pair geom1="left_forearm" geom2="ground" />\n'
        '    <pair geom1="right_forearm" geom2="ground" />\n'
        '  </contact>')
    import mujoco as _mj

    model = _mj.MjModel.from_xml_string(xml)
    model.opt.timestep = tcfg["sim"]["dt"]
    data = mujoco.MjData(model)
    pol = StandupPolicy(dcfg, policy_path=args.model)
    if args.no_mirror:
        pol.mirror_average = False
    if not hasattr(pol, "reset"):
        # wrapper resets by re-arming first_inference
        def _reset():
            pol.first_inference = True
            pol.actions[:] = 0.0
            pol.dof_targets[:] = pol.full_default
        pol.reset = _reset

    # drop categories (reference deploy_standup.py recovers from arbitrary
    # falls): prone = face-down (pitch +), supine = face-up (pitch -),
    # side = roll +-.  Angle jitter +-10 deg, yaw uniform.
    results = []
    rng = np.random.default_rng(0)
    cats = ["prone", "supine", "side"]
    for k in range(args.drops):
        cat = cats[k % len(cats)]
        ang = np.deg2rad(85.0 + float(rng.uniform(-10.0, 10.0)))
        yaw = float(rng.uniform(0, 2 * np.pi))
        pitch, roll = 0.0, 0.0
        if cat == "prone":
            pitch = ang
        elif cat == "supine":
            pitch = -ang
        else:
            roll = ang * (1 if k % 2 == 0 else -1)
        rec = run_drop(mujoco, model, data, pol, tcfg, pitch, yaw,
                       args.seconds, roll=roll, category=cat)
        print(json.dumps(rec), flush=True)
        results.append(rec)

    per_cat = {
        c: {
            "n": sum(r["category"] == c for r in results),
            "success": sum(r["success"] for r in results
                           if r["category"] == c),
        }
        for c in cats
    }
    summary = {
        "model": args.model,
        "mirror_average": bool(pol.mirror_average),
        "drops": results,
        "per_category": per_cat,
        "n_success": sum(r["success"] for r in results),
        "n_drops": len(results),
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"wrote {args.out}: {summary['n_success']}/{summary['n_drops']} "
          f"successful get-ups; per-category "
          f"{json.dumps(per_cat)}", flush=True)


if __name__ == "__main__":
    main()
