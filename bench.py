"""Benchmark: end-to-end PPO training throughput on the T1 task.

Prints ONE JSON line (stdout carries ONLY this line; all diagnostics go to
stderr — guaranteed on every exit path including backend failures, alarms,
and unexpected exceptions):

  {"metric": "env_steps_per_sec_per_chip", "value": N, "unit": "env-steps/s",
   "vs_baseline": N}

The metric is full-pipeline env-steps/sec/chip at 4096 envs (BASELINE.md
north star): each PPO iteration = horizon(24) x 4096 env-steps, where one
env-step = 10 physics substeps + obs/reward + its share of the 20-mini-epoch
update.  vs_baseline is relative to 100k env-steps/s, the assumed Isaac Gym
A100 throughput for this task (the reference publishes no number —
BASELINE.md documents the assumption; >= 0.625 here corresponds to the
"10x A100 aggregate on a 16-chip v5p" target).

Backend hardening (round-2 BENCH failure: the TPU plugin raised UNAVAILABLE
at capture time and the script died before the JSON line): backend init is
retried with backoff and backend-cache clearing; if it never comes up, the
JSON line is still emitted with "value": null and an "error" diagnosis.  A
SIGALRM watchdog bounds total runtime so a hang also produces the line.
"""

import json
import signal
import sys
import time

import os as _os

A100_BASELINE_ENV_STEPS_PER_SEC = 100_000.0
# watchdog: emit an error JSON line instead of hanging (env-overridable for
# tests and for drivers with their own tighter deadline)
TOTAL_TIMEOUT_S = float(_os.environ.get("BENCH_TIMEOUT_S", 3000))

_emitted = False
_succeeded = False


def emit(value, extra=None):
    """Print the single stdout JSON line (at most once)."""
    global _emitted, _succeeded
    if _emitted:
        return
    _emitted = True
    _succeeded = value is not None
    line = {
        "metric": "env_steps_per_sec_per_chip",
        "value": round(value, 1) if value is not None else None,
        "unit": "env-steps/s",
        "vs_baseline": (
            round(value / A100_BASELINE_ENV_STEPS_PER_SEC, 3)
            if value is not None else None
        ),
    }
    if extra:
        line.update(extra)
    print(json.dumps(line), flush=True)


def _devices_with_timeout(timeout_s):
    """jax.devices() in a daemon thread with a join timeout.

    The axon TPU plugin has been observed to HANG during setup (not just
    error), blocked in native code where SIGALRM can't preempt it; a
    side thread + join timeout is the only reliable bound.  Returns
    (devices_or_None, error_string_or_None); on timeout both describe it.
    """
    import threading

    result = {}

    def probe():
        import jax
        try:
            result["devs"] = jax.devices()
        except Exception as e:  # noqa: BLE001 - diagnose anything
            result["err"] = f"{type(e).__name__}: {e}"

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    if th.is_alive():
        return None, f"backend init hung > {timeout_s:.0f}s"
    return result.get("devs"), result.get("err")


def _init_devices(retries=3, base_delay=15.0, attempt_timeout_s=600.0):
    """jax.devices() with retry and per-attempt hang timeout.

    The axon TPU plugin intermittently fails setup with UNAVAILABLE
    (BENCH_r02) or hangs outright; jax caches the failed backend, so clear
    backends between attempts.  Returns (devices, error_string_or_None).
    """
    last = None
    for attempt in range(retries):
        devs, err = _devices_with_timeout(attempt_timeout_s)
        if devs is not None:
            return devs, None
        last = err
        print(f"backend init attempt {attempt + 1}/{retries} failed: "
              f"{last}", file=sys.stderr)
        if "hung" in (err or ""):
            # the probe thread is still stuck inside the plugin; a retry in
            # this process would just pile up — report and bail
            return None, last
        try:
            import jax.extend.backend as jeb
            jeb.clear_backends()
        except Exception as ce:  # noqa: BLE001
            print(f"clear_backends failed: {ce}", file=sys.stderr)
        if attempt < retries - 1:
            time.sleep(base_delay * (attempt + 1))
    return None, last


def run_bench():
    import jax

    from booster_gym_tpu.algo import PPO
    from booster_gym_tpu.envs import make_task
    from booster_gym_tpu.utils.config import load_task_cfg

    devs, err = _init_devices()
    if devs is None:
        emit(None, {"error": f"backend init failed after retries: {err}"})
        return
    print(f"devices: {devs}", file=sys.stderr)

    # BENCH_NUM_ENVS: smoke-test override (e.g. tiny CPU run of the full
    # success path); the driver contract always runs the 4096 default
    num_envs = int(_os.environ.get("BENCH_NUM_ENVS", 4096))
    cfg = load_task_cfg("T1")
    cfg["env"]["num_envs"] = num_envs
    cfg["terrain"]["type"] = "plane"

    env = make_task(cfg)
    ppo = PPO(env, cfg)

    t0 = time.time()
    # un-jitted: init runs once; jitting it costs a ~17 min cold compile of
    # the full reset path for zero steady-state benefit (VERDICT r1 weak #1)
    env_params, ts = ppo.init(jax.random.PRNGKey(0))
    jax.block_until_ready(ts.obs)
    print(f"init: {time.time() - t0:.1f}s", file=sys.stderr)

    n_dev = len(devs)
    if n_dev > 1 and num_envs % n_dev == 0:
        from booster_gym_tpu.parallel import make_mesh, shard_batch_pytree

        mesh = make_mesh()
        env.set_mesh(mesh)
        ppo.set_mesh(mesh)
        env_params = shard_batch_pytree(mesh, env_params, num_envs)
        ts = shard_batch_pytree(mesh, ts, num_envs)
        print(f"data-parallel over {n_dev} devices", file=sys.stderr)

    step = jax.jit(ppo.train_iteration, donate_argnums=(1,))
    t0 = time.time()
    ts, metrics = step(env_params, ts)
    jax.block_until_ready(metrics)
    print(f"compile+first iter: {time.time() - t0:.1f}s", file=sys.stderr)

    warmup, iters = 3, 20
    for _ in range(warmup):
        ts, metrics = step(env_params, ts)
    jax.block_until_ready(metrics)
    t0 = time.time()
    for _ in range(iters):
        ts, metrics = step(env_params, ts)
    jax.block_until_ready(metrics)
    dt = time.time() - t0

    env_steps = iters * cfg["runner"]["horizon_length"] * num_envs
    steps_per_sec = env_steps / dt
    per_chip = steps_per_sec / max(1, n_dev)
    print(
        f"{iters} iters in {dt:.2f}s -> {steps_per_sec:,.0f} env-steps/s "
        f"({per_chip:,.0f}/chip), sim-steps/s {steps_per_sec * 10:,.0f}, "
        f"reward={float(metrics['reward']):.3f}",
        file=sys.stderr,
    )
    phases = _phase_split(jax, env, ppo, env_params, ts,
                          t_iter_ms=dt / iters * 1000.0, step=step)
    emit(per_chip, {"phases_ms": phases} if phases else None)


def _phase_split(jax, env, ppo, env_params, ts, t_iter_ms, step):
    """Per-phase attribution (VERDICT r3 #8, r4 #5): ADDITIVE by
    construction — the phases come from ONE xplane device trace of the
    production step, not from separately dispatched sub-programs (round 4
    double-counted ~6 ms of tunnel dispatch; a measuring lax.scan adds
    carry copies).  The device timeline nests as

        jit_train_iteration
          rollout while          (contains the physics inner while)
          update while           (the mini-epoch scan)
          other = iter_dev - rollout - update   (peeled epoch 0 + metrics)
        dispatch = wall iter - iter_dev

    so rollout + update + other + dispatch == iter by construction; the
    physics/env_layer lines split the rollout line the same way.  Ops are
    classified structurally: the rollout while carries the [B, 3] root
    state, the physics inner while carries [..., 8, 128] packed planes,
    the update while is the remaining top-level scan.  Diagnostics only —
    any failure is reported and swallowed."""
    import glob
    import tempfile
    from collections import defaultdict

    try:
        n_tr = 3
        tdir = tempfile.mkdtemp(prefix="bench_trace_")
        ts2 = ts
        with jax.profiler.trace(tdir):
            for _ in range(n_tr):
                ts2, metrics = step(env_params, ts2)
            jax.block_until_ready(metrics)

        from tensorflow.tsl.profiler.protobuf import xplane_pb2

        files = sorted(glob.glob(f"{tdir}/plugins/profile/*/*.xplane.pb"))
        space = xplane_pb2.XSpace()
        with open(files[-1], "rb") as f:
            space.ParseFromString(f.read())
        agg = defaultdict(float)
        cnt = defaultdict(int)
        for plane in space.planes:
            if "TPU" not in plane.name:
                continue
            for line in plane.lines:
                for ev in line.events:
                    md = plane.event_metadata[ev.metadata_id]
                    agg[md.name] += ev.duration_ps / 1e6 / n_tr
                    cnt[md.name] += 1

        B = int(ts.obs.shape[0])
        iter_dev = max((v for k, v in agg.items()
                        if k.startswith("jit_train_iteration")), default=0.0)
        if iter_dev <= 0.0:
            raise RuntimeError("no TPU plane in trace (CPU run?)")
        whiles = sorted(((v, k) for k, v in agg.items()
                         if k.startswith("%while")), reverse=True)[:6]
        roll_w = next((v for v, k in whiles if f"[{B},3]" in k), 0.0)
        phys_w = next((v for v, k in whiles if ",8,128]" in k), 0.0)
        upd_w = next((v for v, k in whiles
                      if f"[{B},3]" not in k and ",8,128]" not in k), 0.0)
        phases = {
            "iter": round(t_iter_ms, 2),
            "rollout": round(roll_w / 1000.0, 2),
            "update": round(upd_w / 1000.0, 2),
            "other": round((iter_dev - roll_w - upd_w) / 1000.0, 2),
            "dispatch": round(t_iter_ms - iter_dev / 1000.0, 2),
            "physics": round(phys_w / 1000.0, 2),
            "env_layer": round((roll_w - phys_w) / 1000.0, 2),
        }
        total = (phases["rollout"] + phases["update"] + phases["other"]
                 + phases["dispatch"])
        print(f"phase split (ms/iter, device-trace): {phases}  "
              f"[additive: rollout+update+other+dispatch = {total:.2f} vs "
              f"iter {phases['iter']:.2f}; physics/env_layer split the "
              f"rollout line]", file=sys.stderr)
        return phases
    except Exception as e:  # noqa: BLE001 - diagnostics must never fail bench
        print(f"phase split skipped: {type(e).__name__}: {e}",
              file=sys.stderr)
        return None


def main():
    """Run the bench in a worker thread; keep the main thread free.

    A hung XLA/plugin call blocks signal delivery to the thread it runs in,
    so the watchdog (and SIGTERM from an external `timeout`) only works if
    the main thread stays in interruptible Python code: it sits in a
    join-with-deadline loop and force-emits the JSON line on timeout/signal.
    """
    import os
    import threading

    def _term(signum, frame):  # noqa: ARG001
        emit(None, {"error": f"killed by signal {signum}"})
        sys.stdout.flush()
        os._exit(1)

    try:
        signal.signal(signal.SIGTERM, _term)
        signal.signal(signal.SIGINT, _term)
    except (ValueError, OSError) as e:  # platform quirk
        print(f"no signal handlers: {e}", file=sys.stderr)

    # The remote-compile tunnel can drop MID-RUN with a transient
    # JaxRuntimeError (observed: "remote_compile: read body: response body
    # closed before all bytes were read" during the warmup loop, AFTER the
    # big compile succeeded).  Retry the whole bench on transient-looking
    # failures — the persistent compilation cache makes retries warm.
    # Matches are deliberately narrow (tunnel/transport strings, not bare
    # "INTERNAL"/"connection"): a deterministic XLA INTERNAL error must
    # fail fast with its own message, not burn two retries first.
    TRANSIENT = ("remote_compile", "UNAVAILABLE", "DEADLINE_EXCEEDED",
                 "read body", "connection reset", "connection closed",
                 "Failed to connect", "Socket closed", "RST_STREAM")
    # a warm retry needs ~200s eager init + seconds of cached compile +
    # ~60s measurement; below this remaining budget a retry can only end
    # as a generic watchdog timeout, so emit the specific error instead
    WARM_RETRY_BUDGET_S = 500.0
    start_time = time.time()

    def worker():
        for attempt in range(3):
            try:
                run_bench()
                return
            except BaseException as e:  # noqa: BLE001 - the JSON line must win
                import traceback
                traceback.print_exc(file=sys.stderr)
                msg = f"{type(e).__name__}: {e}"
                if _emitted:
                    return
                remaining = TOTAL_TIMEOUT_S - (time.time() - start_time)
                transient = any(t in msg for t in TRANSIENT)
                if transient and remaining < WARM_RETRY_BUDGET_S:
                    print(f"transient failure but only {remaining:.0f}s of "
                          f"watchdog budget left (< {WARM_RETRY_BUDGET_S:.0f}s"
                          f") — not retrying: {msg}", file=sys.stderr)
                    emit(None, {"error": msg})
                    return
                if attempt < 2 and transient:
                    print(f"transient failure, retrying bench "
                          f"(attempt {attempt + 2}/3): {msg}",
                          file=sys.stderr)
                    try:
                        import jax.extend.backend as jeb
                        jeb.clear_backends()
                    except Exception as ce:  # noqa: BLE001
                        print(f"clear_backends failed: {ce}",
                              file=sys.stderr)
                    time.sleep(10.0 * (attempt + 1))
                    continue
                emit(None, {"error": msg})
                return

    th = threading.Thread(target=worker, daemon=True)
    th.start()
    th.join(TOTAL_TIMEOUT_S)
    if th.is_alive():
        emit(None, {"error": f"watchdog: bench exceeded {TOTAL_TIMEOUT_S}s"})
        sys.stdout.flush()
        os._exit(1)
    emit(None, {"error": "bench finished without a measurement"})
    sys.stdout.flush()
    os._exit(0 if _succeeded else 1)


if __name__ == "__main__":
    main()
