#!/bin/bash
# Round-3 on-chip validation checklist — run top to bottom when the TPU
# tunnel is healthy (each step is independently restartable).  Writes
# artifacts under benchmarks/ and logs under /tmp/tpu_r3/.
set -x
mkdir -p /tmp/tpu_r3 benchmarks

# 0. is the chip alive?
timeout 600 python -c "import jax; print(jax.devices())" || exit 1

# 1. driver-contract benchmark (flat, 4096 envs)
python bench.py 2>/tmp/tpu_r3/bench.err | tee /tmp/tpu_r3/bench.json

# 2. kernel validation, both models
python tools/validate_pallas_tpu.py | tee /tmp/tpu_r3/validate_12dof.log
python tools/validate_pallas_tpu.py \
    --urdf /root/reference/resources/T1/T1_serial.urdf \
    | tee /tmp/tpu_r3/validate_serial.log

# 3. profiler trace of the steady-state iteration (perf work input)
python train.py --task=T1 --terrain=plane --num_envs=4096 \
    --max_iterations=20 --profile=/tmp/tpu_r3/trace 2>&1 | tail -5
python tools/parse_trace.py /tmp/tpu_r3/trace | head -40 \
    | tee /tmp/tpu_r3/top_ops.txt

# 4. 23-DoF serial training smoke (compiles in ~1 min on TPU)
python train.py --task=T1Serial --terrain=plane --num_envs=1024 \
    --max_iterations=50 2>&1 | tail -5

# 5. A/B the two env divergences (~10 min total)
python tools/ab_divergence.py --iters 1000 --num_envs 4096 --seeds 0 1

# 6. rough-terrain throughput check (trimesh default config)
python train.py --task=T1 --num_envs=8192 --max_iterations=30 2>&1 | tail -3
