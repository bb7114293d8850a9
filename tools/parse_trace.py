"""Parse a jax.profiler trace directory into per-op device timings.

Usage: python tools/parse_trace.py /tmp/my_trace [top_n] [n_iters]

Reads the newest xplane.pb under <dir>/plugins/profile/*/ and prints the
top ops by total device time on each TPU plane, divided by n_iters
(default 5) to give per-iteration costs.

This is the ground truth for performance work on this machine: wall-clock
micro-benchmarks of async-dispatched JAX calls produced wildly wrong
numbers during round 2 (the "gathers are sometimes free" artifacts), while
the xplane device timeline exposed the real costs (~10 ns/element gathers,
6 ms per corner sweep) that motivated terrain/sample_kernel.py.
"""

import glob
import sys
from collections import defaultdict


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    n_iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb"))
    if not files:
        sys.exit(f"no xplane.pb under {trace_dir}")
    space = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name:
            continue
        agg = defaultdict(float)
        cnt = defaultdict(int)
        for line in plane.lines:
            for ev in line.events:
                md = plane.event_metadata[ev.metadata_id]
                agg[md.name] += ev.duration_ps / 1e6
                cnt[md.name] += 1
        print(f"== {plane.name} (us per iteration, /{n_iters})")
        for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:top_n]:
            print(f"  {dur / n_iters:10.1f} us x{cnt[name] // n_iters:5d}  "
                  f"{name[:95]}")


if __name__ == "__main__":
    main()
