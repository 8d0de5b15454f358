"""One-process TPU measurement session: kernel microbench + full bench.

The remote-TPU tunnel wedges when several JAX processes run back-to-back;
running everything in ONE process avoids that. Writes KERNELS_r04.json
and prints the bench JSON line last.
"""
import io
import json
import os
import sys
import contextlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench_kernels

# --- kernel microbench at bench shapes ---------------------------------
buf = io.StringIO()
sys.argv = ["bench_kernels.py", "256", "16", "16", "8192"]
with contextlib.redirect_stdout(buf):
    bench_kernels.main()
lines = [json.loads(l) for l in buf.getvalue().splitlines() if l.strip()]
for l in lines:
    print("#", l, file=sys.stderr)
out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "KERNELS_r04.json")
with open(out, "w") as f:
    json.dump(lines, f, indent=1)
print("# wrote", out, file=sys.stderr, flush=True)

# --- full bench --------------------------------------------------------
import bench
bench.main()
