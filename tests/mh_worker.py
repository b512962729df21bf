"""Worker process for the REAL 2-process multihost test.

Invoked by tests/test_multihost.py as a subprocess per simulated host:
initializes jax.distributed over a localhost coordinator with 4 virtual
CPU devices per process (8 global), compresses only this process's frame
slice through multihost_compress, and writes its compressed rows plus the
write plan and the locally-built seek table to the shared out dir. The
parent asserts the stitched archive is byte-identical to a single-process
encode and that both hosts built the identical seek table.
"""

import json
import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
outdir = sys.argv[4]

os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    f"localhost:{port}", num_processes=nproc, process_id=pid
)

import numpy as np  # noqa: E402

from zeekstd_tpu.parallel.multihost import (  # noqa: E402
    make_multihost_mesh,
    multihost_compress,
    process_frame_slice,
)
from zeekstd_tpu.parallel.pipeline import _frame_layout  # noqa: E402


def corpus(n):
    rng = np.random.default_rng(7)
    words = [rng.bytes(rng.integers(3, 9)) for _ in range(50)]
    out = bytearray()
    while len(out) < n:
        out += words[int(rng.integers(0, 50))]
    return bytes(out[:n])


FR = 16 << 10
data = corpus(120 << 10)  # 8 frames, last one partial
n_total = len(data)

mesh = make_multihost_mesh()
_, F_pad = _frame_layout(n_total, FR, mesh.devices.size)
lo, hi = process_frame_slice(F_pad, mesh)
local = data[lo * FR : min(hi * FR, n_total)]

local_rows, plan, st = multihost_compress(
    local, first_frame=lo, n_total=n_total, frame_size=FR, mesh=mesh, level=1
)

with open(os.path.join(outdir, f"part{pid}.bin"), "wb") as f:
    for row in local_rows:
        f.write(row)
with open(os.path.join(outdir, f"st{pid}.bin"), "wb") as f:
    f.write(st.to_bytes())
with open(os.path.join(outdir, f"meta{pid}.json"), "w") as f:
    json.dump(
        {
            "first_frame": lo,
            "plan": plan,
            "n_rows": len(local_rows),
        },
        f,
    )
print(f"proc {pid}: frames [{lo}, {hi}) rows={len(local_rows)}", flush=True)
