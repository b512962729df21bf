"""Multi-host (DCN-spanning) scale-out for the frame pipeline.

The single-program shard_map pipeline in ``pipeline.py`` already runs
unchanged on a pod: every process executes the same jitted program over a
global mesh, and the all-gather that builds the seek table moves remote
entries over whatever link backs the mesh axis. What multi-host adds is
purely topological, and lives here:

- process bootstrap (``jax.distributed.initialize``) — reference analog:
  the reference is single-process (lib delegates to libzstd worker
  threads); this is the TPU-native scale-out axis beyond it.
- a hybrid mesh whose frame axis is ordered host-major, so the contiguous
  frame blocks each device owns stay on-host and the frame-entry gather
  crosses DCN exactly once per host pair instead of per frame.
- process-local staging: each host materializes ONLY its own frame rows
  (``jax.make_array_from_process_local_data``); no host ever holds the
  whole input.
- addressable-output extraction: after the sharded encode, each host pulls
  only its own compressed rows, and writes them at the byte offset the
  (replicated) gathered entry array implies — the distributed form of the
  reference's sequential writer + ``log_frame``
  (reference lib/src/encode.rs:466-467,743-775).

Every function degrades to the single-process case, which is how the test
suite and the 8-device virtual mesh exercise this module; a real pod runs
the same code with ``init_multihost`` called once per process.
"""

from __future__ import annotations

import numpy as np

from ..seek_table import SeekTable
from .pipeline import _jax


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> int:
    """Bootstrap the JAX distributed runtime (no-op when single-process).

    With no arguments, auto-detects cluster environments (TPU pods set the
    metadata jax.distributed reads natively). Returns the process index.
    """
    jax, _ = _jax()
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index()


def make_multihost_mesh(axis: str = "data"):
    """1-D frame mesh over all global devices, ordered host-major.

    Host-major order keeps each host's frame block on its own chips (frame
    i -> device i*D/F lives on host (i*D/F)//local): the sharded encode is
    then DCN-free, and only the entry/byte all-gather crosses hosts.
    """
    jax, _ = _jax()
    from jax.sharding import Mesh

    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.asarray(devs), (axis,))


def process_frame_slice(n_frames_padded: int, mesh=None):
    """(lo, hi) frame indices this process owns under the host-major mesh.

    Frames are laid out contiguously over the mesh; a process owns the
    rows its addressable devices carry.
    """
    jax, _ = _jax()
    if mesh is None:
        mesh = make_multihost_mesh()
    devs = list(mesh.devices.flat)
    per_dev = n_frames_padded // len(devs)
    mine = [i for i, d in enumerate(devs) if d.process_index == jax.process_index()]
    if not mine:
        return 0, 0
    return mine[0] * per_dev, (mine[-1] + 1) * per_dev


def host_write_plan(c_sizes, d_sizes, first_frame: int, n_local: int):
    """Byte-offset plan for this host's ordered write of its own frames.

    ``c_sizes``/``d_sizes`` are the REPLICATED gathered per-frame entry
    arrays (every process holds them after the pipeline's all-gather).
    Returns (file_offset_of_first_local_frame, [per-frame (offset, size)]),
    plus the SeekTable every host can build identically.
    """
    c_sizes = np.asarray(c_sizes, np.int64)
    d_sizes = np.asarray(d_sizes, np.int64)
    starts = np.concatenate([[0], np.cumsum(c_sizes)])
    plan = [
        (int(starts[f]), int(c_sizes[f]))
        for f in range(first_frame, first_frame + n_local)
    ]
    st = SeekTable()
    for c, d in zip(c_sizes, d_sizes):
        st.log_frame(int(c), int(d))
    return int(starts[first_frame]), plan, st


def multihost_compress(data_local: bytes, first_frame: int = 0,
                       n_total: int | None = None,
                       frame_size: int = 2 << 20, mesh=None,
                       level: int = 3):
    """SPMD entry point: compress this process's slice of a logical
    ``n_total``-byte input; every process calls this with its own slice
    (``data_local`` starts at global frame ``first_frame``).

    Each host stages only its rows, the shard_map pipeline encodes them on
    its own chips, ONLY the per-frame entry array is all-gathered (over
    DCN on a pod), and every host independently builds the identical
    SeekTable from it. Returns (local_rows, write_plan, seek_table):
    ``local_rows`` are this host's compressed frame byte strings in frame
    order and ``write_plan`` the (file_offset, size) each must land at —
    the distributed analog of the reference's ordered writer + log_frame
    (reference lib/src/encode.rs:466-467,743-775). Single-process (tests,
    one host) the same call covers the whole input with first_frame=0.
    """
    from .pipeline import parallel_compress

    if mesh is None:
        mesh = make_multihost_mesh()
    if n_total is None:
        n_total = len(data_local)
    local_rows, first_row, st = parallel_compress(
        data_local, mesh, frame_size=frame_size,
        first_frame=first_frame, n_total=n_total, gather_bytes=False,
        level=level,
    )
    start, plan, _ = host_write_plan(
        [st.frame_size_comp(i) for i in range(st.num_frames)],
        [st.frame_size_decomp(i) for i in range(st.num_frames)],
        first_row, len(local_rows),
    )
    return local_rows, plan, st
