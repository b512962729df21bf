"""Multi-host scale-out layer (parallel/multihost.py).

Single-process here (multi-process CPU collectives are unavailable in
this environment), but the code paths under test are the ones a pod
executes per process: host-major mesh construction, process frame
spans, process-local staging through parallel_compress's first_frame /
gather_bytes form, and the entry-derived write plan.
"""

import numpy as np
import pytest

from zeekstd_tpu.parallel import (
    host_write_plan,
    init_multihost,
    make_multihost_mesh,
    multihost_compress,
    process_frame_slice,
)
from zeekstd_tpu.parallel.pipeline import make_mesh, parallel_compress


def _corpus(n):
    rng = np.random.default_rng(7)
    words = [rng.bytes(rng.integers(3, 9)) for _ in range(50)]
    out = bytearray()
    while len(out) < n:
        out += words[int(rng.integers(0, 50))]
    return bytes(out[:n])


def test_init_multihost_single_process():
    assert init_multihost() == 0


def test_multihost_mesh_host_major():
    mesh = make_multihost_mesh()
    devs = list(mesh.devices.flat)
    keys = [(d.process_index, d.id) for d in devs]
    assert keys == sorted(keys)
    assert mesh.axis_names == ("data",)


def test_process_frame_slice_covers_all():
    mesh = make_multihost_mesh()
    lo, hi = process_frame_slice(16, mesh)
    # single process: owns everything
    assert (lo, hi) == (0, 16)


def test_write_plan_offsets_and_table():
    c = [10, 20, 30, 40]
    d = [100, 100, 100, 50]
    start, plan, st = host_write_plan(c, d, first_frame=2, n_local=2)
    assert start == 30
    assert plan == [(30, 30), (60, 40)]
    assert st.num_frames == 4
    assert st.frame_size_comp(3) == 40
    assert st.frame_size_decomp(3) == 50


def test_multihost_compress_matches_parallel(cpu_mesh_guard=None):
    data = _corpus(96 << 10)
    fs = 16 << 10
    mesh = make_mesh()
    blob_ref, st_ref = parallel_compress(data, mesh, frame_size=fs)

    rows, plan, st = multihost_compress(data, frame_size=fs, mesh=mesh)
    # Reassemble via the write plan: must equal the gathered blob.
    out = bytearray(sum(p[1] for p in plan))
    for row, (off, sz) in zip(rows, plan):
        assert len(row) == sz
        out[off : off + sz] = row
    assert bytes(out) == blob_ref
    assert st.to_bytes() == st_ref.to_bytes()


def test_parallel_compress_slice_contract():
    # A data slice that does not cover the process's frames must be
    # rejected (the multi-process misuse case).
    data = _corpus(64 << 10)
    mesh = make_mesh()
    with pytest.raises(ValueError):
        parallel_compress(
            data[: 16 << 10], mesh, frame_size=8 << 10,
            first_frame=0, n_total=64 << 10, gather_bytes=False,
        )


def test_gather_bytes_false_returns_local_rows():
    data = _corpus(64 << 10)
    fs = 8 << 10
    mesh = make_mesh()
    blob_ref, st_ref = parallel_compress(data, mesh, frame_size=fs)
    rows, first_row, st = parallel_compress(
        data, mesh, frame_size=fs, gather_bytes=False
    )
    assert first_row == 0
    assert b"".join(rows) == blob_ref
    assert st.to_bytes() == st_ref.to_bytes()
