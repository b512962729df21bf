"""Mesh-parallel frame pipeline: shard frames, parse/encode per chip,
gather ordered seek-table entries.

Layout: input of N bytes is cut into F frames of ``frame_size`` (the
seekable frame policy), padded to a multiple of the mesh size, and laid
out as a (F, frame_size) uint8 array sharded on the frame axis
(PartitionSpec("data", None)). Each device runs the vmapped
``parse_and_code`` kernel over its local frames; per-frame match/literal
statistics are all-gathered over the mesh so every participant can build
the ordered seek table (the analog of the reference's sequential
seek-table logging, lib/src/encode.rs:466-467, made collective).

On a single host the compressed byte assembly pulls the (already sharded)
parse results to the host; on a multi-host pod the same program runs with
a DCN-spanning mesh and assembly happens on host 0 from the gathered
arrays.
"""

from __future__ import annotations

import numpy as np

from ..constants import DEFAULT_FRAME_SIZE
from ..seek_table import SeekTable


def _jax():
    from ..jax_setup import ensure_cache

    ensure_cache()
    import jax
    import jax.numpy as jnp

    return jax, jnp


def make_mesh(devices=None, axis: str = "data"):
    """1-D device mesh over the frame axis."""
    jax, _ = _jax()
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis,))


def _frame_layout(n: int, frame_size: int, n_devices: int):
    n_frames = max(-(-n // frame_size), 1)
    padded_frames = -(-n_frames // n_devices) * n_devices
    return n_frames, padded_frames


def parallel_parse_step(mesh, frame_size: int, seq_bound: int):
    """Build the jitted, mesh-sharded parse step.

    Returns ``step(frames, lengths)`` where frames is uint8[F, frame_size]
    sharded on the frame axis; outputs are the per-frame parse results
    (sharded) plus the all-gathered per-frame matched-byte counts
    (replicated) — the collective seek-table statistic.
    """
    jax, jnp = _jax()
    from jax.sharding import PartitionSpec as P

    from ..tpu_codec import parse_and_code

    axis = mesh.axis_names[0]

    def per_device(frames, lengths):
        # frames: [local_F, frame_size]; vmap the per-frame kernel.
        results = jax.vmap(
            lambda f, l: parse_and_code(f, l, seq_bound)
        )(frames, lengths)
        lls, mls, ovs, n_seq, lits, n_lit, llc, mlc, ofc, n_seq_raw = results
        # Collective: ordered all-gather of per-frame stats so every
        # participant can derive identical seek-table entries.
        matched = jnp.sum(mls, axis=1)
        gathered = jax.lax.all_gather(matched, axis, tiled=True)
        return lls, mls, ovs, n_seq, lits, n_lit, llc, mlc, ofc, n_seq_raw, gathered

    spec_in = (P(axis, None), P(axis))
    spec_out = (
        P(axis, None), P(axis, None), P(axis, None), P(axis),
        P(axis, None), P(axis),
        P(axis, None), P(axis, None), P(axis, None), P(axis),
        P(None),
    )
    fn = jax.shard_map(
        per_device, mesh=mesh, in_specs=spec_in, out_specs=spec_out,
        check_vma=False,
    )
    return jax.jit(fn)


def parallel_compress(
    data: bytes,
    mesh=None,
    frame_size: int = DEFAULT_FRAME_SIZE,
    checksum: bool = False,
):
    """Data-parallel seekable compression: returns (archive_frames_bytes,
    SeekTable). Frames are compressed independently per chip and
    concatenated in order; append ``seek_table.to_bytes()`` for a Foot
    archive."""
    jax, jnp = _jax()
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..tpu_codec import assemble_frame

    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    n = len(data)
    n_frames, padded_frames = _frame_layout(n, frame_size, n_dev)

    frames = np.zeros((padded_frames, frame_size), np.uint8)
    lengths = np.zeros(padded_frames, np.int32)
    for i in range(n_frames):
        chunk = data[i * frame_size : (i + 1) * frame_size]
        frames[i, : len(chunk)] = np.frombuffer(chunk, np.uint8)
        lengths[i] = len(chunk)

    seq_bound = min(1 << 18, max(2048, frame_size // 8))
    step = parallel_parse_step(mesh, frame_size, seq_bound)

    axis = mesh.axis_names[0]
    sh = NamedSharding(mesh, P(axis, None))
    sh1 = NamedSharding(mesh, P(axis))
    frames_d = jax.device_put(jnp.asarray(frames), sh)
    lengths_d = jax.device_put(jnp.asarray(lengths), sh1)

    out = step(frames_d, lengths_d)
    (lls, mls, ovs, n_seq, lits, n_lit, llc, mlc, ofc, n_seq_raw, gathered) = out
    n_seq_raw = np.asarray(n_seq_raw)

    # Ordered assembly on the host (frame order == shard order).
    st = SeekTable()
    blob = bytearray()
    for i in range(n_frames):
        fdata = bytes(frames[i, : lengths[i]])
        if int(n_seq_raw[i]) > seq_bound:
            # Overflowed parse: host fallback keeps output correct.
            from ..codec.compress import compress_frame

            fbytes = compress_frame(fdata, level=1, checksum=checksum)
        else:
            res = (
                lls[i], mls[i], ovs[i], n_seq[i], lits[i], n_lit[i],
                llc[i], mlc[i], ofc[i],
            )
            fbytes = assemble_frame(fdata, res, checksum)
        st.log_frame(len(fbytes), len(fdata))
        blob += fbytes
    return bytes(blob), st


def parallel_decompress(archive: bytes, seek_table: SeekTable, mesh=None):
    """Data-parallel frame decode: all frames' entropy streams and sequence
    executions batch into three device dispatches (tpu_archive's batched
    decoder); frame independence is what makes the batch dimension free."""
    from ..tpu_archive import tpu_decompress_archive

    return tpu_decompress_archive(archive, seek_table)


def route_queries(seek_table: SeekTable, queries, mesh=None):
    """Map random-access queries to owning frames/chips (reference analog:
    frame_index binary search, lib/src/seek_table.rs:916-934, distributed).

    ``queries``: int array of decompressed byte offsets. Returns
    (frame_indices, owner_devices) — the frame containing each offset and
    the mesh position holding that frame under the round-robin frame
    sharding used by ``parallel_compress``.
    """
    jax, jnp = _jax()
    import numpy as np

    c_off, d_off = seek_table.cumulative_offsets()
    d = jnp.asarray(d_off.astype(np.int64))
    q = jnp.asarray(np.asarray(queries, dtype=np.int64))
    idx = jnp.clip(
        jnp.searchsorted(d, q, side="right") - 1, 0, seek_table.num_frames - 1
    )
    n_dev = mesh.devices.size if mesh is not None else 1
    frames_per_dev = -(-seek_table.num_frames // max(n_dev, 1))
    owners = idx // max(frames_per_dev, 1)
    return np.asarray(idx), np.asarray(owners)


def parallel_random_access(archive: bytes, seek_table: SeekTable, ranges, mesh=None):
    """Serve (offset, limit) random-access queries: route each to its
    frame(s), decode only those frames, slice the results."""
    from ..tpu_codec import tpu_decompress_frame

    results = []
    cache = {}
    for lo, hi in ranges:
        out = []
        pos = lo
        while pos < hi:
            idx = seek_table.frame_index_decomp(pos)
            if idx not in cache:
                start = seek_table.frame_start_comp(idx)
                end = seek_table.frame_end_comp(idx)
                cache[idx], _ = tpu_decompress_frame(archive[start:end])
            f_start = seek_table.frame_start_decomp(idx)
            f_end = seek_table.frame_end_decomp(idx)
            take = min(hi, f_end) - pos
            out.append(cache[idx][pos - f_start : pos - f_start + take])
            pos += take
        results.append(b"".join(out))
    return results
