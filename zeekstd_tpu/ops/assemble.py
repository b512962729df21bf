"""Device-side archive byte assembly.

The encode pipeline's entropy streams are produced on device as padded
uint32 word arrays. Round 1 pulled those padded arrays to the host and
assembled frame bytes there — through this machine's slow device->host
path that pull dominated the whole pipeline. Here the final archive bytes
are assembled ON DEVICE with one gather:

  1. ``finalize_streams`` turns each job's (words, total_bits) into a
     byte image with the backward-bitstream sentinel applied (the device
     twin of ``ops.bitpack.words_to_stream``).
  2. The host — which knows every section length exactly once the per-job
     bit counts (a few KB) are pulled — lays out an index map: for every
     output byte of every frame, the source byte in a virtual concatenation
     of five pools (host static bytes | FSE stream bytes | Huffman stream
     bytes | literal stream | raw frame data).
  3. ``assemble_archive`` gathers through the map, producing the padded
     per-frame compressed byte matrix. Only that compact matrix (or its
     all_gather across a mesh) ever leaves the device.

This keeps every frame's compressed size host-known *before* assembly, so
seek-table entries need no device round trip, and the sharded pipeline can
all_gather (entries, frame bytes) as fixed-shape arrays.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def finalize_streams(words, bits):
    """[J, W] uint32 words + [J] total bits -> [J, W*4] uint8 byte images,
    zero-padded past the stream end, with the sentinel bit applied at
    ``bits`` (so bytes 0..bits//8 are the exact backward-stream bytes)."""
    J, W = words.shape
    words = words.astype(jnp.uint32)
    shifts = jnp.asarray([0, 8, 16, 24], jnp.uint32)
    b = (words[:, :, None] >> shifts[None, None, :]) & jnp.uint32(0xFF)
    b = b.reshape(J, W * 4).astype(jnp.uint8)
    pos = jnp.arange(W * 4, dtype=jnp.int32)[None, :]
    sent_byte = (bits[:, None] >> 3).astype(jnp.int32)
    sent_bit = (bits[:, None] & 7).astype(jnp.uint32)
    b = jnp.where(pos > sent_byte, jnp.uint8(0), b)
    b = jnp.where(
        pos == sent_byte, b | (jnp.uint32(1) << sent_bit).astype(jnp.uint8), b
    )
    return b


def assemble_archive(idx_map, static_pool, fse_bytes, huf_bytes, lits, frames):
    """Gather the final archive bytes: ``idx_map`` [F, frame_bound] int32
    indexes the virtual concatenation of the five flattened pools (index 0
    must point at a zero byte in static_pool for padding)."""
    flat = jnp.concatenate(
        [
            static_pool.reshape(-1),
            fse_bytes.reshape(-1),
            huf_bytes.reshape(-1),
            lits.reshape(-1),
            frames.reshape(-1),
        ]
    )
    return flat[idx_map]


def build_asm_map(seg_dest, seg_base, nval, size: int):
    """Dense per-frame index maps from run segments on device.

    ``seg_dest``/``seg_base`` are int32[F, SEGS]: segment k of frame f
    writes pool bytes ``seg_base[f,k] + i`` at output offsets
    ``seg_dest[f,k] + i``. Padding slots carry ``dest >= size`` so they
    never contribute. Output position j belongs to the rightmost segment
    whose dest <= j (scatter-add + cumsum — the formulation that compiles
    fast on TPU; see tpu_archive._dec_exec_fn.build_map); positions at or
    past ``nval[f]`` map to 0 (the static pool's reserved zero byte).

    Uploading these runs costs KBs where the dense [F, frame_bound] map
    costs 4 bytes per output byte — ~40 MB per 10 MiB archive through a
    latency/bandwidth-bound host->device link (measured: the dense upload
    made dispatch 4 the slowest encode stage).
    """

    def one(d, b, nv):
        counts = jnp.zeros(size, jnp.int32).at[d].add(1, mode="drop")
        seg = jnp.clip(jnp.cumsum(counts) - 1, 0, d.shape[0] - 1)
        j = jnp.arange(size, dtype=jnp.int32)
        m = b[seg] + (j - d[seg])
        return jnp.where(j < nv, m, 0)

    return jax.vmap(one)(seg_dest, seg_base, nval)


def assemble_archive_runs(
    seg_dest, seg_base, c_sizes, frame_bound: int,
    static_pool, fse_bytes, huf_bytes, lits, frames,
):
    """``assemble_archive`` with the index map built on device from run
    segments (the encode twin of the decode pipeline's segment maps)."""
    idx_map = build_asm_map(seg_dest, seg_base, c_sizes, frame_bound)
    return assemble_archive(idx_map, static_pool, fse_bytes, huf_bytes, lits, frames)


class SegmentPlan:
    """Host-side index-map builder over the five-pool virtual layout.

    Pool order and sizes fix the virtual offsets; ``add_*`` appends one
    segment of a frame's output bytes. Static bytes accumulate in
    ``static_blob`` (index 0 reserved as the padding zero byte).
    """

    def __init__(self, n_frames: int, fse_shape, huf_shape, lits_shape, frames_shape):
        self.F = n_frames
        self.fse_shape = fse_shape
        self.huf_shape = huf_shape
        self.lits_shape = lits_shape
        self.frames_shape = frames_shape
        self.static_blob = bytearray(b"\x00")  # [0] = padding byte
        self.segments = [[] for _ in range(n_frames)]  # (virt_base, length)

    # virtual base offsets of each pool (computed when static size is final)
    def _bases(self, static_size: int):
        b0 = 0
        b1 = b0 + static_size
        b2 = b1 + int(np.prod(self.fse_shape))
        b3 = b2 + int(np.prod(self.huf_shape))
        b4 = b3 + int(np.prod(self.lits_shape))
        return b0, b1, b2, b3, b4

    def add_static(self, f: int, data: bytes):
        if not data:
            return
        self.segments[f].append(("s", len(self.static_blob), len(data)))
        self.static_blob += data

    def add_fse(self, f: int, job: int, length: int):
        self.segments[f].append(("f", job * self.fse_shape[1], length))

    def add_huf(self, f: int, job: int, length: int):
        self.segments[f].append(("h", job * self.huf_shape[1], length))

    def add_lits(self, f: int, frame: int, start: int, length: int):
        self.segments[f].append(("l", frame * self.lits_shape[1] + start, length))

    def add_raw(self, f: int, frame: int, start: int, length: int):
        self.segments[f].append(("r", frame * self.frames_shape[1] + start, length))

    def frame_size(self, f: int) -> int:
        return sum(s[2] for s in self.segments[f])

    def build(self, frame_bound: int | None = None):
        """Returns (idx_map int32[F, frame_bound], static_pool uint8[S],
        c_sizes int64[F]). frame_bound and the static pool are padded to
        powers of two so the jitted assembler sees few distinct shapes."""
        c_sizes = np.asarray([self.frame_size(f) for f in range(self.F)], np.int64)
        if frame_bound is None:
            frame_bound = max(int(c_sizes.max()) if self.F else 1, 1)
            frame_bound = 1 << max((frame_bound - 1).bit_length(), 7)
        s_pad = 1 << max((len(self.static_blob) - 1).bit_length(), 8)
        static = np.zeros(s_pad, np.uint8)
        static[: len(self.static_blob)] = np.frombuffer(
            bytes(self.static_blob), np.uint8
        )
        b0, b1, b2, b3, b4 = self._bases(len(static))
        base_of = {"s": b0, "f": b1, "h": b2, "l": b3, "r": b4}
        idx_map = np.zeros((self.F, frame_bound), np.int32)
        for f in range(self.F):
            off = 0
            for kind, src, length in self.segments[f]:
                idx_map[f, off : off + length] = base_of[kind] + np.arange(
                    src, src + length, dtype=np.int32
                )
                off += length
        return idx_map, static, c_sizes

    def build_runs(self, segs_bound: int | None = None, static_bound: int | None = None):
        """Run-segment form of ``build``: returns (seg_dest int32[F, SEGS],
        seg_base int32[F, SEGS], static_pool uint8[S], c_sizes int64[F]).

        The dense index map is built ON DEVICE from these runs
        (``build_asm_map``) — the host ships kilobytes of segment triples
        instead of a 4-bytes-per-output-byte dense map. ``static_bound``
        pads the static pool BEFORE pool bases are computed, so sharded
        callers can agree on one shape without rebuilding maps.
        """
        c_sizes = np.asarray([self.frame_size(f) for f in range(self.F)], np.int64)
        s_pad = 1 << max((len(self.static_blob) - 1).bit_length(), 8)
        if static_bound is not None:
            if static_bound < s_pad:
                raise ValueError("static_bound below the pool size")
            s_pad = static_bound
        static = np.zeros(s_pad, np.uint8)
        static[: len(self.static_blob)] = np.frombuffer(
            bytes(self.static_blob), np.uint8
        )
        b0, b1, b2, b3, b4 = self._bases(len(static))
        base_of = {"s": b0, "f": b1, "h": b2, "l": b3, "r": b4}
        nseg = max((len(s) for s in self.segments), default=1)
        SEGS = 1 << max((max(nseg, 1) - 1).bit_length(), 2)
        if segs_bound is not None:
            if segs_bound < SEGS:
                raise ValueError("segs_bound below the segment count")
            SEGS = segs_bound
        # Padding slots: dest = INT32_MAX/2 never contributes a count within
        # any frame_bound; first real segment of every frame is at dest 0.
        seg_dest = np.full((self.F, SEGS), 1 << 30, np.int32)
        seg_base = np.zeros((self.F, SEGS), np.int32)
        for f in range(self.F):
            off = 0
            k = 0
            for kind, src, length in self.segments[f]:
                if length == 0:
                    continue
                seg_dest[f, k] = off
                seg_base[f, k] = base_of[kind] + src
                off += length
                k += 1
        return seg_dest, seg_base, static, c_sizes
