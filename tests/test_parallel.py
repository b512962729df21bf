"""Mesh-parallel pipeline: multi-device equivalence with the single-chip
path on the virtual 8-device CPU mesh (the reference's BytesWrapper-style
simulate-before-real-hardware strategy, SURVEY §4)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from zeekstd_tpu import BytesWrapper, DecodeOptions
from zeekstd_tpu.parallel import make_mesh, parallel_compress, parallel_decompress

from .oracle import zstd_decompress
from .test_decompress import structured_data, text_data


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_parallel_compress_roundtrip():
    data = structured_data(200_000)
    mesh = make_mesh()
    blob, st = parallel_compress(data, mesh, frame_size=32_768)
    assert st.num_frames == -(-len(data) // 32_768)
    assert st.size_decomp == len(data)
    assert st.size_comp == len(blob)
    # Every frame independently valid for libzstd.
    assert zstd_decompress(blob) == data
    # The archive + appended table is a normal seekable archive.
    archive = blob + st.to_bytes()
    dec = DecodeOptions(BytesWrapper(archive)).into_decoder()
    assert dec.read(-1) == data


def test_parallel_decompress_matches():
    data = text_data(150_000)
    mesh = make_mesh()
    blob, st = parallel_compress(data, mesh, frame_size=16_384, checksum=True)
    out = parallel_decompress(blob, st, mesh)
    assert out == data


def test_parallel_equals_serial_frames():
    # Sharded compression must produce the same archive bytes and seek
    # table as the single-device batched pipeline (determinism across
    # shardings).
    from zeekstd_tpu.tpu_archive import tpu_compress_archive

    data = structured_data(100_000)
    mesh = make_mesh()
    blob, st = parallel_compress(data, mesh, frame_size=32_768)
    blob1, st1 = tpu_compress_archive(data, frame_size=32_768)
    assert blob == blob1
    assert st.to_bytes() == st1.to_bytes()


@pytest.mark.parametrize("level", [1, 3, 9])
def test_parallel_honors_level(level):
    # ``parallel_compress(data, level=L)`` must byte-match
    # ``tpu_compress_archive(data, level=L)`` — the level has to reach the
    # sharded parse (a silently defaulted level-3 parse would diverge at
    # L=1 and L=9).
    from zeekstd_tpu.tpu_archive import tpu_compress_archive

    data = text_data(120_000)
    mesh = make_mesh()
    blob, st = parallel_compress(data, mesh, frame_size=32_768, level=level)
    blob1, st1 = tpu_compress_archive(data, frame_size=32_768, level=level)
    assert blob == blob1
    assert st.to_bytes() == st1.to_bytes()
    assert zstd_decompress(blob) == data


def test_seek_table_built_from_gathered_entries():
    # The SeekTable must be derived from the all-gathered entry array, so
    # its entries must agree with the actual zstd frame boundaries found
    # by walking the archive bytes (not with any host-side bookkeeping).
    from zeekstd_tpu.codec.frame import parse_frame_header

    data = structured_data(120_000)
    mesh = make_mesh()
    blob, st = parallel_compress(data, mesh, frame_size=16_384)
    assert st.num_frames == -(-len(data) // 16_384)
    pos = 0
    for i in range(st.num_frames):
        assert st.frame_start_comp(i) == pos, f"frame {i} start"
        hdr = parse_frame_header(blob[pos:])
        assert hdr.content_size == st.frame_size_decomp(i)
        pos = st.frame_end_comp(i)
    assert pos == len(blob)


def test_single_device_mesh():
    data = text_data(40_000)
    mesh = make_mesh(jax.devices()[:1])
    blob, st = parallel_compress(data, mesh, frame_size=8192)
    assert zstd_decompress(blob) == data


def test_query_routing():
    # Random-access routing: offsets -> owning frames/devices
    # (reference analog: lib/src/seek_table.rs:916-934, distributed).
    from zeekstd_tpu.parallel.pipeline import parallel_random_access, route_queries

    data = text_data(100_000)
    mesh = make_mesh()
    blob, st = parallel_compress(data, mesh, frame_size=16_384)
    frames, owners = route_queries(st, [0, 16_384, 40_000, 99_999], mesh)
    assert list(frames) == [0, 1, 2, 6]
    assert all(0 <= o < 8 for o in owners)
    results = parallel_random_access(
        blob, st, [(5000, 9000), (30_000, 70_000)], mesh
    )
    assert results[0] == data[5000:9000]
    assert results[1] == data[30_000:70_000]


def test_mesh_fused_kernel_path_roundtrip(monkeypatch):
    """The mesh decode's kernel path (ZEEKSTD_TPU_MESH_EXEC=fused — the
    TPU default) dispatches the SAME fused serial kernels as the
    single-chip decoder, sharded per device, and round-trips our own
    archives bit-exactly (checksums verified host-side)."""
    monkeypatch.setenv("ZEEKSTD_TPU_MESH_EXEC", "fused")
    data = text_data(120_000)
    mesh = make_mesh()
    blob, st = parallel_compress(data, mesh, frame_size=16_384, checksum=True)
    from zeekstd_tpu.parallel.pipeline import DECODE_FALLBACKS

    before = DECODE_FALLBACKS["frames"]
    out = parallel_decompress(blob, st, mesh)
    assert out == data
    assert DECODE_FALLBACKS["frames"] == before


@pytest.mark.parametrize("level", [1, 3, 9])
def test_mesh_fused_foreign_zero_fallbacks(monkeypatch, level):
    """libzstd-written archives decode through the mesh kernel path with
    ZERO fallbacks: the fused kernel resolves repeat offsets exactly
    in-order, so cross-block rep history (which forced the doubling
    path's redo pass) needs no special handling (round-4 verdict #5)."""
    from .oracle import zstd_compress
    from zeekstd_tpu.parallel.pipeline import DECODE_FALLBACKS
    from zeekstd_tpu.seek_table import SeekTable

    monkeypatch.setenv("ZEEKSTD_TPU_MESH_EXEC", "fused")
    data = text_data(90_000) + structured_data(60_000)
    fsize = 24_000
    frames = []
    for i in range(0, len(data), fsize):
        frames.append(zstd_compress(data[i : i + fsize], level=level))
    blob = b"".join(frames)
    st = SeekTable.from_frames(
        (len(f), min(fsize, len(data) - i * fsize))
        for i, f in enumerate(frames)
    )
    mesh = make_mesh()
    before = DECODE_FALLBACKS["frames"]
    out = parallel_decompress(blob, st, mesh)
    assert out == data
    assert DECODE_FALLBACKS["frames"] == before, "foreign frames fell back"


def test_mesh_fused_random_access(monkeypatch):
    """frame_ids subsets route through the kernel path too."""
    monkeypatch.setenv("ZEEKSTD_TPU_MESH_EXEC", "fused")
    data = structured_data(100_000)
    mesh = make_mesh()
    blob, st = parallel_compress(data, mesh, frame_size=16_384)
    got = parallel_decompress(blob, st, mesh, frame_ids=[1, 4])
    assert got[1] == data[16_384 * 1 : 16_384 * 2]
    assert got[4] == data[16_384 * 4 : 16_384 * 5]


def test_mesh_kernel_encode_equals_serial(monkeypatch):
    """ZEEKSTD_TPU_MATCH=kernel (the TPU default at level 1): mesh encode
    dispatches the SAME serial match + FSE kernels as single-chip
    tpu_compress_archive, per device — and produces the byte-identical
    archive (per-frame kernel output is independent of other frames:
    hash-table entries are frame-tagged, host table decisions chain per
    frame). Round-4 verdict #5: mesh encode on the kernels."""
    monkeypatch.setenv("ZEEKSTD_TPU_MATCH", "kernel")
    from zeekstd_tpu.tpu_archive import tpu_compress_archive

    data = text_data(300_000) + structured_data(100_000)
    fsize = 128 << 10
    mesh = make_mesh()
    blob_p, st_p = parallel_compress(data, mesh, frame_size=fsize, level=1)
    blob_s, st_s = tpu_compress_archive(data, frame_size=fsize, level=1)
    assert blob_p == blob_s
    assert [st_p.frame_size_comp(i) for i in range(st_p.num_frames)] == [
        st_s.frame_size_comp(i) for i in range(st_s.num_frames)
    ]
    # And the libzstd oracle decodes the mesh-kernel archive bit-exactly.
    assert zstd_decompress(blob_p) == data


def test_mesh_kernel_encode_fused_decode_cycle(monkeypatch):
    """Full kernel cycle on the mesh: kernel-parse encode, ring/fused
    kernel decode, checksums on."""
    monkeypatch.setenv("ZEEKSTD_TPU_MATCH", "kernel")
    monkeypatch.setenv("ZEEKSTD_TPU_MESH_EXEC", "fused")
    data = structured_data(250_000)
    mesh = make_mesh()
    blob, st = parallel_compress(
        data, mesh, frame_size=64 << 10, level=1, checksum=True
    )
    out = parallel_decompress(blob, st, mesh)
    assert out == data
