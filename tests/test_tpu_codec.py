"""End-to-end TPU codec: device-pipeline frames must interoperate with
libzstd and the host codec in both directions."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from zeekstd_tpu.codec import compress_frame, decompress_frame
from zeekstd_tpu.tpu_codec import tpu_compress_frame, tpu_decompress_frame

from .oracle import zstd_compress, zstd_decompress
from .test_decompress import random_data, structured_data, text_data

CASES = [
    ("text", text_data(60_000)),
    ("struct", structured_data(80_000)),
    ("random", random_data(20_000)),
    ("zeros", b"\x00" * 50_000),
    ("periodic", (b"0123456789abcdef" * 5000)[:70_000]),
    ("tiny", b"hello"),
    ("multiblock", structured_data(300_000)),
]


@pytest.mark.parametrize("name,data", CASES, ids=[c[0] for c in CASES])
def test_tpu_compress_interop(name, data):
    frame = tpu_compress_frame(data, checksum=True)
    assert zstd_decompress(frame) == data
    out, end = decompress_frame(frame)
    assert out == data and end == len(frame)


@pytest.mark.parametrize("name,data", CASES, ids=[c[0] for c in CASES])
def test_tpu_decompress_libzstd_frames(name, data):
    for level in (1, 3):
        frame = zstd_compress(data, level=level, checksum=True)
        out, end = tpu_decompress_frame(frame)
        assert out == data
        assert end == len(frame)


@pytest.mark.parametrize("name,data", CASES, ids=[c[0] for c in CASES])
def test_tpu_decompress_host_frames(name, data):
    frame = compress_frame(data, level=3, checksum=True)
    out, _ = tpu_decompress_frame(frame)
    assert out == data


def test_tpu_full_cycle():
    data = structured_data(150_000)
    frame = tpu_compress_frame(data, checksum=True)
    out, _ = tpu_decompress_frame(frame)
    assert out == data


def test_tpu_decompress_high_level_many_blocks():
    # Level 19 exercises FSE_Compressed tables, treeless literals and
    # cross-block repeat offsets.
    data = text_data(400_000)
    frame = zstd_compress(data, level=19, checksum=True)
    out, _ = tpu_decompress_frame(frame)
    assert out == data


def test_compression_ratio_vs_libzstd_l1():
    data = text_data(120_000)
    ours = len(tpu_compress_frame(data))
    ref = len(zstd_compress(data, level=1))
    assert ours <= ref * 1.05


def test_batched_archive_encoder():
    # Archive-level batched pipeline: 3 device dispatches, full interop.
    from zeekstd_tpu import BytesWrapper, DecodeOptions
    from zeekstd_tpu.tpu_archive import tpu_compress_archive

    data = structured_data(250_000)
    blob, st = tpu_compress_archive(data, frame_size=65_536, checksum=True)
    assert st.num_frames == -(-len(data) // 65_536)
    assert st.size_comp == len(blob)
    assert zstd_decompress(blob) == data
    dec = DecodeOptions(BytesWrapper(blob + st.to_bytes())).into_decoder()
    assert dec.read(-1) == data


def test_tpu_archive_decode_roundtrip():
    # Batched archive decode vs both encoders, multi-frame, with RLE/raw
    # block shapes mixed in.
    import random

    from zeekstd_tpu.native.loader import compress_stream_mt
    from zeekstd_tpu.seek_table import SeekTable
    from zeekstd_tpu.tpu_archive import tpu_compress_archive, tpu_decompress_archive

    rng = random.Random(3)
    base = b"seekable zstandard frames decode independently " * 800
    data = (
        base[:30000]
        + bytes(rng.randrange(256) for _ in range(8000))
        + b"\x00" * 5000
        + base[:20000]
    )
    blob, st = tpu_compress_archive(data, frame_size=1 << 15)
    assert tpu_decompress_archive(blob, st) == data

    blob2, sizes = compress_stream_mt(data, 1 << 15, checksum=True, nthreads=2, level=3)
    st2 = SeekTable()
    for i, c in enumerate(sizes):
        st2.log_frame(c, min(1 << 15, len(data) - i * (1 << 15)))
    assert tpu_decompress_archive(blob2, st2) == data
    # Walking mode skips the appended seek-table skippable frame.
    assert tpu_decompress_archive(blob2 + st2.to_bytes()) == data


def test_tpu_archive_decode_checksum_error():
    import pytest as _pytest

    from zeekstd_tpu.errors import ZeekstdError
    from zeekstd_tpu.native.loader import compress_stream_mt
    from zeekstd_tpu.seek_table import SeekTable
    from zeekstd_tpu.tpu_archive import tpu_decompress_archive

    data = b"checksum guarded content " * 2000
    blob, sizes = compress_stream_mt(data, 1 << 14, checksum=True, nthreads=1, level=1)
    st = SeekTable()
    for i, c in enumerate(sizes):
        st.log_frame(c, min(1 << 14, len(data) - i * (1 << 14)))
    bad = bytearray(blob)
    bad[len(bad) // 2] ^= 0x10
    with _pytest.raises(ZeekstdError):
        tpu_decompress_archive(bytes(bad), st)


def test_tpu_archive_decode_escalates_shallow_doublings(monkeypatch):
    # With the primary program forced to depth 0, every match-bearing frame
    # is unconverged after the shallow pass; the decoder must escalate to
    # the full-depth program and still produce exact bytes (no host
    # fallback, no error).
    import zeekstd_tpu.tpu_archive as ta

    data = text_data(200_000)
    blob, st = ta.tpu_compress_archive(data, frame_size=64 << 10)
    monkeypatch.setattr(ta, "FAST_DOUBLINGS", 0)
    out = ta.tpu_decompress_archive(blob, st)
    assert out == data


def test_plan_block_demotion_guards_treeless_and_repeat():
    # A treeless literal block or Repeat_Mode FSE table whose defining
    # block was demoted to raw must itself demote to a raw block rather
    # than emit a dangling reference (silent corruption).
    import numpy as np

    import zeekstd_tpu.tpu_archive as ta
    from zeekstd_tpu.codec import sequences as seq_mod
    from zeekstd_tpu.codec.seq_encode import _choose_table

    class SpyPlan:
        def __init__(self):
            self.events = []

        def add_static(self, f, b):
            self.events.append(("static", bytes(b)))

        def add_huf(self, f, sj, n):
            self.events.append(("huf", sj, n))

        def add_fse(self, f, j, n):
            self.events.append(("fse", j, n))

        def add_raw(self, f, src_f, off, n):
            self.events.append(("raw", off, n))

        def add_lits(self, f, src_f, off, n):
            self.events.append(("lits", off, n))

    hist = np.zeros(36, np.int64)
    hist[0] = 50
    hist[2] = 30
    mode, tbl, desc, _ = _choose_table(
        None, "ll", seq_mod.LL_DEFAULT_NORM, seq_mod.LL_DEFAULT_LOG, 35, 9,
        hist=hist,
    )
    tables = {"ll": (mode, tbl, desc), "of": (mode, tbl, desc), "ml": (mode, tbl, desc)}

    fdata = bytes(range(256)) * 256  # incompressible-ish raw fallback data
    fse_bits = [8]
    huf_bits = [8, 8, 8, 8]

    # Block 1 claims treeless + Repeat_Mode tables defined by a block that
    # never emitted (emit_state fresh == everything demoted).
    d1 = {
        "frame": 0, "block": 1, "len": 4096, "nseq": 3, "nlit": 256,
        "lit_lo": 0, "lit_mode": "huf", "treeless": True, "tree": b"",
        "tree_id": 7, "huf_streams": [0, 1, 2, 3], "fse_job": 0,
        "tables": {
            "ll": (seq_mod.MODE_REPEAT, tbl, b""),
            "of": (seq_mod.MODE_REPEAT, tbl, b""),
            "ml": (seq_mod.MODE_REPEAT, tbl, b""),
        },
        "tbl_id": {"ll": 3, "of": 4, "ml": 5},
        "dep_tbl_id": {"ll": 3, "of": 4, "ml": 5},
    }
    plan = SpyPlan()
    state = {"tree_id": None, "fse_ids": {}}
    ta._plan_block(plan, d1, 0, 1, True, fdata, fse_bits, huf_bits, state)
    kinds = [e[0] for e in plan.events]
    # Must fall back to a raw (or RLE) block: no huf/fse segments emitted.
    assert "huf" not in kinds and "fse" not in kinds, plan.events
    assert any(k in ("raw", "static") for k in kinds)


def test_streaming_encoder_tpu_backend():
    # The "tpu" backend routes the streaming layer through the batched
    # archive pipeline: frames cut per the policy, seek table logged,
    # archive interchangeable with every other backend's decoder.
    import io

    from zeekstd_tpu import (
        BytesWrapper,
        DecodeOptions,
        EncodeOptions,
        FrameSizePolicy,
    )

    data = text_data(300_000)
    buf = io.BytesIO()
    enc = (
        EncodeOptions()
        .with_backend("tpu")
        .with_frame_size_policy(FrameSizePolicy.uncompressed(65_536))
        .into_encoder(buf)
    )
    # stream in uneven chunks
    for i in range(0, len(data), 50_000):
        enc.write(data[i : i + 50_000])
    enc.finish()
    archive = buf.getvalue()

    for backend in ("python", "native", "tpu"):
        dec = (
            DecodeOptions(BytesWrapper(archive)).with_backend(backend).into_decoder()
        )
        assert dec.read(-1) == data, backend
    st_dec = DecodeOptions(BytesWrapper(archive)).into_decoder()
    assert st_dec.seek_table().num_frames == -(-len(data) // 65_536)
    # oracle: libzstd decodes the frames
    from .oracle import zstd_decompress

    st = st_dec.seek_table()
    blob_end = st.frame_end_comp(st.num_frames - 1)
    assert zstd_decompress(archive[:blob_end]) == data
