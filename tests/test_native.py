"""Native C++ runtime codec: oracle tests mirroring the Python codec's
(libzstd compat both directions, patch mode, checksums, MT streams) plus
cross-backend equivalence through the streaming layer."""

import io

import pytest

from zeekstd_tpu.native import loader

from .oracle import zstd_compress, zstd_decompress
from .test_decompress import random_data, structured_data, text_data

pytestmark = pytest.mark.skipif(
    not loader.available(), reason="native runtime not buildable"
)

CASES = [
    ("text", text_data(100_000)),
    ("struct", structured_data(100_000)),
    ("random", random_data(30_000)),
    ("zeros", b"\x00" * 80_000),
    ("periodic", (b"0123456789abcdef" * 5000)[:70_000]),
    ("tiny", b"x"),
    ("empty", b""),
    ("multiblock", structured_data(300_000)),
]


def test_xxh64_matches_python():
    from zeekstd_tpu.xxhash64 import XXH64

    for data in (b"", b"abc", bytes(range(256)) * 100):
        h = XXH64(7)
        h.update(data)
        assert loader.xxh64(data, 7) == h.digest()


@pytest.mark.parametrize("name,data", CASES, ids=[c[0] for c in CASES])
def test_native_frames_interop(name, data):
    frame = loader.compress_frame(data, checksum=True)
    assert zstd_decompress(frame) == data
    out, consumed = loader.decompress_frame(frame, len(data) + 64)
    assert out == data and consumed == len(frame)
    # Python decoder reads native frames too.
    from zeekstd_tpu.codec import decompress_frame

    assert decompress_frame(frame)[0] == data


@pytest.mark.parametrize("name,data", CASES, ids=[c[0] for c in CASES])
@pytest.mark.parametrize("level", [1, 3, 19])
def test_native_decodes_libzstd(name, data, level):
    frame = zstd_compress(data, level=level, checksum=True)
    out, consumed = loader.decompress_frame(frame, len(data) + 64)
    assert out == data
    assert consumed == len(frame)


def test_native_decodes_python_frames():
    from zeekstd_tpu.codec import compress_frame

    data = structured_data(150_000)
    for level in (1, 3, 9):
        frame = compress_frame(data, level=level, checksum=True)
        out, _ = loader.decompress_frame(frame, len(data) + 64)
        assert out == data


def test_patch_mode():
    old = random_data(40_000, seed=5)
    new = old[:15_000] + b"native patch" + old[15_000:]
    frame = loader.compress_frame(new, prefix=old)
    assert len(frame) < 200
    assert zstd_decompress(frame, prefix=old) == new
    out, _ = loader.decompress_frame(frame, len(new) + 64, prefix=old)
    assert out == new


def test_checksum_detection():
    data = text_data(5000)
    frame = bytearray(loader.compress_frame(data, checksum=True))
    frame[-1] ^= 0xFF
    with pytest.raises(RuntimeError, match="checksum"):
        loader.decompress_frame(bytes(frame), len(data) + 64)


def test_truncation_graceful():
    data = structured_data(20_000)
    frame = loader.compress_frame(data)
    for cut in (5, len(frame) // 3, len(frame) - 2):
        with pytest.raises(RuntimeError):
            loader.decompress_frame(frame[:cut], len(data) + 64)


def test_mt_stream_roundtrip():
    from zeekstd_tpu.seek_table import SeekTable

    data = structured_data(300_000)
    blob, sizes = loader.compress_stream_mt(data, 65_536, checksum=True, nthreads=4)
    assert sum(sizes) == len(blob)
    st = SeekTable.from_frames(
        (c, min(65_536, len(data) - i * 65_536)) for i, c in enumerate(sizes)
    )
    assert zstd_decompress(blob) == data
    c_off, d_off = st.cumulative_offsets()
    out = loader.decompress_stream_mt(
        blob, list(map(int, c_off)), list(map(int, d_off)), nthreads=4
    )
    assert out == data


def test_streaming_layer_backend_equivalence():
    # The writer-backed Encoder must produce valid archives on both
    # backends; decoding must agree regardless of backend.
    from zeekstd_tpu import BytesWrapper, DecodeOptions, EncodeOptions, Encoder, FrameSizePolicy

    data = structured_data(120_000)
    archives = {}
    for backend in ("python", "native"):
        out = io.BytesIO()
        opts = (
            EncodeOptions()
            .with_backend(backend)
            .with_frame_size_policy(FrameSizePolicy.uncompressed(32_768))
        )
        enc = Encoder(opts, out)
        enc.compress(data)
        enc.finish()
        archives[backend] = out.getvalue()

    for backend, blob in archives.items():
        for dec_backend in ("python", "native"):
            dec = (
                DecodeOptions(BytesWrapper(blob))
                .with_backend(dec_backend)
                .into_decoder()
            )
            assert dec.read(-1) == data, (backend, dec_backend)


def test_native_random_access_through_decoder():
    from zeekstd_tpu import BytesWrapper, DecodeOptions, EncodeOptions, Encoder, FrameSizePolicy

    data = text_data(100_000)
    out = io.BytesIO()
    opts = (
        EncodeOptions()
        .with_backend("native")
        .with_frame_size_policy(FrameSizePolicy.uncompressed(16_384))
    )
    enc = Encoder(opts, out)
    enc.compress(data)
    enc.finish()
    dec = (
        DecodeOptions(BytesWrapper(out.getvalue()))
        .with_backend("native")
        .with_offset(20_000)
        .with_offset_limit(50_000)
        .into_decoder()
    )
    assert dec.read(-1) == data[20_000:50_000]


@pytest.mark.parametrize("level", [1, 3, 7, 9])
def test_size_beats_libzstd_per_level(level):
    # BASELINE.md target: compressed size <= reference at equal level.
    data = text_data(150_000) + structured_data(100_000)
    ours = len(loader.compress_frame(data, level=level))
    ref = len(zstd_compress(data, level=level))
    assert ours <= ref * 1.01, f"L{level}: {ours} vs {ref}"
    out, _ = loader.decompress_frame(loader.compress_frame(data, level=level), len(data) + 64)
    assert out == data


def test_huge_declared_content_size_rejected_fast():
    # A corrupt frame header declaring an enormous content size must fail
    # fast (taxonomy error), not size allocations by the declared value.
    import struct
    import time

    frame = (
        b"\x28\xb5\x2f\xfd"  # magic
        + bytes([0xC0])       # fhd: 8-byte FCS, no checksum, windowed
        + bytes([0x00])       # window descriptor
        + struct.pack("<Q", 1 << 60)  # declared content size
        + b"\x01\x00\x00"     # bogus last-block header
    )
    t0 = time.time()
    with pytest.raises(Exception):
        loader.decompress_frame(frame, 1 << 20)
    assert time.time() - t0 < 2.0


def test_structured_data_ratio():
    # Numeric/structured text lives on 4-5 byte matches that a 6-byte hash
    # never buckets together (reference CLI example: seq 20000 compresses
    # to ~25%, cli/README.md:56-60). The lazy levels' 4-byte near probe
    # and the optimal levels' lazy-race fallback must keep the native
    # backend in that regime — not the ~42% an all-literal parse yields.
    data = "\n".join(str(i) for i in range(1, 20001)).encode() + b"\n"
    for lvl, bound in ((3, 0.32), (9, 0.32), (13, 0.32), (15, 0.32)):
        blob = loader.compress_frame(data, level=lvl)
        ratio = len(blob) / len(data)
        assert ratio < bound, (lvl, ratio)
        out, _ = loader.decompress_frame(blob, len(data) + 64)
        assert out == data


def test_native_table_builders_match_python():
    """zn_fse_enc_table / zn_huf_table produce the same canonical tables
    as the Python builders (the host-decision phase swaps freely between
    them)."""
    import numpy as np

    from zeekstd_tpu.codec import fse as pyfse
    from zeekstd_tpu.codec import huffman as pyhuf
    from zeekstd_tpu.codec.sequences import LL_DEFAULT_LOG, LL_DEFAULT_NORM
    from zeekstd_tpu.native import loader

    if not loader.available():
        import pytest

        pytest.skip("native runtime unavailable")

    rng = np.random.default_rng(3)
    norms = [list(LL_DEFAULT_NORM)]
    for _ in range(10):
        log = int(rng.integers(5, 10))
        n = int(rng.integers(2, 36))
        w = rng.random(n) + 0.01
        norm = np.maximum((w / w.sum() * (1 << log)).astype(np.int64), 1)
        norm[int(np.argmax(norm))] += (1 << log) - norm.sum()
        norms.append(list(norm))
    for norm in norms:
        log = int(np.log2(sum(x for x in norm if x > 0) + list(norm).count(-1)))
        nat = loader.fse_enc_table(np.asarray(norm, np.int16), log)
        assert nat is not None
        # Force the pure-python path for the reference build.
        import zeekstd_tpu.native.loader as ld

        real = ld.fse_enc_table
        ld.fse_enc_table = lambda *a, **k: None
        try:
            py = pyfse.build_encode_table(norm, log)
        finally:
            ld.fse_enc_table = real
        n = len(norm)
        assert np.array_equal(nat[0][:n], py.delta_nb_bits)
        assert np.array_equal(nat[1][:n], py.delta_find_state)
        assert np.array_equal(nat[2][: 1 << log], py.state_table)

    # Huffman: same code lengths imply same canonical codes; the trees
    # must decode-build to each other's lengths.
    hist = np.zeros(256, np.uint32)
    hist[: 64] = rng.integers(1, 1000, 64)
    tree, codes, nb = loader.huf_table(hist)
    freqs = {int(s): int(hist[s]) for s in np.nonzero(hist)[0]}
    lengths = pyhuf.package_merge_lengths(freqs)
    cost_nat = int(np.dot(hist, nb.astype(np.int64)))
    cost_py = sum(int(hist[s]) * L for s, L in lengths.items())
    assert cost_nat == cost_py, "both length assignments must be optimal"
    # The serialized tree parses back successfully.
    weights = pyhuf.read_weights(tree)
    assert len(weights) > 0
