"""Micro-benchmarks for the serial Pallas kernels (match / decode / FSE).

Usage: python tools/kernel_bench.py [match|decode|ratio|all] [size_mib]
Times each kernel in isolation (fenced) on the bench corpus so inner-loop
changes can be measured without the rest of the pipeline; `ratio` compares
the match-kernel archive size against the XLA parse and libzstd.
"""
import os
import sys
import time

sys.path.insert(0, ".")

from bench import build_corpus  # noqa: E402


def _fence(o):
    import jax
    import numpy as np

    # block_until_ready can return early through the axon tunnel;
    # a tiny pull is the only reliable fence.
    np.asarray(jax.tree_util.tree_leaves(o)[-1][..., :1])


def bench_match(corpus, fs=1 << 20):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from zeekstd_tpu.tpu_archive import BLOCK_SIZE, _match_stats_packed_fn
    from zeekstd_tpu.ops.match_kernel import (
        ST_MLSUM, ST_NSEQ, bucket_nrecp, build_records, get_match_kernel,
    )

    n = len(corpus)
    F = -(-n // fs)
    B = -(-fs // BLOCK_SIZE)
    seq_bound = min(1 << 18, max(2048, fs // 8))
    frames = np.zeros((F, fs), np.uint8)
    lengths = np.zeros(F, np.int32)
    for i in range(F):
        c = corpus[i * fs : (i + 1) * fs]
        frames[i, : len(c)] = np.frombuffer(c, np.uint8)
        lengths[i] = len(c)
    frames_dev = jnp.asarray(frames)
    NRECP = bucket_nrecp(F * B)
    meta = build_records(F, B, BLOCK_SIZE, fs, lengths, n_pad=NRECP)
    meta_dev = jnp.asarray(meta)

    SBd = BLOCK_SIZE // 4
    kern = get_match_kernel(BLOCK_SIZE, SBd, NRECP)
    BLKW = BLOCK_SIZE // 4

    def words_of(frames_dev):
        w = frames_dev.reshape(-1, 4).astype(jnp.int32)
        words = w[:, 0] | (w[:, 1] << 8) | (w[:, 2] << 16) | (w[:, 3] << 24)
        return jnp.pad(words, (0, NRECP * BLKW - words.shape[0]))

    words_jit = jax.jit(words_of)
    words = jax.block_until_ready(words_jit(frames_dev))

    # kernel only
    for tag in ("cold", "warm", "warm", "warm"):
        t = time.perf_counter()
        out = kern(meta_dev, words)
        _fence(out)
        dt = time.perf_counter() - t
        print(f"match kernel ({tag}): {dt:.3f}s = {n/(1<<20)/dt:.1f} MiB/s", flush=True)
    stat = np.asarray(out[3])
    nseq = int(stat[:, ST_NSEQ].sum())
    mlsum = int(stat[:, ST_MLSUM].sum())
    print(f"  nseq={nseq} matched={mlsum} ({mlsum/n*100:.1f}% of input)")

    # full parse+stats fn
    parse = _match_stats_packed_fn(fs, seq_bound, B, F)
    lengths_dev = jnp.asarray(lengths)
    for tag in ("cold", "warm", "warm"):
        t = time.perf_counter()
        outs = parse(frames_dev, lengths_dev, meta_dev)
        _fence(outs)
        dt = time.perf_counter() - t
        print(f"match+stats ({tag}): {dt:.3f}s = {n/(1<<20)/dt:.1f} MiB/s", flush=True)


def bench_ratio(corpus, fs=1 << 20):
    from zeekstd_tpu.tpu_archive import tpu_compress_archive, tpu_decompress_archive

    n = len(corpus)
    try:
        from tests.oracle import zstd_compress_bound_check  # noqa: F401
    except Exception:
        pass
    import ctypes.util

    lz = None
    p = ctypes.util.find_library("zstd")
    if p:
        import ctypes

        lz = ctypes.CDLL(p)
        bound = lz.ZSTD_compressBound(len(corpus))
        buf = ctypes.create_string_buffer(bound)
        csz = lz.ZSTD_compress(buf, bound, corpus, len(corpus), 1)
        print(f"libzstd L1 (whole stream): {csz} = {csz/n*100:.2f}%")

    results = {}
    for mode in ("xla", "kernel"):
        os.environ["ZEEKSTD_TPU_MATCH"] = mode
        t = time.perf_counter()
        blob, st = tpu_compress_archive(corpus, frame_size=fs, level=1)
        dt = time.perf_counter() - t
        t2 = time.perf_counter()
        blob2, _ = tpu_compress_archive(corpus, frame_size=fs, level=1)
        dt2 = time.perf_counter() - t2
        results[mode] = blob
        print(
            f"{mode}: {len(blob)} = {len(blob)/n*100:.2f}%  "
            f"cold {dt:.2f}s warm {dt2:.2f}s = {n/(1<<20)/dt2:.1f} MiB/s",
            flush=True,
        )
        assert tpu_decompress_archive(blob, st) == corpus, f"{mode} roundtrip"
    os.environ.pop("ZEEKSTD_TPU_MATCH", None)


def bench_decode(corpus, fs=1 << 20):
    import jax

    from zeekstd_tpu.jax_setup import phase_timer  # noqa: F401
    from zeekstd_tpu.tpu_archive import tpu_compress_archive, tpu_decompress_archive

    blob, st = tpu_compress_archive(corpus, frame_size=fs, level=1)
    n = len(corpus)
    for tag in ("cold", "warm", "warm"):
        t = time.perf_counter()
        out_dev, sizes = tpu_decompress_archive(blob, st, return_device=True)
        jax.block_until_ready(out_dev)
        dt = time.perf_counter() - t
        print(f"decode ({tag}): {dt:.3f}s = {n/(1<<20)/dt:.1f} MiB/s", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    size = (int(sys.argv[2]) if len(sys.argv) > 2 else 10) << 20
    corpus = build_corpus(size)
    if which in ("match", "all"):
        bench_match(corpus)
    if which in ("ratio", "all"):
        bench_ratio(corpus)
    if which in ("decode", "all"):
        bench_decode(corpus)


if __name__ == "__main__":
    main()
