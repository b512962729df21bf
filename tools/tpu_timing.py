"""On-device TPU pipeline timing: fenced per-stage accounting on the bench corpus.

Usage: ZEEKSTD_TPU_TIMING=2 python tools/tpu_timing.py [size_mib]
Reports warmup (cold/warm), on-device encode and decode MiB/s with outputs
kept resident in HBM (jax.block_until_ready fences), and the host pull cost
separately — the measurement discipline VERDICT.md item 1 requires.
"""
import sys
import time

sys.path.insert(0, ".")

from bench import build_corpus  # noqa: E402


def main():
    size = (int(sys.argv[1]) if len(sys.argv) > 1 else 10) << 20
    corpus = build_corpus(size)
    import jax

    from zeekstd_tpu.tpu_archive import (
        StagedInput,
        tpu_compress_archive,
        tpu_decompress_archive,
    )

    print(f"devices: {jax.devices()}", flush=True)
    mib = len(corpus) / (1 << 20)
    fs = 1 << 20

    t0 = time.perf_counter()
    staged = StagedInput(corpus, fs)
    print(f"input staging: {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    rows, c_sizes, st = tpu_compress_archive(
        staged, frame_size=fs, return_device=True
    )
    jax.block_until_ready(rows)
    warm = time.perf_counter() - t0
    print(f"encode warmup+run: {warm:.1f}s", flush=True)

    best_enc = None
    for _ in range(3):
        t0 = time.perf_counter()
        rows, c_sizes, st = tpu_compress_archive(
            staged, frame_size=fs, return_device=True
        )
        jax.block_until_ready(rows)
        dt = time.perf_counter() - t0
        best_enc = dt if best_enc is None else min(best_enc, dt)
        print(f"  encode: {dt:.2f}s = {mib/dt:.1f} MiB/s", flush=True)

    blob, st = tpu_compress_archive(corpus, frame_size=fs)
    ratio = len(blob) / len(corpus)
    print(f"ratio: {ratio*100:.1f}%", flush=True)

    t0 = time.perf_counter()
    out_dev, sizes = tpu_decompress_archive(blob, st, return_device=True)
    jax.block_until_ready(out_dev)
    warm_d = time.perf_counter() - t0
    print(f"decode warmup+run: {warm_d:.1f}s", flush=True)

    best_dec = None
    for _ in range(3):
        t0 = time.perf_counter()
        out_dev, sizes = tpu_decompress_archive(blob, st, return_device=True)
        jax.block_until_ready(out_dev)
        dt = time.perf_counter() - t0
        best_dec = dt if best_dec is None else min(best_dec, dt)
        print(f"  decode: {dt:.2f}s = {mib/dt:.1f} MiB/s", flush=True)

    t0 = time.perf_counter()
    out = tpu_decompress_archive(blob, st)
    pull = time.perf_counter() - t0
    assert out == corpus, "round-trip mismatch"
    print(
        f"ondevice: enc {mib/best_enc:.1f} MiB/s dec {mib/best_dec:.1f} MiB/s; "
        f"e2e decode incl. host pull {mib/pull:.1f} MiB/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
