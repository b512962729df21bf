"""On-device TPU pipeline measurement with pull-fenced timing.

Usage: ZEEKSTD_TPU_TIMING=1 python tools/tpu_phase_bench.py [size_mb] [frame_mb] [level=1]

Timing discipline (this box's axon tunnel): block_until_ready can return
early, so every measurement is fenced by pulling a scalar reduction of the
output — the only trustworthy fence here. The blob/output pull itself is
excluded (reported separately): the tunnel's ~5 MB/s device->host path is
an environment artifact, not a property of the chip.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fence(arr):
    import jax.numpy as jnp

    return np.asarray(jnp.sum(arr[..., ::251].astype(jnp.int32)))


def main():
    size_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    frame_mb = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    level = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    from bench import build_corpus
    from zeekstd_tpu.tpu_archive import tpu_compress_archive, tpu_decompress_archive

    corpus = build_corpus(size_mb << 20)
    n = len(corpus)
    fs = frame_mb << 20

    t0 = time.time()
    rows, c_sizes, st = tpu_compress_archive(corpus, frame_size=fs, level=level, return_device=True)
    fence(rows)
    print(f"encode warmup: {time.time()-t0:.1f}s", file=sys.stderr)

    best = 1e9
    for _ in range(3):
        t0 = time.time()
        rows, c_sizes, st = tpu_compress_archive(corpus, frame_size=fs, level=level, return_device=True)
        fence(rows)
        best = min(best, time.time() - t0)
    enc = n / best / (1 << 20)
    print(f"ondevice encode: {enc:.1f} MiB/s ({best:.3f}s for {n>>20} MiB)")

    t0 = time.time()
    rows_np = np.asarray(rows)
    blob = b"".join(rows_np[f, : c_sizes[f]].tobytes() for f in range(rows_np.shape[0]))
    print(f"blob pull: {time.time()-t0:.1f}s ({len(blob)} B)", file=sys.stderr)
    print(f"ratio: {len(blob)/n*100:.1f}%")

    t0 = time.time()
    out_dev, sizes = tpu_decompress_archive(blob, st, return_device=True)
    fence(out_dev)
    print(f"decode warmup: {time.time()-t0:.1f}s", file=sys.stderr)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        out_dev, sizes = tpu_decompress_archive(blob, st, return_device=True)
        fence(out_dev)
        best = min(best, time.time() - t0)
    dec = n / best / (1 << 20)
    print(f"ondevice decode: {dec:.1f} MiB/s ({best:.3f}s for {n>>20} MiB)")

    # correctness check via host pull
    out_np = np.asarray(out_dev)
    got = b"".join(out_np[i, : sizes[i]].tobytes() for i in range(len(sizes)))
    assert got == corpus, "round-trip mismatch"
    print("round-trip ok")


if __name__ == "__main__":
    main()
