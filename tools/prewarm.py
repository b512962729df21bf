"""Pre-compile the canonical TPU shapes into the persistent cache.

Run once per machine/jax-version (e.g. after install, or before
benchmarking): every jitted program on the bench and CLI default paths
gets compiled and lands in .jax_cache, so later processes start in
seconds instead of minutes. The serial Pallas kernels are shape-bucketed
(match: NRECP buckets; FSE: NRECJ buckets; decode: pow2 everything), so
one prewarm covers a broad input-size range.

Usage: python tools/prewarm.py [sizes_mib ...]   (default: 10 4)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_corpus  # noqa: E402


def prewarm(size_mib: int, frame_size: int) -> None:
    from zeekstd_tpu.tpu_archive import (
        StagedInput, tpu_compress_archive, tpu_decompress_archive,
    )

    corpus = build_corpus(size_mib << 20)
    t0 = time.time()
    staged = StagedInput(corpus, frame_size)
    blob, st = tpu_compress_archive(staged, frame_size=frame_size, level=1)
    out = tpu_decompress_archive(blob, st)
    assert out == corpus, "prewarm roundtrip mismatch"
    print(
        f"prewarm {size_mib}MiB/fs={frame_size >> 20}MiB: "
        f"{time.time() - t0:.1f}s",
        flush=True,
    )


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [10, 4]
    # Bench shape (1 MiB frames) and CLI default (2 MiB frames).
    prewarm(sizes[0], 1 << 20)
    for s in sizes[1:]:
        prewarm(s, 2 << 20)


if __name__ == "__main__":
    main()
