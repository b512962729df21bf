"""Benchmark: seekable compression/decompression throughput on this chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MiB/s", "vs_baseline": R}

Baseline: the reference zeekstd RawEncoder at 376.36 MiB/s compression on
Silesia dickens, level 1, 2 MiB frames (BASELINE.md; reference README.md:64).
The bench corpus is a deterministic ~10 MiB mixed-text stand-in for the
missing dickens asset (reference: .MISSING_LARGE_BLOBS).

Progress/diagnostics go to stderr; stdout carries only the JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_ENCODE_MIBS = 376.36  # reference RawEncoder, README.md:64
BASELINE_DECODE_MIBS = 1467.9  # reference Decoder 1.4335 GiB/s, README.md:76


def build_corpus(target=10 << 20) -> bytes:
    """Deterministic Silesia-like mixed text corpus."""
    import random

    rng = random.Random(1898)  # dickens
    paras = []
    vocab = (
        "it was the best of times it was the worst of times the age of "
        "wisdom foolishness epoch belief incredulity season light darkness "
        "spring hope winter despair we had everything before us nothing "
        "chapter london paris monseigneur defarge manette carton darnay "
    ).split()
    out = []
    total = 0
    while total < target:
        n = rng.randrange(20, 120)
        words = [rng.choice(vocab) for _ in range(n)]
        if rng.random() < 0.1:
            words.insert(0, f"CHAPTER {rng.randrange(1, 60)}.")
        para = (" ".join(words) + ".\n\n").encode()
        out.append(para)
        total += len(para)
    return b"".join(out)[:target]


def main() -> int:
    import numpy as np

    t0 = time.time()
    corpus = build_corpus()
    n = len(corpus)
    print(f"corpus: {n} bytes ({time.time()-t0:.1f}s)", file=sys.stderr)

    import jax

    print(f"devices: {jax.devices()}", file=sys.stderr)

    from zeekstd_tpu.parallel import make_mesh, parallel_compress, parallel_decompress

    mesh = make_mesh()
    frame_size = 2 << 20

    # Warm-up (compile).
    t0 = time.time()
    blob, st = parallel_compress(corpus, mesh, frame_size=frame_size)
    print(
        f"warmup compress: {time.time()-t0:.2f}s, "
        f"{n} -> {len(blob)} ({len(blob)/n*100:.1f}%)",
        file=sys.stderr,
    )

    best_enc = 0.0
    for _ in range(2):
        t0 = time.time()
        blob, st = parallel_compress(corpus, mesh, frame_size=frame_size)
        dt = time.time() - t0
        best_enc = max(best_enc, n / dt / (1 << 20))
    print(f"encode: {best_enc:.1f} MiB/s", file=sys.stderr)

    # Decode timing (warm-up + best of 2).
    try:
        out = parallel_decompress(blob, st, mesh)
        assert out == corpus, "decode round-trip mismatch"
        best_dec = 0.0
        for _ in range(2):
            t0 = time.time()
            out = parallel_decompress(blob, st, mesh)
            dt = time.time() - t0
            best_dec = max(best_dec, n / dt / (1 << 20))
        print(f"decode: {best_dec:.1f} MiB/s (round-trip exact)", file=sys.stderr)
    except Exception as e:  # decode perf is secondary; never lose the encode number
        print(f"decode bench failed: {e!r}", file=sys.stderr)
        best_dec = 0.0

    print(
        json.dumps(
            {
                "metric": "seekable encode throughput (10MiB text, L1-fast, 2MiB frames; "
                f"decode {best_dec:.1f} MiB/s)",
                "value": round(best_enc, 2),
                "unit": "MiB/s",
                "vs_baseline": round(best_enc / BASELINE_ENCODE_MIBS, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
