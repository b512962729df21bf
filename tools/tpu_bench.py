"""TPU-only bench: on-device encode/decode throughput with per-stage timing.

Usage: ZEEKSTD_TPU_TIMING=2 python tools/tpu_bench.py [size_mb]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_corpus, bench_tpu, log


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    corpus = build_corpus(size << 20)
    log(f"corpus: {len(corpus)} bytes")
    t0 = time.time()
    r = bench_tpu(corpus, 1 << 20)
    log(f"total {time.time()-t0:.1f}s: {r[3] if r and len(r) > 3 else r}")


if __name__ == "__main__":
    main()
