"""Compression-ratio table: ours (native runtime) vs libzstd, same levels.

Usage: python tools/ratio_table.py [levels...]   (default 3 9 15)
Regenerates the docs/PERF.md ratio table corpora.
"""

import os
import sys
import json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def corpora():
    from bench import build_corpus

    out = {"dickens-like": build_corpus(4 << 20)}
    out["seq-20000"] = b"".join(
        str(i).encode() + b"\n" for i in range(1, 20001)
    )
    rng = np.random.default_rng(3)
    hosts = [f"host-{i:03d}" for i in range(40)]
    paths = [f"/api/v1/{w}" for w in ("users", "orders", "items", "health")]
    lines = []
    t = 1700000000.0
    for i in range(30000):
        t += float(rng.exponential(0.05))
        lines.append(json.dumps({
            "ts": round(t, 3), "host": hosts[int(rng.integers(0, 40))],
            "path": paths[int(rng.integers(0, 4))],
            "status": int(rng.choice([200, 200, 200, 404, 500])),
            "ms": round(float(rng.gamma(2, 12)), 1),
        }, separators=(",", ":")))
    out["json-logs"] = ("\n".join(lines)).encode()
    recs = []
    for i in range(60000):
        recs.append(
            int(rng.integers(0, 1 << 30)).to_bytes(4, "little")
            + int(rng.integers(0, 200)).to_bytes(2, "little")
            + bytes([int(rng.integers(0, 4))]) * 9
        )
    out["binary-records"] = b"".join(recs)
    rows = []
    for i in range(80000):
        rows.append(f"{i},{float(rng.normal(100, 15)):.2f},{int(rng.integers(0, 5))}")
    out["csv-numbers"] = ("\n".join(rows)).encode()
    return out


def main():
    levels = [int(a) for a in sys.argv[1:]] or [3, 9, 15]
    from zeekstd_tpu.native import loader
    from oracle import zstd_compress

    assert loader.available()
    data = corpora()
    hdr = "| Corpus |" + "".join(
        f" Ours L{l} | zstd L{l} |" for l in levels
    )
    print(hdr)
    print("|" + "---|" * (1 + 2 * len(levels)))
    for name, buf in data.items():
        cells = []
        for l in levels:
            blob, _ = loader.compress_stream_mt(buf, len(buf), nthreads=1, level=l)
            z = zstd_compress(buf, l)
            cells.append(f" {100*len(blob)/len(buf):.1f}% | {100*len(z)/len(buf):.1f}% |")
        print(f"| {name} ({len(buf)>>10} KiB) |" + "".join(cells))


if __name__ == "__main__":
    main()
