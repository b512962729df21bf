"""AddressSanitizer soak for the native codec.

Builds zeekstd_native.cpp with ASan+UBSan, then drives it through the same
C ABI the backends use: clean-path round-trips across levels/shapes/
prefixes with exact-capacity output buffers, followed by corrupt-input
mutations and truncations. Any out-of-bounds access, overflow, or hostile
allocation aborts with a sanitizer report.

Usage:
    python tools/asan_soak.py [rounds]          # default 20000
Requires LD_PRELOAD of the ASan runtime; the script re-execs itself with
it when needed.
"""

import ctypes
import os
import random
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "zeekstd_tpu", "native", "zeekstd_native.cpp")
SO = "/tmp/zeekstd_native_asan.so"
ASAN_RT = None
for _p in (
    "/usr/lib/x86_64-linux-gnu/libasan.so.8",
    "/usr/lib/x86_64-linux-gnu/libasan.so.6",
):
    if os.path.exists(_p):
        ASAN_RT = _p
        break


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    if os.environ.get("_ASAN_SOAK_CHILD") != "1":
        subprocess.run(
            [
                "g++", "-O1", "-g", "-fsanitize=address,undefined",
                "-fno-omit-frame-pointer", "-shared", "-fPIC",
                "-o", SO, SRC, "-lpthread",
            ],
            check=True,
        )
        env = dict(os.environ, _ASAN_SOAK_CHILD="1", ASAN_OPTIONS="detect_leaks=0")
        if ASAN_RT:
            env["LD_PRELOAD"] = ASAN_RT
        return subprocess.run([sys.executable, __file__, str(rounds)], env=env).returncode

    import numpy as np

    lib = ctypes.CDLL(SO)
    lib.zn_compress_frame.restype = ctypes.c_long
    lib.zn_decompress_frame.restype = ctypes.c_long
    rng = random.Random(77)
    nprng = np.random.default_rng(77)
    t0 = time.time()

    # Clean paths: every level, shapes, prefixes, exact-capacity buffers.
    for _ in range(120):
        n0 = rng.choice([0, 1, 7, 31, 32, 100, 4096, 70000, 250000])
        kind = rng.randrange(5)
        if kind == 0:
            d = nprng.integers(0, 256, n0).astype(np.uint8).tobytes()
        elif kind == 1:
            d = (b"clean path coverage " * (n0 // 20 + 1))[:n0]
        elif kind == 2:
            d = bytes([rng.randrange(4)]) * n0
        elif kind == 3:
            h = nprng.integers(0, 40, max(n0 // 2, 1)).astype(np.uint8).tobytes()
            d = (h + h)[:n0]
        else:
            d = bytes(nprng.integers(97, 123, n0).astype(np.uint8))
        n = len(d)
        lvl = rng.choice([1, 2, 3, 5, 9, 13, 15, 17, 19])
        pfx = d[: n // 2] + b"\x07\x08" if (rng.random() < 0.4 and n > 4) else b""
        cbuf = ctypes.create_string_buffer(2 * n + 4096)
        r = lib.zn_compress_frame(
            d, ctypes.c_long(n), cbuf, ctypes.c_long(len(cbuf)), lvl, 1,
            pfx or None, ctypes.c_long(len(pfx)),
        )
        assert r > 0, (n, lvl)
        blob = cbuf.raw[:r]
        dbuf = ctypes.create_string_buffer(n + 1)
        cons = ctypes.c_size_t(0)
        r2 = lib.zn_decompress_frame(
            blob, ctypes.c_long(r), dbuf, ctypes.c_long(n),
            pfx or None, ctypes.c_long(len(pfx)), ctypes.byref(cons),
        )
        assert r2 == n and dbuf.raw[:n] == d, (n, lvl, r2)
    print(f"clean-path: 120 configs ok ({time.time()-t0:.0f}s)", flush=True)

    # Corrupt-input soak: mutations + truncations, no crash/report allowed.
    bases = []
    for lvl in (1, 5, 19):
        for mk in range(3):
            n = rng.choice([100, 5000, 60000])
            if mk == 0:
                d = nprng.integers(0, 256, n).astype(np.uint8).tobytes()
            elif mk == 1:
                d = (b"corrupt me gently " * (n // 18 + 1))[:n]
            else:
                d = bytes([1, 2, 3]) * (n // 3 + 1)
            buf = ctypes.create_string_buffer(len(d) * 2 + 4096)
            r = lib.zn_compress_frame(
                d, ctypes.c_long(len(d)), buf, ctypes.c_long(len(buf)), lvl, 1,
                None, ctypes.c_long(0),
            )
            bases.append(bytes(buf.raw[:r]))
    dst = ctypes.create_string_buffer(1 << 20)
    cons = ctypes.c_size_t(0)
    for it in range(rounds):
        blob = bases[rng.randrange(len(bases))]
        b = bytearray(blob)
        for _ in range(rng.randrange(1, 10)):
            op = rng.randrange(3)
            if op == 0 and len(b) > 1:
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            elif op == 1 and len(b) > 4:
                del b[rng.randrange(len(b))]
            else:
                b.insert(rng.randrange(len(b) + 1), rng.randrange(256))
        lib.zn_decompress_frame(
            bytes(b), ctypes.c_long(len(b)), dst, ctypes.c_long(len(dst)),
            None, ctypes.c_long(0), ctypes.byref(cons),
        )
        if it % 4 == 0 and len(blob) > 8:
            t = blob[: rng.randrange(1, len(blob))]
            lib.zn_decompress_frame(
                t, ctypes.c_long(len(t)), dst, ctypes.c_long(len(dst)),
                None, ctypes.c_long(0), ctypes.byref(cons),
            )
    print(f"corrupt soak: {rounds} rounds + truncations clean ({time.time()-t0:.0f}s total)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
