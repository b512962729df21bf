"""On-TPU smoke + timing for the serial Pallas sequence executor.

Usage: python tools/exec_kernel_smoke.py [--interpret]
Builds randomized multi-frame workloads, checks bytes against the numpy
reference from tests/test_exec_kernel.py, then times a realistic decode
shape (dickens-like sequence statistics: ~6 ll + ~12 ml per sequence).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--outb", type=int, default=1 << 20)
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()
    if args.interpret:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), jax.devices())

    from zeekstd_tpu.ops import exec_kernel as ek
    from tests.test_exec_kernel import ref_execute, seq_rows

    # --- correctness on a small random case ------------------------------
    rng = np.random.default_rng(3)
    rows = []
    frames = []
    lits_list = []
    for f in range(3):
        blocks = []
        lit_stream = bytearray()
        pos = 0
        for b in range(3):
            nseq = int(rng.integers(8, 60))
            seqs = []
            used = 0
            reps = [1, 4, 8]
            for _ in range(nseq):
                ll = int(rng.integers(0, 24))
                if pos + ll == 0:
                    ll = 1
                lit_stream += bytes(rng.integers(0, 256, ll, dtype=np.uint8))
                used += ll
                pos += ll
                ml = int(rng.integers(3, 40))
                r1, r2, r3 = reps
                ofv = 0
                if rng.random() < 0.4:
                    ofv = int(rng.integers(1, 4))
                    ridx = ofv + (1 if ll == 0 else 0)
                    cand = {1: r1, 2: r2, 3: r3, 4: r1 - 1}[ridx]
                    if cand <= 0 or cand > pos:
                        ofv = 0
                    else:
                        if ridx == 2:
                            reps = [r2, r1, r3]
                        elif ridx == 3:
                            reps = [r3, r1, r2]
                        elif ridx == 4:
                            reps = [r1 - 1, r1, r2]
                if ofv == 0:
                    off = int(rng.integers(1, pos + 1))
                    ofv = off + 3
                    reps = [off, r1, r2]
                seqs.append((ll, ml, ofv))
                pos += ml
            trail = int(rng.integers(0, 50))
            lit_stream += bytes(rng.integers(0, 256, trail, dtype=np.uint8))
            pos += trail
            blocks.append(("seq", len(rows), nseq, used + trail))
            rows.append(seqs)
        frames.append(blocks)
        lits_list.append(bytes(lit_stream))

    SBd = 64
    LITB = 2048
    ll, ml, ofv = seq_rows(rows, width=SBd)
    meta, n_rec = ek.build_records(frames, SBd)
    exp, bads, litcs = ref_execute(meta, ll, ml, ofv, lits_list, n_rec, 3)

    OUTB = 8192
    F = 3
    LRWS = LITB // 128 + 1
    max_lit = max(len(x) for x in lits_list)
    LROWS = -(-max_lit // 128) + LRWS
    lits = np.zeros((F, LROWS, 128), np.int32)
    for i, x in enumerate(lits_list):
        flat = np.zeros(LROWS * 128, np.int32)
        flat[: len(x)] = np.frombuffer(bytes(x), np.uint8)
        lits[i] = flat.reshape(LROWS, 128)

    fn = ek.get_exec_kernel(SBd, LITB, OUTB, meta.shape[0], F, LROWS,
                            interpret=args.interpret)
    t0 = time.time()
    out, meta_out = fn(jnp.asarray(meta), jnp.asarray(ll), jnp.asarray(ml),
                       jnp.asarray(ofv), jnp.asarray(lits))
    out = np.asarray(out).reshape(F, OUTB)
    meta_out = np.asarray(meta_out)
    print(f"compile+run: {time.time()-t0:.1f}s")
    for f in range(F):
        total = int(meta_out[f, 0])
        assert total == len(exp[f]), (f, total, len(exp[f]))
        got = bytes(out[f, :total])
        if got != exp[f]:
            d = next(i for i in range(total) if got[i] != exp[f][i])
            print(f"FRAME {f} DIVERGES at {d}: got {got[max(0,d-4):d+8]!r} "
                  f"exp {exp[f][max(0,d-4):d+8]!r}")
            sys.exit(1)
    print("correctness: OK (3 frames, random blocks, rep history)")

    # --- timing: realistic dickens-like shape ----------------------------
    # ~18 bytes per sequence (6 lit + 12 match), 1 MiB frames.
    OUTB = args.outb
    F = args.frames
    SBd = 2048
    LITB = 1 << 17
    per_seq = 18
    nseq_frame = OUTB // per_seq
    rows = []
    frames = []
    lits_list = []
    rng = np.random.default_rng(11)
    block_out = 1 << 17  # 128 KiB blocks
    seq_per_block = block_out // per_seq
    for f in range(F):
        blocks = []
        lit_stream = bytearray()
        pos = 0
        for b in range(OUTB // block_out):
            seqs = []
            used = 0
            for s in range(seq_per_block):
                ll = 6
                lit_stream += bytes(rng.integers(0, 256, ll, dtype=np.uint8))
                used += ll
                pos += ll
                ml = 12
                off = int(rng.integers(1, min(pos, 65536) + 1))
                seqs.append((ll, ml, off + 3))
                pos += ml
            rem = block_out - (used + seq_per_block * 12)
            lit_stream += bytes(rng.integers(0, 256, rem, dtype=np.uint8))
            pos += rem
            row0 = len(rows)
            # pack into SBd-wide rows
            for s0 in range(0, len(seqs), SBd):
                rows.append(seqs[s0 : s0 + SBd])
            blocks.append(("seq", row0, len(seqs), used + rem))
        frames.append(blocks)
        lits_list.append(bytes(lit_stream))

    ll, ml, ofv = seq_rows(rows, width=SBd)
    meta, n_rec = ek.build_records(frames, SBd)
    LRWS = LITB // 128 + 1
    max_lit = max(len(x) for x in lits_list)
    LROWS = -(-max_lit // 128) + LRWS
    lits = np.zeros((F, LROWS, 128), np.int32)
    for i, x in enumerate(lits_list):
        flat = np.zeros(LROWS * 128, np.int32)
        flat[: len(x)] = np.frombuffer(bytes(x), np.uint8)
        lits[i] = flat.reshape(LROWS, 128)

    total_bytes = F * OUTB
    print(f"timing shape: {F} frames x {OUTB} bytes, {n_rec} records, "
          f"{sum(len(r) for r in rows)} seqs")
    fn = ek.get_exec_kernel(SBd, LITB, OUTB, meta.shape[0], F, LROWS,
                            interpret=args.interpret)
    meta_d = jnp.asarray(meta)
    ll_d, ml_d, ofv_d = jnp.asarray(ll), jnp.asarray(ml), jnp.asarray(ofv)
    lits_d = jnp.asarray(lits)
    t0 = time.time()
    out, mo = fn(meta_d, ll_d, ml_d, ofv_d, lits_d)
    jax.block_until_ready(out)
    print(f"compile+first run: {time.time()-t0:.1f}s")
    # verify a couple of frames against the reference
    exp, _, _ = ref_execute(meta, ll, ml, ofv, lits_list, n_rec, F)
    out_np = np.asarray(out).reshape(F, OUTB)
    mo = np.asarray(mo)
    for f in (0, F - 1):
        assert int(mo[f, 0]) == len(exp[f])
        got = bytes(out_np[f, : len(exp[f])])
        if got != exp[f]:
            d = next(i for i in range(len(exp[f])) if got[i] != exp[f][i])
            print(f"TIMING SHAPE FRAME {f} DIVERGES at {d}")
            sys.exit(1)
    print("timing-shape correctness: OK")
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        out, mo = fn(meta_d, ll_d, ml_d, ofv_d, lits_d)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    mibs = total_bytes / dt / (1 << 20)
    print(f"exec kernel: {dt*1e3:.1f} ms for {total_bytes/(1<<20):.0f} MiB "
          f"-> {mibs:.0f} MiB/s")


if __name__ == "__main__":
    main()
