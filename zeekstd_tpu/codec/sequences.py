"""Sequence section: symbol code tables, predefined distributions, decoding,
and sequence execution (RFC 8878 §3.1.1.3.2).

A sequence is (literals_length, offset, match_length); codes map through
baseline+extra-bits tables, offsets 1-3 address the repeat-offset history.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..errors import corruption_detected
from .bitstream import BackwardBitReader
from .fse import (
    FseDecodeTable,
    FseState,
    build_decode_table,
    read_ncount,
    rle_decode_table,
)

# --- code tables (RFC 8878 §3.1.1.3.2.1.1) ---

MAX_LL_CODE = 35
MAX_ML_CODE = 52
MAX_OFFSET_CODE = 31

# Literals-length codes 16..35: (extra_bits, baseline); codes 0..15 are direct.
_LL_EXTRA = [
    (1, 16), (1, 18), (1, 20), (1, 22), (2, 24), (2, 28), (3, 32), (3, 40),
    (4, 48), (6, 64), (7, 128), (8, 256), (9, 512), (10, 1024), (11, 2048),
    (12, 4096), (13, 8192), (14, 16384), (15, 32768), (16, 65536),
]
LL_BITS = np.array([0] * 16 + [b for b, _ in _LL_EXTRA], dtype=np.uint8)
LL_BASE = np.array(list(range(16)) + [v for _, v in _LL_EXTRA], dtype=np.uint32)

# Match-length codes 32..52: (extra_bits, baseline); codes 0..31 map to 3..34.
_ML_EXTRA = [
    (1, 35), (1, 37), (1, 39), (1, 41), (2, 43), (2, 47), (3, 51), (3, 59),
    (4, 67), (4, 83), (5, 99), (7, 131), (8, 259), (9, 515), (10, 1027),
    (11, 2051), (12, 4099), (13, 8195), (14, 16387), (15, 32771), (16, 65539),
]
ML_BITS = np.array([0] * 32 + [b for b, _ in _ML_EXTRA], dtype=np.uint8)
ML_BASE = np.array(list(range(3, 35)) + [v for _, v in _ML_EXTRA], dtype=np.uint32)

# --- predefined FSE distributions (RFC 8878 §3.1.1.3.2.2) ---

LL_DEFAULT_NORM = [
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
    -1, -1, -1, -1,
]
LL_DEFAULT_LOG = 6

ML_DEFAULT_NORM = [
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
    -1, -1, -1, -1, -1,
]
ML_DEFAULT_LOG = 6

OF_DEFAULT_NORM = [
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1,
]
OF_DEFAULT_LOG = 5

# Maximum accuracy logs for FSE_Compressed mode, per category.
LL_MAX_LOG = 9
ML_MAX_LOG = 9
OF_MAX_LOG = 8

_DEFAULT_TABLES = {}


def default_table(category: str) -> FseDecodeTable:
    if category not in _DEFAULT_TABLES:
        norm, log = {
            "ll": (LL_DEFAULT_NORM, LL_DEFAULT_LOG),
            "ml": (ML_DEFAULT_NORM, ML_DEFAULT_LOG),
            "of": (OF_DEFAULT_NORM, OF_DEFAULT_LOG),
        }[category]
        _DEFAULT_TABLES[category] = build_decode_table(norm, log)
    return _DEFAULT_TABLES[category]


# --- section header parse ---


def parse_num_sequences(data: bytes):
    """Returns (num_sequences, bytes_consumed) (RFC 8878 §3.1.1.3.2.1)."""
    if not data:
        raise corruption_detected("empty sequences section")
    b0 = data[0]
    if b0 < 128:
        return b0, 1
    if b0 < 255:
        if len(data) < 2:
            raise corruption_detected("truncated sequence count")
        return ((b0 - 128) << 8) + data[1], 2
    if len(data) < 3:
        raise corruption_detected("truncated sequence count")
    return data[1] + (data[2] << 8) + 0x7F00, 3


MODE_PREDEFINED = 0
MODE_RLE = 1
MODE_FSE = 2
MODE_REPEAT = 3


def read_symbol_table(data: bytes, mode: int, category: str, prev: FseDecodeTable | None):
    """Resolve one category's decode table per its compression mode.
    Returns (table, bytes_consumed)."""
    max_sym, max_log = {
        "ll": (MAX_LL_CODE, LL_MAX_LOG),
        "ml": (MAX_ML_CODE, ML_MAX_LOG),
        "of": (MAX_OFFSET_CODE, OF_MAX_LOG),
    }[category]
    if mode == MODE_PREDEFINED:
        return default_table(category), 0
    if mode == MODE_RLE:
        if not data:
            raise corruption_detected("truncated RLE symbol")
        sym = data[0]
        if sym > max_sym:
            raise corruption_detected(f"RLE symbol {sym} out of range for {category}")
        return rle_decode_table(sym), 1
    if mode == MODE_FSE:
        norm, log, consumed = read_ncount(data, max_sym, max_log)
        return build_decode_table(norm, log), consumed
    if prev is None:
        raise corruption_detected(f"repeat mode without previous {category} table")
    return prev, 0


@dataclass
class DecodedSequences:
    literal_lengths: np.ndarray  # uint32[n]
    match_lengths: np.ndarray  # uint32[n]
    offsets: np.ndarray  # uint32[n] resolved actual offsets
    rep_offsets: tuple  # final (rep1, rep2, rep3) after the block


def decode_sequences(
    payload: bytes,
    num_sequences: int,
    ll_table: FseDecodeTable,
    of_table: FseDecodeTable,
    ml_table: FseDecodeTable,
    rep_offsets,
) -> DecodedSequences:
    """Decode the interleaved FSE sequence bitstream and resolve repeat
    offsets (RFC 8878 §3.1.1.3.2.1.2-3)."""
    br = BackwardBitReader(payload)
    ll_state = FseState(ll_table, br)
    of_state = FseState(of_table, br)
    ml_state = FseState(ml_table, br)
    if br.overflowed:
        raise corruption_detected("sequence bitstream too short for states")

    rep1, rep2, rep3 = rep_offsets
    lls = np.empty(num_sequences, dtype=np.uint32)
    mls = np.empty(num_sequences, dtype=np.uint32)
    offs = np.empty(num_sequences, dtype=np.uint32)

    for i in range(num_sequences):
        of_code = of_state.symbol
        ml_code = ml_state.symbol
        ll_code = ll_state.symbol
        if of_code > MAX_OFFSET_CODE:
            raise corruption_detected("offset code out of range")
        if ml_code > MAX_ML_CODE or ll_code > MAX_LL_CODE:
            raise corruption_detected("length code out of range")

        # Extra bits read in order: offset, match length, literals length.
        offset_value = (1 << of_code) + br.read(of_code)
        ml = int(ML_BASE[ml_code]) + br.read(int(ML_BITS[ml_code]))
        ll = int(LL_BASE[ll_code]) + br.read(int(LL_BITS[ll_code]))
        if br.overflowed:
            raise corruption_detected("sequence bitstream over-read")

        if offset_value > 3:
            offset = offset_value - 3
            rep3 = rep2
            rep2 = rep1
            rep1 = offset
        else:
            idx = offset_value + (1 if ll == 0 else 0)
            if idx == 1:
                offset = rep1
            elif idx == 2:
                offset = rep2
                rep2 = rep1
                rep1 = offset
            elif idx == 3:
                offset = rep3
                rep3 = rep2
                rep2 = rep1
                rep1 = offset
            else:  # idx == 4: repeat1 - 1
                offset = rep1 - 1
                if offset == 0:
                    raise corruption_detected("repeat offset underflow")
                rep3 = rep2
                rep2 = rep1
                rep1 = offset

        lls[i] = ll
        mls[i] = ml
        offs[i] = offset

        # State updates (order: literals, match, offset); skipped after the
        # final sequence.
        if i + 1 < num_sequences:
            ll_state.update(br)
            ml_state.update(br)
            of_state.update(br)
            if br.overflowed:
                raise corruption_detected("sequence bitstream over-read in update")

    if br.remaining != 0:
        raise corruption_detected(
            f"sequence bitstream not fully consumed ({br.remaining} bits left)"
        )
    return DecodedSequences(lls, mls, offs, (rep1, rep2, rep3))


def execute_sequences(
    seqs: DecodedSequences,
    literals: bytes,
    window: bytearray,
    window_start: int,
) -> int:
    """Append the block's output to ``window`` by interleaving literal runs
    and match copies. ``window`` holds prefix + frame history; matches may
    reach back to ``window_start`` == 0 (prefix included). Returns the number
    of bytes appended."""
    lit_pos = 0
    appended = 0
    lits = memoryview(literals)
    for i in range(len(seqs.literal_lengths)):
        ll = int(seqs.literal_lengths[i])
        ml = int(seqs.match_lengths[i])
        offset = int(seqs.offsets[i])
        if ll:
            window += lits[lit_pos : lit_pos + ll]
            lit_pos += ll
            appended += ll
        if ml:
            src = len(window) - offset
            if src < window_start:
                raise corruption_detected("match offset beyond window start")
            if offset >= ml:
                window += window[src : src + ml]
            else:
                # Overlapping match: forward copy == replicate the
                # offset-length pattern.
                pattern = bytes(window[src:])
                reps = -(-ml // offset)
                window += (pattern * reps)[:ml]
            appended += ml
    if lit_pos < len(lits):
        window += lits[lit_pos:]
        appended += len(lits) - lit_pos
    elif lit_pos > len(lits):
        raise corruption_detected("literals over-consumed by sequences")
    return appended
