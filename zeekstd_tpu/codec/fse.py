"""FSE (Finite State Entropy / tANS) tables: description parse, build, decode.

Implements RFC 8878 §4.1: normalized-count parsing from the variable-width
forward bitstream, the canonical symbol-spread table construction, and the
interleaved-state decode loops. The same normalized-count representation is
shared by the encoder (see ``fse_encode`` below and ``compress.py``).

This replaces the libzstd FSE engine the reference depends on
(reference: SURVEY §2.3 — CCtx/DCtx streaming rows).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..errors import corruption_detected
from .bitstream import BackwardBitReader, ForwardBitReader

FSE_MAX_ACCURACY_LOG = 9


@dataclass
class FseDecodeTable:
    """Decoding table: per-state symbol, bit count and baseline."""

    accuracy_log: int
    symbol: np.ndarray  # uint8[size]
    nb_bits: np.ndarray  # uint8[size]
    baseline: np.ndarray  # uint16[size]

    @property
    def size(self) -> int:
        return 1 << self.accuracy_log


def read_ncount(data: bytes, max_symbol: int, max_accuracy_log: int):
    """Parse an FSE table description (RFC 8878 §4.1.1).

    Returns ``(norm, accuracy_log, bytes_consumed)`` where ``norm`` is the
    normalized-count list (possibly containing -1 entries).
    """
    br = ForwardBitReader(data)
    accuracy_log = br.read(4) + 5
    if accuracy_log > max_accuracy_log:
        raise corruption_detected(f"FSE accuracy log {accuracy_log} too large")
    size = 1 << accuracy_log
    remaining = size + 1
    threshold = size
    nb_bits = accuracy_log + 1
    norm = []
    previous0 = False

    while remaining > 1:
        if len(norm) > max_symbol:
            raise corruption_detected("FSE table has too many symbols")
        if previous0:
            # Runs of zero-probability symbols: 2-bit repeat counts, value 3
            # means "3 zeros and read another repeat field".
            while True:
                rep = br.read(2)
                norm.extend([0] * rep)
                if len(norm) > max_symbol + 1:
                    raise corruption_detected("FSE zero-run overflows symbols")
                if rep != 3:
                    break
            previous0 = False
            continue
        maxv = (2 * threshold - 1) - remaining
        val = br.peek(nb_bits)
        small = val & (threshold - 1)
        if small < maxv:
            count = small
            br.skip(nb_bits - 1)
        else:
            count = val & (2 * threshold - 1)
            if count >= threshold:
                count -= maxv
            br.skip(nb_bits)
        count -= 1  # stored value is probability + 1; -1 encodes "less than 1"
        remaining -= -count if count < 0 else count
        norm.append(count)
        previous0 = count == 0
        while remaining < threshold:
            nb_bits -= 1
            threshold >>= 1

    if remaining != 1:
        raise corruption_detected("FSE normalized counts do not sum to table size")
    consumed = br.bytes_consumed
    if consumed > len(data):
        raise corruption_detected("FSE table description truncated")
    return norm, accuracy_log, consumed


def build_decode_table(norm, accuracy_log: int) -> FseDecodeTable:
    """Canonical FSE decode-table construction (RFC 8878 §4.1.1):
    -1 symbols take cells from the table top; the rest spread with
    ``step = size/2 + size/8 + 3``."""
    size = 1 << accuracy_log
    symbol = np.zeros(size, dtype=np.uint8)
    nb = np.zeros(size, dtype=np.uint8)
    baseline = np.zeros(size, dtype=np.uint16)

    high_threshold = size - 1
    sym_next = []
    for s, n in enumerate(norm):
        if n == -1:
            symbol[high_threshold] = s
            high_threshold -= 1
            sym_next.append(1)
        else:
            sym_next.append(n)

    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for s, n in enumerate(norm):
        if n <= 0:
            continue
        for _ in range(n):
            symbol[pos] = s
            pos = (pos + step) & mask
            while pos > high_threshold:
                pos = (pos + step) & mask
    if pos != 0:
        raise corruption_detected("FSE table spread did not return to zero")

    for u in range(size):
        s = symbol[u]
        next_state = sym_next[s]
        sym_next[s] += 1
        bits = accuracy_log - (int(next_state).bit_length() - 1)
        nb[u] = bits
        baseline[u] = (next_state << bits) - size

    return FseDecodeTable(accuracy_log, symbol, nb, baseline)


def rle_decode_table(symbol: int) -> FseDecodeTable:
    """Degenerate 1-state table for RLE symbol-compression mode
    (RFC 8878 §3.1.1.3.2.1.1)."""
    return FseDecodeTable(
        0,
        np.array([symbol], dtype=np.uint8),
        np.zeros(1, dtype=np.uint8),
        np.zeros(1, dtype=np.uint16),
    )


class FseState:
    """One decoding state over a table, driven by a backward bitstream."""

    def __init__(self, table: FseDecodeTable, br: BackwardBitReader):
        self.table = table
        self.state = br.read(table.accuracy_log)

    @property
    def symbol(self) -> int:
        return int(self.table.symbol[self.state])

    @property
    def nb_bits(self) -> int:
        return int(self.table.nb_bits[self.state])

    def update(self, br: BackwardBitReader) -> None:
        t = self.table
        self.state = int(t.baseline[self.state]) + br.read(int(t.nb_bits[self.state]))


def fse_decompress(data: bytes, max_symbol: int, max_accuracy_log: int, max_out: int):
    """Full FSE decompression of a symbol sequence with an embedded table
    description and two interleaved states (used for Huffman weights,
    RFC 8878 §4.2.1.2). Output length is implied by stream exhaustion."""
    norm, accuracy_log, desc_len = read_ncount(data, max_symbol, max_accuracy_log)
    table = build_decode_table(norm, accuracy_log)
    payload = data[desc_len:]
    if not payload:
        raise corruption_detected("FSE payload empty")
    br = BackwardBitReader(payload)
    s1 = FseState(table, br)
    s2 = FseState(table, br)
    if br.overflowed:
        raise corruption_detected("FSE stream too short for initial states")
    out = []
    # Alternate states; when an update over-reads the stream, the *other*
    # state still holds one final symbol (mirrors the libzstd tail loop).
    while True:
        out.append(s1.symbol)
        s1.update(br)
        if br.overflowed:
            out.append(s2.symbol)
            break
        out.append(s2.symbol)
        s2.update(br)
        if br.overflowed:
            out.append(s1.symbol)
            break
        if len(out) > max_out:
            raise corruption_detected("FSE output exceeds limit")
    if len(out) > max_out:
        raise corruption_detected("FSE output exceeds limit")
    return out
