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


_dec_table_cache: dict = {}


def build_decode_table(norm, accuracy_log: int) -> FseDecodeTable:
    """Canonical FSE decode-table construction (RFC 8878 §4.1.1):
    -1 symbols take cells from the table top; the rest spread with
    ``step = size/2 + size/8 + 3``.

    Vectorized: ``step`` is odd, so iterating ``pos = (pos + step) & mask``
    is a permutation orbit of the whole table — the serial spread visits
    ``orbit[k] = (k*step) & mask`` in order, skipping cells above the
    high threshold. Filtering the orbit reproduces the exact cell order
    without the per-cell Python loop (this runs per block at decode
    planning time)."""
    key = (bytes(np.asarray(norm, dtype=np.int16).tobytes()), accuracy_log)
    hit = _dec_table_cache.get(key)
    if hit is not None:
        return hit
    size = 1 << accuracy_log
    norm_np = np.asarray(norm, dtype=np.int64)
    nsym = len(norm_np)

    neg = norm_np == -1
    n_neg = int(neg.sum())
    high_threshold = size - 1 - n_neg
    total_spread = int(norm_np[norm_np > 0].sum())
    if total_spread != size - n_neg:
        raise corruption_detected("FSE table spread did not return to zero")

    symbol = np.zeros(size, dtype=np.uint8)
    # -1 symbols occupy the table top, descending in symbol order.
    if n_neg:
        symbol[size - n_neg :] = np.nonzero(neg)[0][::-1]

    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    if total_spread:
        orbit = (np.arange(size, dtype=np.int64) * step) & mask
        positions = orbit[orbit <= high_threshold]
        spread_syms = np.repeat(
            np.arange(nsym, dtype=np.int64), np.clip(norm_np, 0, None)
        )
        symbol[positions] = spread_syms

    # Per-cell next_state = sym_next_init[sym] + rank of the cell among
    # its symbol's cells in table order (the serial loop's visit order).
    sym_next_init = np.where(neg, 1, norm_np)
    order = np.argsort(symbol, kind="stable")
    sym_sorted = symbol[order].astype(np.int64)
    group_start = np.searchsorted(sym_sorted, np.arange(nsym))
    within = np.arange(size, dtype=np.int64) - group_start[sym_sorted]
    next_state = np.empty(size, dtype=np.int64)
    next_state[order] = sym_next_init[sym_sorted] + within

    bits = accuracy_log - (np.frexp(next_state.astype(np.float64))[1] - 1)
    nb = bits.astype(np.uint8)
    baseline = ((next_state << bits) - size).astype(np.uint16)
    t = FseDecodeTable(accuracy_log, symbol, nb, baseline)
    if len(_dec_table_cache) > 4096:
        _dec_table_cache.clear()
    _dec_table_cache[key] = t
    return t


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


# --- encoding side -------------------------------------------------------


@dataclass
class FseEncodeTable:
    """Encoding table: per-symbol transform + state transition table."""

    accuracy_log: int
    delta_nb_bits: np.ndarray  # int32[num_symbols]
    delta_find_state: np.ndarray  # int32[num_symbols]
    state_table: np.ndarray  # uint16[size]
    norm: list  # normalized counts (for serialization)

    @property
    def size(self) -> int:
        return 1 << self.accuracy_log


def optimal_table_log(max_log: int, total: int, max_symbol: int) -> int:
    """Heuristic accuracy log, mirroring FSE_optimalTableLog's shape."""
    log = (total - 1).bit_length() - 2 if total > 1 else 1
    min_bits_symbols = (max_symbol + 1).bit_length() + 1
    log = max(log, 5)
    log = min(log, max_log)
    log = max(log, min(min_bits_symbols, max_log))
    return max(log, 5)


def normalize_counts(counts, table_log: int, total: int, max_symbol: int):
    """Normalize a histogram to sum to 2**table_log, assigning -1 to present
    symbols whose probability rounds below 1 (RFC 8878 'less than 1')."""
    size = 1 << table_log
    norm = [0] * (max_symbol + 1)
    # Low-probability threshold, like libzstd's lowThreshold = total >> tableLog.
    low_threshold = total >> table_log
    distributed = 0
    rest_total = 0
    for s in range(max_symbol + 1):
        c = counts[s]
        if c == 0:
            continue
        if c <= low_threshold:
            norm[s] = -1
            distributed += 1
        else:
            rest_total += c
    remaining_slots = size - distributed
    if remaining_slots <= 0 or rest_total == 0:
        # Degenerate: give every present symbol one slot, largest gets rest.
        present = [s for s in range(max_symbol + 1) if counts[s] > 0]
        norm = [0] * (max_symbol + 1)
        for s in present:
            norm[s] = 1
        largest = max(present, key=lambda s: counts[s])
        norm[largest] += size - len(present)
        return norm
    # Largest-remainder apportionment of remaining_slots over the big symbols.
    shares = []
    assigned = 0
    for s in range(max_symbol + 1):
        if norm[s] == -1 or counts[s] == 0:
            continue
        exact = counts[s] * remaining_slots / rest_total
        base = max(int(exact), 1)
        shares.append((exact - base, s))
        norm[s] = base
        assigned += base
    # Fix the sum: add leftovers to largest remainders, or strip from the
    # smallest-impact symbols if over-assigned.
    leftover = remaining_slots - assigned
    if leftover > 0:
        shares.sort(reverse=True)
        i = 0
        while leftover > 0:
            _, s = shares[i % len(shares)]
            norm[s] += 1
            leftover -= 1
            i += 1
    elif leftover < 0:
        order = sorted((s for _, s in shares), key=lambda s: counts[s])
        i = 0
        guard = 0
        while leftover < 0:
            s = order[i % len(order)]
            if norm[s] > 1:
                norm[s] -= 1
                leftover += 1
            i += 1
            guard += 1
            if guard > 10_000:
                raise corruption_detected("normalization failed to converge")
    return norm


def build_encode_table(norm, accuracy_log: int) -> FseEncodeTable:
    """Canonical FSE encode-table construction (mirror of the decode spread).

    Vectorized with the same spread-orbit permutation as
    ``build_decode_table``: this runs per block per category in the batched
    TPU encoder's host-decision phase (tpu_archive._host_jobs), where the
    serial per-cell loops dominated the phase (~0.36 ms/call x ~1000
    calls per 10 MiB archive)."""
    size = 1 << accuracy_log
    norm_np = np.asarray(norm, dtype=np.int64)
    nsym = len(norm_np)

    neg = norm_np == -1
    n_neg = int(neg.sum())
    high_threshold = size - 1 - n_neg
    total_spread = int(norm_np[norm_np > 0].sum())
    if total_spread != size - n_neg:
        raise corruption_detected("FSE table spread did not return to zero")

    # Symbol spread, identical to the decoder's: -1 symbols occupy the
    # table top (descending positions in ascending symbol order); the rest
    # follow the step-orbit, skipping cells above the high threshold.
    table_symbol = np.zeros(size, dtype=np.int64)
    if n_neg:
        table_symbol[size - n_neg :] = np.nonzero(neg)[0][::-1]
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    if total_spread:
        orbit = (np.arange(size, dtype=np.int64) * step) & mask
        positions = orbit[orbit <= high_threshold]
        spread_syms = np.repeat(
            np.arange(nsym, dtype=np.int64), np.clip(norm_np, 0, None)
        )
        table_symbol[positions] = spread_syms

    # state_table: the serial loop scans table positions in order and hands
    # each symbol its state slots in increasing order starting at cumul[s]
    # (= exclusive prefix of per-symbol cell counts). A stable argsort by
    # symbol reproduces that exact slot order: slot j holds position
    # order[j] (+ size).
    order = np.argsort(table_symbol, kind="stable")
    state_table = (order + size).astype(np.uint16)

    # Per-symbol deltas. For n in (1, -1) the general formula degenerates
    # to max_bits_out = accuracy_log, min_state_plus = size — the serial
    # code's special case — via n_eff = 1.
    counts = np.where(neg, 1, np.clip(norm_np, 0, None))
    zero = counts == 0
    n_eff = np.maximum(counts, 1)
    # floor(log2(n_eff - 1)) with the n_eff == 1 lane clamped (unused
    # there: frexp(1)[1] - 1 == 0 gives max_bits_out = accuracy_log).
    nm1 = np.maximum(n_eff - 1, 1)
    mbo = accuracy_log - (np.frexp(nm1.astype(np.float64))[1].astype(np.int64) - 1)
    delta_nb = np.where(
        zero, ((accuracy_log + 1) << 16) - size, (mbo << 16) - (n_eff << mbo)
    )
    excl = np.cumsum(counts) - counts
    delta_fs = np.where(zero, 0, excl - n_eff)
    return FseEncodeTable(
        accuracy_log, delta_nb, delta_fs, state_table, list(norm)
    )


class FseEncState:
    """One encoding state; symbols are fed in reverse stream order."""

    def __init__(self, table: FseEncodeTable, first_symbol: int):
        # Canonical zero-bit initialization for the chain's last symbol.
        t = table
        nb = (int(t.delta_nb_bits[first_symbol]) + (1 << 15)) >> 16
        value = (nb << 16) - int(t.delta_nb_bits[first_symbol])
        self.table = t
        self.state = int(t.state_table[(value >> nb) + int(t.delta_find_state[first_symbol])])

    def encode(self, bw, symbol: int) -> None:
        t = self.table
        nb = (self.state + int(t.delta_nb_bits[symbol])) >> 16
        bw.add(self.state, nb)
        self.state = int(
            t.state_table[(self.state >> nb) + int(t.delta_find_state[symbol])]
        )

    def flush(self, bw) -> None:
        bw.add(self.state, self.table.accuracy_log)


def write_ncount(norm, accuracy_log: int) -> bytes:
    """Serialize normalized counts as an FSE table description
    (inverse of read_ncount; RFC 8878 §4.1.1)."""
    from .bitstream import BitWriter

    bw = BitWriter()
    bw.add(accuracy_log - 5, 4)
    size = 1 << accuracy_log
    remaining = size + 1
    threshold = size
    nb_bits = accuracy_log + 1
    i = 0
    while remaining > 1:
        if i >= len(norm):
            raise corruption_detected("write_ncount: counts exhausted early")
        count = norm[i]
        stored = count + 1  # -1 encodes as 0
        maxv = (2 * threshold - 1) - remaining
        if stored < maxv:
            bw.add(stored, nb_bits - 1)
        else:
            val = stored if stored < threshold else stored + maxv
            bw.add(val, nb_bits)
        remaining -= -count if count < 0 else count
        i += 1
        if count == 0 and remaining > 1:
            # 2-bit runs describing how many further zeros follow; a field
            # value of 3 means "3 zeros, then another field".
            run = 0
            while i + run < len(norm) and norm[i + run] == 0:
                run += 1
            i += run
            while run >= 3:
                bw.add(3, 2)
                run -= 3
            bw.add(run, 2)
        while remaining < threshold:
            nb_bits -= 1
            threshold >>= 1
    if remaining != 1:
        raise corruption_detected("write_ncount: counts do not sum to table size")
    return bw.bytes_no_finish()


def fse_compress(symbols, max_symbol: int, max_log: int):
    """Compress a short symbol sequence with two interleaved states and an
    embedded table description (the Huffman-weights transport,
    RFC 8878 §4.2.1.2). Returns the payload or None when not beneficial."""
    from .bitstream import BitWriter

    n = len(symbols)
    if n <= 1:
        return None
    counts = [0] * (max_symbol + 1)
    for s in symbols:
        counts[s] += 1
    if max(counts) == n:
        return None  # single-symbol: FSE table would be degenerate
    log = optimal_table_log(max_log, n, max_symbol)
    norm = normalize_counts(counts, log, n, max_symbol)
    table = build_encode_table(norm, log)
    desc = write_ncount(norm, log)

    bw = BitWriter()
    # Two chains: state1 decodes symbols 0,2,4..., state2 decodes 1,3,5....
    # Symbols are encoded in reverse; the decoder's break-on-overflow tail
    # emits each chain's final symbol straight from its initial state.
    chain1 = symbols[0::2]
    chain2 = symbols[1::2]
    m1, m2 = len(chain1), len(chain2)
    if n % 2:
        s1 = FseEncState(table, chain1[-1])
        s2 = FseEncState(table, chain2[-1])
        s1.encode(bw, chain1[m1 - 2])  # odd count: one unpaired chain1 write
        top = m2 - 1
    else:
        s2 = FseEncState(table, chain2[-1])
        s1 = FseEncState(table, chain1[-1])
        top = m1 - 1
    for r in range(top - 1, -1, -1):
        s2.encode(bw, chain2[r])
        s1.encode(bw, chain1[r])
    s2.flush(bw)
    s1.flush(bw)
    payload = desc + bw.finish()
    return payload
