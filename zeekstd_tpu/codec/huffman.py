"""Huffman (HUF) literal coding: weight parse, table build, 1/4-stream decode.

Implements RFC 8878 §4.2: canonical prefix codes described by weights
(``nb_bits = max_bits + 1 - weight``), transmitted either as direct 4-bit
nibbles or FSE-compressed; decoding via a single-level table indexed by the
top ``max_bits`` bits of a backward bitstream. Replaces libzstd's HUF engine
(reference dependency, SURVEY §2.3).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..errors import corruption_detected
from .bitstream import BackwardBitReader
from .fse import fse_decompress

HUF_MAX_BITS = 11  # zstd caps literal code length at 11 bits
HUF_MAX_SYMBOLS = 256


@dataclass
class HufDecodeTable:
    max_bits: int
    symbol: np.ndarray  # uint8[2**max_bits]
    nb_bits: np.ndarray  # uint8[2**max_bits]
    weights: np.ndarray  # uint8[num_symbols] (for re-serialization/debug)


# Tree descriptions repeat heavily across a corpus's blocks; both the
# weight parse (a serial two-state FSE loop) and the table build are pure
# functions of their exact input bytes, so small keyed caches turn the
# decode planner's hottest host loops into dict hits.
_weights_cache: dict = {}
_dec_table_cache: dict = {}


def read_weights(data: bytes):
    """Parse the Huffman tree description (RFC 8878 §4.2.1).

    Returns ``(weights, bytes_consumed)``; the implied last weight is
    appended by ``build_decode_table``.
    """
    if not data:
        raise corruption_detected("empty Huffman tree description")
    header = data[0]
    desc_len = 1 + ((header - 127 + 1) // 2 if header >= 128 else header)
    key = bytes(data[: min(desc_len, len(data))])
    hit = _weights_cache.get(key)
    if hit is not None:
        return list(hit[0]), hit[1]
    if header >= 128:
        # Direct representation: (header - 127) weights, 4 bits each.
        n = header - 127
        nbytes = (n + 1) // 2
        if len(data) < 1 + nbytes:
            raise corruption_detected("truncated direct Huffman weights")
        weights = []
        for i in range(n):
            b = data[1 + i // 2]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        if len(_weights_cache) > 4096:
            _weights_cache.clear()
        _weights_cache[key] = (tuple(weights), 1 + nbytes)
        return weights, 1 + nbytes
    # FSE-compressed: `header` bytes of FSE stream, max accuracy log 6.
    if len(data) < 1 + header:
        raise corruption_detected("truncated FSE Huffman weights")
    weights = fse_decompress(data[1 : 1 + header], 15, 6, 255)
    if len(_weights_cache) > 4096:
        _weights_cache.clear()
    _weights_cache[key] = (tuple(weights), 1 + header)
    return weights, 1 + header


def build_decode_table(weights) -> HufDecodeTable:
    """Build the flat decode table, deriving the implied final weight
    (RFC 8878 §4.2.1.1)."""
    key = bytes(weights)
    hit = _dec_table_cache.get(key)
    if hit is not None:
        return hit
    if any(w > HUF_MAX_BITS for w in weights):
        raise corruption_detected("Huffman weight too large")
    total = sum((1 << w) >> 1 for w in weights)
    if total == 0:
        raise corruption_detected("Huffman weights all zero")
    max_bits = total.bit_length()  # log2 of next power of two above total
    left = (1 << max_bits) - total
    # The last symbol's contribution must complete a power of two.
    if left & (left - 1):
        raise corruption_detected("Huffman weights do not sum to a power of two")
    last_weight = left.bit_length()  # log2(left) + 1
    weights = list(weights) + [last_weight]
    if max_bits > HUF_MAX_BITS:
        raise corruption_detected("Huffman table log too large")
    if len(weights) > HUF_MAX_SYMBOLS:
        raise corruption_detected("too many Huffman symbols")

    size = 1 << max_bits
    symbol = np.zeros(size, dtype=np.uint8)
    nb = np.zeros(size, dtype=np.uint8)

    # Symbols sorted by weight (ascending), then symbol order: each occupies
    # 2**(w-1) consecutive cells starting at its rank position.
    rank_count = [0] * (HUF_MAX_BITS + 2)
    for w in weights:
        rank_count[w] += 1
    rank_start = [0] * (HUF_MAX_BITS + 2)
    pos = 0
    for w in range(1, HUF_MAX_BITS + 2):
        rank_start[w] = pos
        pos += rank_count[w] << (w - 1)
    if pos != size:
        raise corruption_detected("Huffman table fill mismatch")

    for s, w in enumerate(weights):
        if w == 0:
            continue
        length = 1 << (w - 1)
        start = rank_start[w]
        symbol[start : start + length] = s
        nb[start : start + length] = max_bits + 1 - w
        rank_start[w] += length

    t = HufDecodeTable(max_bits, symbol, nb, np.array(weights, dtype=np.uint8))
    if len(_dec_table_cache) > 4096:
        _dec_table_cache.clear()
    _dec_table_cache[key] = t
    return t


def decode_stream(table: HufDecodeTable, data: bytes, out_len: int) -> bytes:
    """Decode one backward Huffman bitstream to exactly ``out_len`` bytes."""
    br = BackwardBitReader(data)
    max_bits = table.max_bits
    symbol = table.symbol
    nb = table.nb_bits
    out = bytearray(out_len)
    rem = br.remaining
    for i in range(out_len):
        idx = br.read(max_bits)
        n = int(nb[idx])
        br.remaining += max_bits - n  # consume only nb bits of the peek
        out[i] = int(symbol[idx])
    if br.remaining != 0:
        raise corruption_detected(
            f"Huffman stream not fully consumed ({br.remaining} bits left of {rem})"
        )
    return bytes(out)


def decode_1stream(table: HufDecodeTable, data: bytes, regenerated_size: int) -> bytes:
    return decode_stream(table, data, regenerated_size)


def decode_4stream(table: HufDecodeTable, data: bytes, regenerated_size: int) -> bytes:
    """Decode the 4-stream layout: 6-byte jump table then four independent
    backward streams (RFC 8878 §4.2.2)."""
    if len(data) < 6:
        raise corruption_detected("4-stream literals too short")
    s1 = int.from_bytes(data[0:2], "little")
    s2 = int.from_bytes(data[2:4], "little")
    s3 = int.from_bytes(data[4:6], "little")
    total = len(data) - 6
    s4 = total - s1 - s2 - s3
    if s4 < 0:
        raise corruption_detected("4-stream jump table exceeds payload")
    seg = (regenerated_size + 3) // 4
    last = regenerated_size - 3 * seg
    if last < 0:
        raise corruption_detected("regenerated size too small for 4 streams")
    off = 6
    parts = []
    for size, olen in ((s1, seg), (s2, seg), (s3, seg), (s4, last)):
        parts.append(decode_stream(table, data[off : off + size], olen))
        off += size
    return b"".join(parts)


# --- encoding side -------------------------------------------------------


def package_merge_lengths(freqs, max_len: int = HUF_MAX_BITS):
    """Optimal length-limited code lengths via package-merge.

    ``freqs``: dict or sequence of (symbol -> count), only present symbols.
    Returns {symbol: code_length}; the resulting code is complete
    (Kraft sum == 1), as the zstd weight scheme requires.
    """
    syms = [(c, s) for s, c in freqs.items() if c > 0]
    if len(syms) == 1:
        return {syms[0][1]: 1}
    if (1 << max_len) < len(syms):
        raise corruption_detected("too many symbols for max code length")
    originals = sorted(syms)
    prev = []
    for _ in range(max_len):
        # Package pairs from the previous level, then merge with originals.
        packages = [
            (prev[i][0] + prev[i + 1][0], prev[i][1] + prev[i + 1][1])
            for i in range(0, len(prev) - 1, 2)
        ]
        cur = []
        items = [(c, (s,)) for c, s in originals]
        ai = pi = 0
        while ai < len(items) or pi < len(packages):
            if pi >= len(packages) or (
                ai < len(items) and items[ai][0] <= packages[pi][0]
            ):
                cur.append(items[ai])
                ai += 1
            else:
                cur.append(packages[pi])
                pi += 1
        prev = cur
    chosen = prev[: 2 * len(syms) - 2]
    lengths = {s: 0 for _, s in syms}
    for _, group in chosen:
        for s in group:
            lengths[s] += 1
    return lengths


def build_encode_table(weights_by_symbol):
    """Canonical code assignment consistent with ``build_decode_table``:
    symbols sorted by (weight asc, symbol asc); code = cell_start >> (w-1).

    ``weights_by_symbol``: uint8 array over 0..max_symbol (0 = absent).
    Returns (codes, nb_bits, max_bits).
    """
    weights = list(weights_by_symbol)
    max_w = max(weights)
    total = sum((1 << w) >> 1 for w in weights)
    max_bits = (total - 1).bit_length() if total & (total - 1) else total.bit_length() - 1
    if (1 << max_bits) != total:
        raise corruption_detected("encode weights must form a complete code")

    rank_start = [0] * (max_w + 2)
    rank_count = [0] * (max_w + 2)
    for w in weights:
        rank_count[w] += 1
    pos = 0
    for w in range(1, max_w + 1):
        rank_start[w] = pos
        pos += rank_count[w] << (w - 1)

    n = len(weights)
    codes = [0] * n
    nb = [0] * n
    fill = list(rank_start)
    for s, w in enumerate(weights):
        if w == 0:
            continue
        codes[s] = fill[w] >> (w - 1)
        nb[s] = max_bits + 1 - w
        fill[w] += 1 << (w - 1)
    import numpy as np  # local to keep module import light

    return np.array(codes, dtype=np.uint32), np.array(nb, dtype=np.uint8), max_bits


def lengths_to_weights(lengths, max_symbol: int):
    """Convert code lengths to the zstd weight array over 0..max_symbol."""
    max_len = max(lengths.values())
    weights = [0] * (max_symbol + 1)
    for s, ln in lengths.items():
        if ln:
            weights[s] = max_len + 1 - ln
    return weights


def write_weights(weights) -> bytes:
    """Serialize weights (RFC 8878 §4.2.1): FSE-compressed when smaller,
    else direct 4-bit nibbles. The last present symbol's weight is implied."""
    from .fse import fse_compress, fse_decompress

    last = max(s for s, w in enumerate(weights) if w > 0)
    emitted = list(weights[:last])  # weight of `last` is implied
    if not emitted:
        raise corruption_detected("cannot serialize single-symbol Huffman table")

    direct_n = len(emitted)
    direct = None
    if direct_n <= 128:  # direct header byte is 127 + n, capped at 255
        direct = bytearray([127 + direct_n])
        for i in range(0, direct_n, 2):
            hi = emitted[i] << 4
            lo = emitted[i + 1] if i + 1 < direct_n else 0
            direct.append(hi | lo)

    if direct_n > 1:
        payload = fse_compress(emitted, 15, 6)
        if (
            payload is not None
            and len(payload) < 128
            and (direct is None or len(payload) + 1 < len(direct))
        ):
            # Self-check: the implied-length decode must reproduce exactly.
            try:
                back = fse_decompress(payload, 15, 6, 255)
            except Exception:
                back = None
            if back == emitted:
                return bytes([len(payload)]) + payload
    if direct is None:
        raise corruption_detected("Huffman weights not serializable")
    return bytes(direct)


def encode_stream(data, codes, nb) -> bytes:
    """Encode one literal run as a backward Huffman bitstream (vectorized)."""
    from .bitstream import pack_bits_numpy

    arr = np.frombuffer(bytes(data), np.uint8)[::-1]
    return pack_bits_numpy(codes[arr], nb[arr])


def compress_literals_1stream(data, codes, nb) -> bytes:
    return encode_stream(data, codes, nb)


def compress_literals_4stream(data, codes, nb):
    """Encode the 4-stream layout; returns payload or None if a stream's
    size field would overflow its u16."""
    n = len(data)
    seg = (n + 3) // 4
    parts = [
        encode_stream(data[0:seg], codes, nb),
        encode_stream(data[seg : 2 * seg], codes, nb),
        encode_stream(data[2 * seg : 3 * seg], codes, nb),
        encode_stream(data[3 * seg :], codes, nb),
    ]
    if any(len(p) > 0xFFFF for p in parts[:3]):
        return None
    jump = b"".join(len(p).to_bytes(2, "little") for p in parts[:3])
    return jump + b"".join(parts)
