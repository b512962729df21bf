"""Bitstream readers/writers for the zstd entropy layers.

zstd uses two bit-level conventions (RFC 8878 §3.1.1.3 / §4.1):

- **Forward** LSB-first reading, used by FSE table descriptions: bit ``i`` of
  the stream is bit ``i & 7`` of byte ``i >> 3``.
- **Backward** reading, used by FSE/Huffman payload bitstreams: the stream is
  written LSB-first but decoded from the end. The last non-zero byte carries
  a 1-bit sentinel in its highest set bit; reading N bits takes the N highest
  remaining bits.

These host-side readers are the bit-exact reference; the Pallas kernels in
``zeekstd_tpu.ops`` implement the same conventions vectorized.
"""

from __future__ import annotations

from ..errors import corruption_detected


def _mask(n: int) -> int:
    return (1 << n) - 1


class ForwardBitReader:
    """LSB-first forward bit reader (FSE table descriptions)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.bitpos = pos * 8

    def read(self, n: int) -> int:
        val = self.peek(n)
        self.bitpos += n
        return val

    def peek(self, n: int) -> int:
        lo = self.bitpos
        byte0 = lo >> 3
        window = int.from_bytes(self.data[byte0 : byte0 + 8], "little")
        return (window >> (lo & 7)) & _mask(n)

    def skip(self, n: int) -> None:
        self.bitpos += n

    @property
    def bytes_consumed(self) -> int:
        """Bytes consumed, rounded up to a whole byte."""
        return (self.bitpos + 7) >> 3


class BackwardBitReader:
    """Backward bit reader over a complete bitstream slice.

    ``read(n)`` returns the n highest remaining bits (the last-written value
    first). ``remaining`` may go negative when decoders probe past the end
    (the FSE weight decoder relies on this to detect stream exhaustion);
    out-of-range bits read as zero.
    """

    def __init__(self, data: bytes):
        if not data or data[-1] == 0:
            raise corruption_detected("bitstream: missing sentinel bit")
        self.data = data
        # Total payload bits: everything below the sentinel (the highest set
        # bit of the final byte).
        last = data[-1]
        self.remaining = (len(data) - 1) * 8 + (last.bit_length() - 1)

    def read(self, n: int) -> int:
        self.remaining -= n
        if n == 0:
            return 0
        lo = self.remaining
        if lo >= 0:
            byte0 = lo >> 3
            window = int.from_bytes(self.data[byte0 : byte0 + 9], "little")
            return (window >> (lo & 7)) & _mask(n)
        # Over-read past the start: upper bits come from the stream start,
        # missing low bits are zero-filled.
        avail = n + lo  # bits actually present
        if avail <= 0:
            return 0
        window = int.from_bytes(self.data[:8], "little")
        return (window & _mask(avail)) << (-lo)

    @property
    def exhausted(self) -> bool:
        return self.remaining <= 0

    @property
    def overflowed(self) -> bool:
        return self.remaining < 0


class BitWriter:
    """LSB-first bit writer producing backward-readable streams.

    Values appended earlier are read later by ``BackwardBitReader``; call
    ``finish()`` to append the sentinel bit and byte-align.
    """

    def __init__(self):
        self._acc = 0
        self._nbits = 0
        self._out = bytearray()

    def add(self, value: int, nbits: int) -> None:
        self._acc |= (value & _mask(nbits)) << self._nbits
        self._nbits += nbits
        while self._nbits >= 8:
            self._out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._nbits -= 8

    def add_unmasked(self, value: int, nbits: int) -> None:
        self.add(value, nbits)

    @property
    def bit_length(self) -> int:
        return len(self._out) * 8 + self._nbits

    def finish(self) -> bytes:
        """Append the closing sentinel bit and flush."""
        self.add(1, 1)
        if self._nbits:
            self._out.append(self._acc & 0xFF)
            self._acc = 0
            self._nbits = 0
        return bytes(self._out)

    def bytes_no_finish(self) -> bytes:
        """Flush to whole bytes without a sentinel (forward streams that are
        byte-aligned by padding with zero bits, e.g. FSE table descriptions)."""
        if self._nbits:
            self._out.append(self._acc & 0xFF)
            self._acc = 0
            self._nbits = 0
        return bytes(self._out)


def pack_bits_numpy(values, nbits) -> bytes:
    """Vectorized LSB-first bit packing with closing sentinel (numpy twin of
    ops/bitpack.pack_bits + finish): values/nbits are integer arrays."""
    import numpy as np

    values = np.asarray(values, dtype=np.uint64)
    nbits = np.asarray(nbits, dtype=np.int64)
    mask = np.where(nbits >= 64, ~np.uint64(0), (np.uint64(1) << nbits.astype(np.uint64)) - np.uint64(1))
    values = values & mask
    offsets = np.cumsum(nbits) - nbits
    total = int(nbits.sum())
    nwords = total // 32 + 3
    w = (offsets >> 5).astype(np.int64)
    sh = (offsets & 31).astype(np.uint64)
    lo = (values << sh) & np.uint64(0xFFFFFFFF)
    hi = (values >> (np.uint64(32) - sh)) & np.uint64(0xFFFFFFFF)
    hi = np.where(sh == 0, np.uint64(0), hi)
    # values can span 3 words when nbits + sh > 64
    hi2 = np.where(sh == 0, np.uint64(0), values >> (np.uint64(64) - sh)) & np.uint64(0xFFFFFFFF)
    words = np.zeros(nwords, np.uint64)
    np.add.at(words, w, lo)
    np.add.at(words, w + 1, hi)
    np.add.at(words, w + 2, hi2)
    raw = words.astype("<u4").tobytes()
    nbytes = total // 8 + 1
    buf = bytearray(raw[:nbytes])
    while len(buf) < nbytes:
        buf.append(0)
    buf[total // 8] |= 1 << (total % 8)
    return bytes(buf)
