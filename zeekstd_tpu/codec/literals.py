"""Literals section: header parse/serialize and decode (RFC 8878 §3.1.1.3.1)."""

from __future__ import annotations

from dataclasses import dataclass

from ..errors import corruption_detected
from . import huffman

LIT_RAW = 0
LIT_RLE = 1
LIT_COMPRESSED = 2
LIT_TREELESS = 3


@dataclass
class LiteralsSection:
    lit_type: int
    regenerated_size: int
    compressed_size: int  # payload size incl. tree description (0 for raw/rle meaningfully)
    four_streams: bool
    header_size: int


def parse_literals_header(data: bytes) -> LiteralsSection:
    if not data:
        raise corruption_detected("empty literals section")
    b0 = data[0]
    lit_type = b0 & 3
    size_format = (b0 >> 2) & 3

    if lit_type in (LIT_RAW, LIT_RLE):
        if size_format in (0, 2):
            # 1-byte header, 5-bit size (size_format bit0 unused).
            return LiteralsSection(lit_type, b0 >> 3, 0, False, 1)
        if size_format == 1:
            if len(data) < 2:
                raise corruption_detected("truncated literals header")
            return LiteralsSection(lit_type, (b0 >> 4) + (data[1] << 4), 0, False, 2)
        if len(data) < 3:
            raise corruption_detected("truncated literals header")
        return LiteralsSection(
            lit_type, (b0 >> 4) + (data[1] << 4) + (data[2] << 12), 0, False, 3
        )

    # Compressed / Treeless
    if size_format == 0:
        # 1 stream, 10-bit sizes, 3-byte header.
        if len(data) < 3:
            raise corruption_detected("truncated literals header")
        bits = b0 | (data[1] << 8) | (data[2] << 16)
        regen = (bits >> 4) & 0x3FF
        comp = (bits >> 14) & 0x3FF
        return LiteralsSection(lit_type, regen, comp, False, 3)
    if size_format == 1:
        if len(data) < 3:
            raise corruption_detected("truncated literals header")
        bits = b0 | (data[1] << 8) | (data[2] << 16)
        regen = (bits >> 4) & 0x3FF
        comp = (bits >> 14) & 0x3FF
        return LiteralsSection(lit_type, regen, comp, True, 3)
    if size_format == 2:
        if len(data) < 4:
            raise corruption_detected("truncated literals header")
        bits = b0 | (data[1] << 8) | (data[2] << 16) | (data[3] << 24)
        regen = (bits >> 4) & 0x3FFF
        comp = (bits >> 18) & 0x3FFF
        return LiteralsSection(lit_type, regen, comp, True, 4)
    if len(data) < 5:
        raise corruption_detected("truncated literals header")
    bits = (
        b0 | (data[1] << 8) | (data[2] << 16) | (data[3] << 24) | (data[4] << 32)
    )
    regen = (bits >> 4) & 0x3FFFF
    comp = (bits >> 22) & 0x3FFFF
    return LiteralsSection(lit_type, regen, comp, True, 5)


def decode_literals(data: bytes, prev_table):
    """Decode a literals section. Returns (literals, bytes_consumed, huf_table)
    where huf_table is the table to carry for Treeless_Literals reuse."""
    sec = parse_literals_header(data)
    pos = sec.header_size

    if sec.lit_type == LIT_RAW:
        end = pos + sec.regenerated_size
        if len(data) < end:
            raise corruption_detected("truncated raw literals")
        return bytes(data[pos:end]), end, prev_table
    if sec.lit_type == LIT_RLE:
        if len(data) < pos + 1:
            raise corruption_detected("truncated RLE literal")
        return bytes([data[pos]]) * sec.regenerated_size, pos + 1, prev_table

    payload = data[pos : pos + sec.compressed_size]
    if len(payload) < sec.compressed_size:
        raise corruption_detected("truncated compressed literals")

    if sec.lit_type == LIT_COMPRESSED:
        weights, consumed = huffman.read_weights(payload)
        table = huffman.build_decode_table(weights)
        payload = payload[consumed:]
    else:  # Treeless: reuse the previous block's table
        if prev_table is None:
            raise corruption_detected("treeless literals without previous table")
        table = prev_table

    if sec.four_streams:
        lits = huffman.decode_4stream(table, payload, sec.regenerated_size)
    else:
        lits = huffman.decode_1stream(table, payload, sec.regenerated_size)
    return lits, pos + sec.compressed_size, table


def write_literals_header(
    lit_type: int, regenerated_size: int, compressed_size: int, four_streams: bool
) -> bytes:
    """Serialize a literals-section header choosing the smallest size format."""
    if lit_type in (LIT_RAW, LIT_RLE):
        if regenerated_size < 32:
            return bytes([lit_type | (regenerated_size << 3)])
        if regenerated_size < 1 << 12:
            v = lit_type | (1 << 2) | (regenerated_size << 4)
            return v.to_bytes(2, "little")
        if regenerated_size < 1 << 20:
            v = lit_type | (3 << 2) | (regenerated_size << 4)
            return v.to_bytes(3, "little")
        raise corruption_detected("literals too large for header")
    if not four_streams:
        if regenerated_size >= 1 << 10 or compressed_size >= 1 << 10:
            raise corruption_detected("1-stream literals sizes exceed 10 bits")
        v = lit_type | (0 << 2) | (regenerated_size << 4) | (compressed_size << 14)
        return v.to_bytes(3, "little")
    if regenerated_size < 1 << 10 and compressed_size < 1 << 10:
        v = lit_type | (1 << 2) | (regenerated_size << 4) | (compressed_size << 14)
        return v.to_bytes(3, "little")
    if regenerated_size < 1 << 14 and compressed_size < 1 << 14:
        v = lit_type | (2 << 2) | (regenerated_size << 4) | (compressed_size << 18)
        return v.to_bytes(4, "little")
    if regenerated_size < 1 << 18 and compressed_size < 1 << 18:
        v = lit_type | (3 << 2) | (regenerated_size << 4) | (compressed_size << 22)
        return v.to_bytes(5, "little")
    raise corruption_detected("literals too large for header")
