"""Zstd frame headers, block headers, and skippable frames (RFC 8878 §3.1.1).

Shared by the decoder (parse) and encoder (write). The reference gets these
from libzstd's frame layer (SURVEY §2.3); here they are explicit.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from ..constants import (
    ZSTD_BLOCK_SIZE_MAX,
    ZSTD_MAGIC_NUMBER,
    ZSTD_MAGIC_SKIPPABLE_MASK,
    ZSTD_MAGIC_SKIPPABLE_START,
)
from ..errors import corruption_detected, prefix_unknown

BLOCK_RAW = 0
BLOCK_RLE = 1
BLOCK_COMPRESSED = 2


@dataclass
class FrameHeader:
    window_size: int
    content_size: int | None  # None when not provided
    has_checksum: bool
    dict_id: int
    single_segment: bool
    header_size: int  # bytes incl. magic


def parse_frame_header(data: bytes) -> FrameHeader:
    if len(data) < 5:
        raise corruption_detected("frame too short for header")
    (magic,) = struct.unpack_from("<I", data)
    if magic != ZSTD_MAGIC_NUMBER:
        if (magic & ZSTD_MAGIC_SKIPPABLE_MASK) == ZSTD_MAGIC_SKIPPABLE_START:
            raise prefix_unknown("skippable frame where zstd frame expected")
        raise prefix_unknown("bad zstd frame magic")
    fhd = data[4]
    fcs_flag = fhd >> 6
    single_segment = bool(fhd & 0x20)
    if fhd & 0x08:
        raise corruption_detected("reserved frame-header bit set")
    has_checksum = bool(fhd & 0x04)
    dict_id_flag = fhd & 0x03

    pos = 5
    window_size = None
    if not single_segment:
        if len(data) < pos + 1:
            raise corruption_detected("truncated window descriptor")
        wd = data[pos]
        pos += 1
        exponent = wd >> 3
        mantissa = wd & 7
        window_base = 1 << (10 + exponent)
        window_size = window_base + (window_base // 8) * mantissa

    dict_id = 0
    did_bytes = (0, 1, 2, 4)[dict_id_flag]
    if did_bytes:
        if len(data) < pos + did_bytes:
            raise corruption_detected("truncated dictionary id")
        dict_id = int.from_bytes(data[pos : pos + did_bytes], "little")
        pos += did_bytes

    fcs_bytes = (0, 2, 4, 8)[fcs_flag]
    if fcs_flag == 0 and single_segment:
        fcs_bytes = 1
    content_size = None
    if fcs_bytes:
        if len(data) < pos + fcs_bytes:
            raise corruption_detected("truncated frame content size")
        content_size = int.from_bytes(data[pos : pos + fcs_bytes], "little")
        if fcs_bytes == 2:
            content_size += 256
        pos += fcs_bytes

    if single_segment:
        window_size = content_size

    return FrameHeader(
        window_size=window_size,
        content_size=content_size,
        has_checksum=has_checksum,
        dict_id=dict_id,
        single_segment=single_segment,
        header_size=pos,
    )


def write_frame_header(
    content_size: int | None,
    window_size: int,
    checksum: bool,
    single_segment: bool = False,
) -> bytes:
    """Emit magic + frame header. ``content_size=None`` omits FCS (unknown)."""
    fhd = 0
    if checksum:
        fhd |= 0x04
    body = b""

    if single_segment and content_size is not None:
        fhd |= 0x20
        if content_size <= 0xFF:
            fcs_flag, fcs_bytes = 0, 1
        elif content_size <= 0xFFFF + 256:
            fcs_flag, fcs_bytes = 1, 2
        elif content_size <= 0xFFFF_FFFF:
            fcs_flag, fcs_bytes = 2, 4
        else:
            fcs_flag, fcs_bytes = 3, 8
        fhd |= fcs_flag << 6
        val = content_size - 256 if fcs_flag == 1 else content_size
        body += val.to_bytes(fcs_bytes, "little")
    else:
        # Window descriptor: smallest (exponent, mantissa) covering the size.
        exponent = max(window_size.bit_length() - 1, 10)
        base = 1 << exponent
        if base == window_size:
            mantissa = 0
        else:
            mantissa = -(-(window_size - base) * 8 // base)
            if mantissa > 7:
                exponent += 1
                mantissa = 0
        body_wd = bytes([((exponent - 10) << 3) | mantissa])
        if content_size is None:
            fcs_flag = 0
            fcs = b""
        elif content_size >= 256 and content_size <= 0xFFFF + 256:
            fcs_flag = 1
            fcs = (content_size - 256).to_bytes(2, "little")
        elif content_size <= 0xFFFF_FFFF:
            # fcs_flag 0 without single-segment means "no FCS"; use 4 bytes.
            fcs_flag = 2
            fcs = content_size.to_bytes(4, "little")
        else:
            fcs_flag = 3
            fcs = content_size.to_bytes(8, "little")
        fhd |= fcs_flag << 6
        body = body_wd + fcs

    return struct.pack("<IB", ZSTD_MAGIC_NUMBER, fhd) + body


def parse_block_header(data: bytes):
    """Returns (last_block, block_type, block_size, 3)."""
    if len(data) < 3:
        raise corruption_detected("truncated block header")
    val = data[0] | (data[1] << 8) | (data[2] << 16)
    last = bool(val & 1)
    btype = (val >> 1) & 3
    size = val >> 3
    if btype == 3:
        raise corruption_detected("reserved block type")
    return last, btype, size, 3


def write_block_header(last: bool, btype: int, size: int) -> bytes:
    if size >= (1 << 21):
        raise corruption_detected(f"block size {size} exceeds 21-bit field")
    val = (size << 3) | (btype << 1) | int(last)
    return bytes([val & 0xFF, (val >> 8) & 0xFF, (val >> 16) & 0xFF])


def block_size_max(window_size: int) -> int:
    return min(window_size, ZSTD_BLOCK_SIZE_MAX)
