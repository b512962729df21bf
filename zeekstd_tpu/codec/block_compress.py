"""Per-block compression. Starts as store-mode (raw/RLE blocks) and is the
seam where the match finder + entropy encoders plug in."""

from __future__ import annotations

from . import frame as frame_mod


def compress_block(state, pos: int, size: int, last: bool) -> bytes:
    """Compress ``size`` bytes of ``state``'s data starting at frame offset
    ``pos``; returns block header + body bytes."""
    data = state.window[state.prefix_len + pos : state.prefix_len + pos + size]

    # RLE block when the whole block is one repeated byte.
    if size > 0 and data.count(data[0]) == size:
        return frame_mod.write_block_header(last, frame_mod.BLOCK_RLE, size) + data[:1]

    # TODO(match-finder): compressed blocks via LZ77 + Huffman/FSE.
    return frame_mod.write_block_header(last, frame_mod.BLOCK_RAW, size) + data
