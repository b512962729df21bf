"""Per-block compression: match finding, literals section (raw/RLE/Huffman),
sequences section, and the raw-block fallback."""

from __future__ import annotations

from . import frame as frame_mod
from . import huffman
from .literals import LIT_COMPRESSED, LIT_RAW, LIT_RLE, write_literals_header
from .match import MatchState, find_sequences
from .seq_encode import encode_sequences_section


def encode_literals_section(literals: bytes) -> bytes:
    """Serialize the literals section, choosing the cheapest representation."""
    n = len(literals)
    if n == 0:
        return write_literals_header(LIT_RAW, 0, 0, False)
    first = literals[0]
    if literals.count(first) == n:
        return write_literals_header(LIT_RLE, n, 0, False) + bytes([first])

    raw = write_literals_header(LIT_RAW, n, 0, False) + literals
    if n < 32:
        return raw  # too small for entropy coding to pay off

    freqs = {}
    for b in literals:
        freqs[b] = freqs.get(b, 0) + 1
    if len(freqs) < 2:
        return raw
    lengths = huffman.package_merge_lengths(freqs)
    weights = huffman.lengths_to_weights(lengths, max(freqs))
    try:
        tree = huffman.write_weights(weights)
        codes, nb, _ = huffman.build_encode_table(weights)
    except Exception:
        return raw

    if n < 256:
        stream = huffman.compress_literals_1stream(literals, codes, nb)
        four = False
    else:
        stream = huffman.compress_literals_4stream(literals, codes, nb)
        four = True
        if stream is None:
            return raw
    payload = tree + stream
    try:
        header = write_literals_header(LIT_COMPRESSED, n, len(payload), four)
    except Exception:
        return raw
    if len(header) + len(payload) >= len(raw):
        return raw
    return header + payload


def compress_block(state, pos: int, size: int, last: bool) -> bytes:
    """Compress ``size`` bytes at frame offset ``pos``; returns block header +
    body. Falls back to raw/RLE blocks when entropy coding does not pay."""
    wstart = state.prefix_len + pos
    wend = wstart + size
    data = bytes(state.window[wstart:wend])

    if size > 0 and data.count(data[0]) == size:
        return frame_mod.write_block_header(last, frame_mod.BLOCK_RLE, size) + data[:1]

    if state.match_state is None:
        state.match_state = MatchState(len(state.window))
        if state.prefix_len:
            # Index the referenced prefix so matches can reach into it
            # (the ref_prefix contract; reference: lib/src/encode.rs:332-338).
            from .match import bulk_insert

            bulk_insert(
                state.match_state,
                state.window,
                0,
                state.prefix_len,
                state.params.hash_bytes,
            )

    seqs, literals, new_reps = find_sequences(
        state.window,
        wstart,
        wend,
        state.params,
        state.match_state,
        state.rep_offsets,
        max_dist=state.max_offset,
    )
    body = encode_literals_section(literals) + encode_sequences_section(seqs)

    if len(body) >= size:
        # Raw fallback: decoder never sees the sequences, so the repeat
        # history must not advance.
        return frame_mod.write_block_header(last, frame_mod.BLOCK_RAW, size) + data

    state.rep_offsets = new_reps
    return frame_mod.write_block_header(last, frame_mod.BLOCK_COMPRESSED, len(body)) + body
