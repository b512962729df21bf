"""Format constants for the Zstandard Seekable Format and the zstd frame format.

Seekable-format constants mirror the reference's public constants
(reference: lib/src/lib.rs:51-62) and the spec (reference: seekable_format.md).
Zstd frame constants follow RFC 8878.
"""

# --- Seekable format (reference: lib/src/lib.rs:51-62) ---

#: Magic number that identifies a seek table ("integrity" field trailer/leader).
SEEKABLE_MAGIC_NUMBER = 0x8F92_EAB1

#: Maximum number of frames a seek table can hold (2**27).
SEEKABLE_MAX_FRAMES = 0x0800_0000

#: Size in bytes of the seek-table integrity field
#: (Number_Of_Frames u32 + Seek_Table_Descriptor u8 + Seekable_Magic_Number u32).
SEEK_TABLE_INTEGRITY_SIZE = 9

#: Maximum compressed or decompressed size of a single frame (1 GiB).
SEEKABLE_MAX_FRAME_SIZE = 0x4000_0000

#: Size in bytes of a Zstandard skippable-frame header (magic u32 + size u32).
SKIPPABLE_HEADER_SIZE = 8

#: Magic number of the skippable frame holding the seek table:
#: ZSTD_MAGIC_SKIPPABLE_START | 0xE (reference: lib/src/seek_table.rs:89).
SKIPPABLE_MAGIC_NUMBER = 0x184D_2A5E

#: Serialized bytes per seek-table entry in format v0.1.1 (two u32s).
SIZE_PER_FRAME = 8

#: Serialized bytes per entry in legacy v0.1.0 tables with checksums.
SIZE_PER_FRAME_WITH_CHECKSUM = 12

#: Default frame size used by the uncompressed frame-size policy (2 MiB)
#: (reference: lib/src/encode.rs:36-38).
DEFAULT_FRAME_SIZE = 0x20_0000

# --- Zstandard frame format (RFC 8878) ---

#: Magic number at the start of every Zstandard compressed frame.
ZSTD_MAGIC_NUMBER = 0xFD2F_B528

#: First magic number of the skippable-frame range (0x184D2A50-0x184D2A5F).
ZSTD_MAGIC_SKIPPABLE_START = 0x184D_2A50
ZSTD_MAGIC_SKIPPABLE_MASK = 0xFFFF_FFF0

#: Maximum size of a single block within a frame (128 KiB).
ZSTD_BLOCK_SIZE_MAX = 1 << 17

#: Window-log bounds accepted by the codec.
ZSTD_WINDOWLOG_MIN = 10
ZSTD_WINDOWLOG_MAX = 31

#: Minimum match length representable by a sequence.
MINMATCH = 3

#: Compression-level bounds (CLI documents 1..=19; reference cli/src/args.rs:191-193).
MIN_COMPRESSION_LEVEL = 1
MAX_COMPRESSION_LEVEL = 19
DEFAULT_COMPRESSION_LEVEL = 3

#: Default input/output staging-buffer sizes, mirroring libzstd's
#: ZSTD_CStreamInSize/OutSize and ZSTD_DStreamInSize/OutSize hints
#: (reference: lib/src/encode.rs:599, lib/src/decode.rs:181-184).
CCTX_IN_SIZE = ZSTD_BLOCK_SIZE_MAX
CCTX_OUT_SIZE = ZSTD_BLOCK_SIZE_MAX + 4 + 3  # block + header margin
DCTX_IN_SIZE = ZSTD_BLOCK_SIZE_MAX + 3  # block + block-header carry
DCTX_OUT_SIZE = ZSTD_BLOCK_SIZE_MAX
