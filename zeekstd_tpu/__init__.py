"""zeekstd_tpu — a TPU-native seekable-Zstandard framework.

A from-scratch reimplementation of the capabilities of the zeekstd
reference (Rust + libzstd) with an idiomatic JAX/XLA/Pallas compute path:

- ``seek_table`` / ``seekable`` — the Zstandard Seekable Format v0.1.1
  metadata layer (Foot/Head layouts, legacy v0.1.0 parse).
- ``codec`` — a complete Zstandard codec (RFC 8878): FSE, Huffman, LZ77
  match finding, sequence execution, checksums. Host reference path +
  Pallas TPU kernels in ``ops``.
- ``encode`` / ``decode`` — streaming seekable Encoder/Decoder with
  frame-size policies, prefixes (binary patches), and byte/frame random
  access.
- ``parallel`` — data-parallel multi-frame encode/decode over a
  ``jax.sharding.Mesh``.
- ``cli`` — the ``zeekstd`` command line (compress/decompress/list).
"""

from .constants import (
    DEFAULT_COMPRESSION_LEVEL,
    DEFAULT_FRAME_SIZE,
    SEEK_TABLE_INTEGRITY_SIZE,
    SEEKABLE_MAGIC_NUMBER,
    SEEKABLE_MAX_FRAME_SIZE,
    SEEKABLE_MAX_FRAMES,
    SKIPPABLE_HEADER_SIZE,
    SKIPPABLE_MAGIC_NUMBER,
)
from .codec import CCtx, DCtx, compress_frame, decompress_frame
from .decode import DecodeOptions, Decoder
from .encode import (
    CompressionProgress,
    EncodeOptions,
    Encoder,
    EpilogueProgress,
    FrameSizePolicy,
    RawEncoder,
)
from .errors import (
    FrameIndexTooLargeError,
    NumberConversionError,
    OffsetOutOfRangeError,
    ZeekstdError,
    ZstdError,
)
from .seek_table import Format, Parser, SeekTable, Serializer
from .seekable import BytesWrapper, End, FileWrapper, Seekable, Start

__version__ = "0.1.0"

__all__ = [
    "CCtx",
    "DCtx",
    "compress_frame",
    "decompress_frame",
    "DecodeOptions",
    "Decoder",
    "CompressionProgress",
    "EpilogueProgress",
    "EncodeOptions",
    "Encoder",
    "FrameSizePolicy",
    "RawEncoder",
    "Format",
    "Parser",
    "SeekTable",
    "Serializer",
    "BytesWrapper",
    "End",
    "FileWrapper",
    "Seekable",
    "Start",
    "ZeekstdError",
    "ZstdError",
    "OffsetOutOfRangeError",
    "FrameIndexTooLargeError",
    "NumberConversionError",
]
