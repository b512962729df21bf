"""TPU-native Zstandard codec.

The reference delegates all entropy coding to libzstd (reference:
Cargo.toml workspace dep zstd-safe; SURVEY §2.3); this package reimplements
the codec itself: frame parsing, FSE (tANS), Huffman, sequence execution,
match finding, and bitstream pack/unpack. The host path here is the
bit-exact reference implementation; `zeekstd_tpu.ops` provides the Pallas
TPU kernels that accelerate the hot stages and are tested against this path.
"""

from .decompress import decompress_frame, DCtx
from .compress import compress_frame, CCtx

__all__ = ["decompress_frame", "DCtx", "compress_frame", "CCtx"]
