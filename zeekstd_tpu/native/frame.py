"""Python-facing adapters for the native runtime's frame codec."""

from __future__ import annotations

from ..errors import checksum_wrong
from . import loader


class NativeFrameEncoder:
    """FrameEncoder-compatible wrapper over zn_compress_frame.

    The native encoder is one-shot per frame, so input buffers until
    ``finish()``; the streaming layer's frame-size policy bounds the
    buffered amount (2 MiB by default).
    """

    def __init__(self, checksum: bool = False, prefix: bytes = b"", level: int = 1, ldm: bool = False):
        self.checksum = checksum
        self.prefix = prefix
        self.level = level
        self.ldm = ldm
        self._buf = bytearray()
        self.block_max = 1 << 17

    def compress(self, chunk: bytes) -> bytes:
        self._buf += chunk
        return b""

    def finish(self) -> bytes:
        return loader.compress_frame(
            bytes(self._buf), checksum=self.checksum, prefix=self.prefix,
            level=self.level, ldm=self.ldm,
        )

    @property
    def uncompressed_size(self) -> int:
        return len(self._buf)


def native_decompress_frame(data: bytes, max_size: int, prefix: bytes = b""):
    """Decode one frame natively, translating failures to the error
    taxonomy (falling back to the Python decoder for precise errors)."""
    try:
        return loader.decompress_frame(data, max_size, prefix=prefix)
    except RuntimeError as e:
        if "checksum" in str(e):
            raise checksum_wrong("content checksum mismatch") from None
        # Re-run the Python decoder to surface the precise taxonomy error.
        from ..codec.decompress import decompress_frame as py_decode

        out, end = py_decode(data, 0, prefix=prefix)
        return out, end
