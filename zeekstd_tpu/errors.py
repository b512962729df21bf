"""Error taxonomy mirroring the reference's no_std error enum.

The reference wraps zstd error codes and adds seekable-specific kinds
(reference: lib/src/error.rs:1-128). We reproduce the same taxonomy so
callers can test error categories with the same predicates:
``is_offset_out_of_range``, ``is_frame_index_too_large``, ``is_zstd``, etc.
"""

from __future__ import annotations


class ZeekstdError(Exception):
    """Base error for the seekable framework."""

    kind: str = "generic"

    def is_offset_out_of_range(self) -> bool:
        return self.kind == "offset_out_of_range"

    def is_frame_index_too_large(self) -> bool:
        return self.kind == "frame_index_too_large"

    def is_number_conversion_failed(self) -> bool:
        return self.kind == "number_conversion_failed"

    def is_io(self) -> bool:
        return self.kind == "io"

    def is_zstd(self) -> bool:
        return self.kind == "zstd"


class NumberConversionError(ZeekstdError):
    """A numeric value does not fit the target field width
    (reference: lib/src/error.rs NumberConversionFailed)."""

    kind = "number_conversion_failed"


class OffsetOutOfRangeError(ZeekstdError):
    """A decompress offset/limit lies outside the archive
    (reference: lib/src/decode.rs:439-445)."""

    kind = "offset_out_of_range"


class FrameIndexTooLargeError(ZeekstdError):
    """A frame index exceeds the number of frames in the seek table
    (reference: lib/src/seek_table.rs:604-610)."""

    kind = "frame_index_too_large"


class IOError_(ZeekstdError):
    """Wrapped I/O failure (reference: lib/src/error.rs IO kind)."""

    kind = "io"


class ZstdError(ZeekstdError):
    """Codec-level error carrying a libzstd-compatible error *name*.

    The reference surfaces libzstd error codes (reference: lib/src/error.rs:40-45);
    we carry the symbolic name. The names used by the seek-table parser are
    ``prefix_unknown`` and ``corruption_detected``
    (reference: lib/src/seek_table.rs:146,151,180).
    """

    kind = "zstd"

    def __init__(self, name: str, message: str = ""):
        self.name = name
        super().__init__(f"zstd error: {name}" + (f": {message}" if message else ""))


def prefix_unknown(msg: str = "") -> ZstdError:
    return ZstdError("prefix_unknown", msg)


def corruption_detected(msg: str = "") -> ZstdError:
    return ZstdError("corruption_detected", msg)


def frame_index_too_large(msg: str = "") -> ZstdError:
    return ZstdError("frameIndex_tooLarge", msg)


def checksum_wrong(msg: str = "") -> ZstdError:
    return ZstdError("checksum_wrong", msg)


def src_size_wrong(msg: str = "") -> ZstdError:
    return ZstdError("srcSize_wrong", msg)


def dst_size_too_small(msg: str = "") -> ZstdError:
    return ZstdError("dstSize_tooSmall", msg)
