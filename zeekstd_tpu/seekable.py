"""Source abstraction for seekable archives.

Mirrors the reference's ``Seekable`` trait (reference: lib/src/seekable.rs:16-39):
``set_offset(OffsetFrom) -> int``, ``read(n) -> bytes`` and
``seek_table_integrity(format) -> bytes`` (the 9-byte integrity field; Foot:
last 9 bytes of the source, Head: bytes 8..17). ``BytesWrapper`` adapts an
in-memory buffer (reference: lib/src/seekable.rs:41-97); any file-like object
with ``read``/``seek`` is adapted by ``as_seekable`` (blanket impl at
lib/src/seekable.rs:111-138).
"""

from __future__ import annotations

import io
import os
from dataclasses import dataclass
from typing import Union

from .constants import SEEK_TABLE_INTEGRITY_SIZE, SKIPPABLE_HEADER_SIZE
from .errors import IOError_, NumberConversionError


@dataclass(frozen=True)
class Start:
    """Absolute offset from the start of the source."""

    offset: int


@dataclass(frozen=True)
class End:
    """Offset relative to the end of the source (non-positive)."""

    offset: int


OffsetFrom = Union[Start, End]


class Seekable:
    """Abstract random-access byte source."""

    def set_offset(self, offset: OffsetFrom) -> int:
        raise NotImplementedError

    def read(self, n: int) -> bytes:
        raise NotImplementedError

    def seek_table_integrity(self, fmt) -> bytes:
        from .seek_table import Format

        if fmt == Format.HEAD:
            self.set_offset(Start(SKIPPABLE_HEADER_SIZE))
        else:
            self.set_offset(End(-SEEK_TABLE_INTEGRITY_SIZE))
        buf = b""
        while len(buf) < SEEK_TABLE_INTEGRITY_SIZE:
            chunk = self.read(SEEK_TABLE_INTEGRITY_SIZE - len(buf))
            if not chunk:
                raise IOError_("unexpected EOF reading seek table integrity")
            buf += chunk
        return buf


class BytesWrapper(Seekable):
    """Seekable over an in-memory byte buffer
    (reference: lib/src/seekable.rs:41-97)."""

    def __init__(self, data: bytes):
        self._data = memoryview(data)
        self._pos = 0

    def __len__(self) -> int:
        return len(self._data)

    def set_offset(self, offset: OffsetFrom) -> int:
        if isinstance(offset, Start):
            pos = offset.offset
        elif isinstance(offset, End):
            pos = len(self._data) + offset.offset
        else:
            raise TypeError(f"not an OffsetFrom: {offset!r}")
        if pos < 0 or pos > len(self._data):
            raise NumberConversionError(
                f"offset {pos} out of bounds for buffer of {len(self._data)} bytes"
            )
        self._pos = pos
        return pos

    def read(self, n: int) -> bytes:
        chunk = self._data[self._pos : self._pos + n]
        self._pos += len(chunk)
        return bytes(chunk)


class FileWrapper(Seekable):
    """Seekable over any ``read``/``seek``-capable binary stream
    (reference blanket impl: lib/src/seekable.rs:111-138)."""

    def __init__(self, fobj):
        self._f = fobj

    def set_offset(self, offset: OffsetFrom) -> int:
        try:
            if isinstance(offset, Start):
                return self._f.seek(offset.offset, os.SEEK_SET)
            elif isinstance(offset, End):
                return self._f.seek(offset.offset, os.SEEK_END)
        except (OSError, ValueError) as e:
            raise IOError_(str(e)) from e
        raise TypeError(f"not an OffsetFrom: {offset!r}")

    def read(self, n: int) -> bytes:
        try:
            return self._f.read(n)
        except OSError as e:
            raise IOError_(str(e)) from e


def as_seekable(src) -> Seekable:
    """Coerce bytes / file-like / Seekable into a Seekable."""
    if isinstance(src, Seekable):
        return src
    if isinstance(src, (bytes, bytearray, memoryview)):
        return BytesWrapper(bytes(src))
    if isinstance(src, (io.IOBase,)) or (hasattr(src, "read") and hasattr(src, "seek")):
        return FileWrapper(src)
    raise TypeError(f"cannot adapt {type(src)!r} into a Seekable source")
