"""Data-parallel seekable compression over a ``jax.sharding.Mesh``.

The reference is single-threaded (SURVEY §2.4); the seekable format's
frame independence is exactly what makes this layer possible: input
chunks shard per chip, each chip parses/encodes its frames locally, and
per-frame sizes (the seek-table entries) are all-gathered in frame order
so every host can build the identical seek table — ICI/DCN collectives
instead of the reference's sequential writer.
"""

from .pipeline import (
    make_mesh,
    parallel_compress,
    parallel_decompress,
    parallel_parse_step,
    parallel_random_access,
    route_queries,
)

__all__ = [
    "make_mesh",
    "parallel_compress",
    "parallel_decompress",
    "parallel_parse_step",
    "parallel_random_access",
    "route_queries",
]
