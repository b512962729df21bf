"""TPU compute kernels for the codec (JAX/XLA + Pallas).

Design notes (why this is not a port of the reference's hot loops):

The reference's compute core is libzstd's sequential C (SURVEY §2.3) —
byte-serial match copies, bit-serial entropy loops. A TPU reaches
throughput through data parallelism over the VPU/MXU lanes and HBM
bandwidth, so every op here is reformulated:

- ``seq_exec``: LZ77 sequence execution becomes *pointer-doubling* — the
  self-referential copy ``out[p] = out[p - off]`` is resolved by O(log n)
  vectorized gather passes instead of a byte-serial loop.
- ``bitpack``: bitstream assembly becomes prefix-sum of bit lengths +
  scatter-or into words — fully parallel, no carry chain.
- ``histogram``: byte/code histograms via one-hot matmul on the MXU.
- ``match``: hash-bucket candidate discovery via sort, match lengths via
  vectorized word compares, and the greedy parse via pointer-jumping over
  the "next anchor" function.
- ``entropy``: FSE/Huffman state chains are per-stream sequential by
  construction, so they run as ``lax.scan`` vectorized across many
  streams/blocks (frames are independent by format design).

Frames are the outer unit of parallelism (the property the seekable
format exists to provide) and shard across chips in
``zeekstd_tpu.parallel``.
"""

from .seq_exec import execute_sequences_tpu, build_sequence_layout

__all__ = ["execute_sequences_tpu", "build_sequence_layout"]
