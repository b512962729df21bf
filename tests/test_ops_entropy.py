"""TPU entropy kernels vs the host codec: bit-exact stream equality for
encode, bit-exact symbol recovery for decode."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from zeekstd_tpu.codec import huffman as huf
from zeekstd_tpu.codec.bitstream import BackwardBitReader
from zeekstd_tpu.codec.fse import build_decode_table, build_encode_table
from zeekstd_tpu.codec.match import MatchParams, MatchState, find_sequences
from zeekstd_tpu.codec.seq_encode import (
    encode_sequences_section,
    ll_code,
    ml_code,
    of_code,
)
from zeekstd_tpu.codec import sequences as seq_mod
from zeekstd_tpu.ops.bitpack import pack_bits_jit, words_to_stream
from zeekstd_tpu.ops.entropy import (
    fse_decode_sequences,
    fse_encode_sequences,
    huffman_decode_stream,
    huffman_encode_stream_jit,
)

from .test_decompress import structured_data, text_data


def build_huffman(literals):
    freqs = {}
    for b in literals:
        freqs[b] = freqs.get(b, 0) + 1
    lengths = huf.package_merge_lengths(freqs)
    weights = huf.lengths_to_weights(lengths, max(freqs))
    codes, nb, max_bits = huf.build_encode_table(weights)
    return weights, codes, nb, max_bits


def test_bitpack_matches_bitwriter():
    from zeekstd_tpu.codec.bitstream import BitWriter

    rng = np.random.default_rng(0)
    n = 1000
    bits = rng.integers(0, 17, n).astype(np.int32)
    vals = (rng.integers(0, 1 << 16, n).astype(np.uint32)) & ((1 << bits) - 1).astype(
        np.uint32
    )
    bw = BitWriter()
    for v, b in zip(vals, bits):
        bw.add(int(v), int(b))
    expected = bw.finish()
    words, total = pack_bits_jit(jnp.asarray(vals), jnp.asarray(bits), 600)
    assert words_to_stream(np.asarray(words), int(total)) == expected


def test_huffman_encode_stream_exact():
    lits = text_data(4000)
    weights, codes, nb, max_bits = build_huffman(lits)
    expected = huf.encode_stream(lits, codes, nb)

    pad = np.zeros(5000, np.uint8)
    pad[: len(lits)] = np.frombuffer(lits, np.uint8)
    words, total = huffman_encode_stream_jit(
        jnp.asarray(pad), len(lits),
        jnp.asarray(codes.astype(np.uint32)), jnp.asarray(nb.astype(np.int32)),
        2000,
    )
    assert words_to_stream(np.asarray(words), int(total)) == expected


def test_huffman_decode_stream_exact():
    lits = structured_data(3000)
    weights, codes, nb, max_bits = build_huffman(lits)
    stream = huf.encode_stream(lits, codes, nb)
    dtable = huf.build_decode_table(list(weights[:-1]))  # last weight implied
    assert dtable.max_bits == max_bits

    br = BackwardBitReader(stream)
    start_bits = br.remaining
    padded = stream.ljust((len(stream) + 3) // 4 * 4, b"\0")
    words = jnp.asarray(np.frombuffer(padded, "<u4"))
    out = huffman_decode_stream(
        words, jnp.int32(start_bits), len(lits),
        jnp.asarray(dtable.symbol.astype(np.int32)),
        jnp.asarray(dtable.nb_bits.astype(np.int32)),
        max_bits,
    )
    assert bytes(np.asarray(out)) == lits


def _block_sequences(data):
    seqs, lits, _ = find_sequences(
        data, 0, len(data), MatchParams(8, 0, 5), MatchState(len(data)), (1, 4, 8)
    )
    assert len(seqs) > 4
    return seqs, lits


def _host_section_parts(seqs):
    """Host-encoded sequences section split into (pre-bitstream bytes, payload)."""
    section = encode_sequences_section(seqs)
    # Re-parse to find where the bitstream starts.
    n, c = seq_mod.parse_num_sequences(section)
    rest = section[c:]
    modes = rest[0]
    rest = rest[1:]
    consumed = c + 1
    prev = None
    tables = []
    for cat, mode_shift in (("ll", 6), ("of", 4), ("ml", 2)):
        mode = (modes >> mode_shift) & 3
        t, used = seq_mod.read_symbol_table(rest, mode, cat, None)
        tables.append((mode, t))
        rest = rest[used:]
        consumed += used
    return section[:consumed], rest, tables, n


def test_fse_encode_sequences_exact():
    data = structured_data(20_000)
    seqs, _ = _block_sequences(data)
    header, expected_payload, tables, n = _host_section_parts(seqs)

    S = 1 << (len(seqs) - 1).bit_length()
    llc = np.zeros(S, np.int32); mlc = np.zeros(S, np.int32); ofc = np.zeros(S, np.int32)
    lle = np.zeros(S, np.int32); mle = np.zeros(S, np.int32); ofe = np.zeros(S, np.int32)
    llb = np.zeros(S, np.int32); mlb = np.zeros(S, np.int32); ofb = np.zeros(S, np.int32)
    for i, s in enumerate(seqs):
        lc, mc, oc = ll_code(s.ll), ml_code(s.ml), of_code(s.offset_value)
        llc[i], mlc[i], ofc[i] = lc, mc, oc
        lle[i] = s.ll - int(seq_mod.LL_BASE[lc]); llb[i] = int(seq_mod.LL_BITS[lc])
        mle[i] = s.ml - int(seq_mod.ML_BASE[mc]); mlb[i] = int(seq_mod.ML_BITS[mc])
        ofe[i] = s.offset_value - (1 << oc); ofb[i] = oc

    # Rebuild the encode tables the host chose (modes parsed back above).
    def enc_table_from_decode(mode, dtable, cat):
        if mode == seq_mod.MODE_PREDEFINED:
            norm, log = {
                "ll": (seq_mod.LL_DEFAULT_NORM, seq_mod.LL_DEFAULT_LOG),
                "of": (seq_mod.OF_DEFAULT_NORM, seq_mod.OF_DEFAULT_LOG),
                "ml": (seq_mod.ML_DEFAULT_NORM, seq_mod.ML_DEFAULT_LOG),
            }[cat]
            return build_encode_table(norm, log)
        if mode == seq_mod.MODE_RLE:
            sym = int(dtable.symbol[0])
            return build_encode_table([0] * sym + [1], 0)
        # FSE mode: norm not retained on decode tables; recompute from host
        # chooser for exactness.
        from zeekstd_tpu.codec.seq_encode import _choose_table

        codes = {"ll": llc, "of": ofc, "ml": mlc}[cat][: len(seqs)]
        defaults = {
            "ll": (seq_mod.LL_DEFAULT_NORM, seq_mod.LL_DEFAULT_LOG, 35, 9),
            "of": (seq_mod.OF_DEFAULT_NORM, seq_mod.OF_DEFAULT_LOG, 31, 8),
            "ml": (seq_mod.ML_DEFAULT_NORM, seq_mod.ML_DEFAULT_LOG, 52, 9),
        }[cat]
        _, t, _, _ = _choose_table(codes, cat, defaults[0], defaults[1], defaults[2], defaults[3])
        return t

    (ll_mode, ll_dt), (of_mode, of_dt), (ml_mode, ml_dt) = tables
    ll_t = enc_table_from_decode(ll_mode, ll_dt, "ll")
    of_t = enc_table_from_decode(of_mode, of_dt, "of")
    ml_t = enc_table_from_decode(ml_mode, ml_dt, "ml")

    def dense(t, size):
        dnb = np.zeros(64, np.int64); dnb[: len(t.delta_nb_bits)] = t.delta_nb_bits
        dfs = np.zeros(64, np.int64); dfs[: len(t.delta_find_state)] = t.delta_find_state
        stt = np.zeros(size, np.int32); stt[: len(t.state_table)] = t.state_table
        return jnp.asarray(dnb.astype(np.int32)), jnp.asarray(dfs.astype(np.int32)), jnp.asarray(stt)

    ll_dn, ll_df, ll_st = dense(ll_t, 512)
    ml_dn, ml_df, ml_st = dense(ml_t, 512)
    of_dn, of_df, of_st = dense(of_t, 256)

    words, total = jax.jit(fse_encode_sequences, static_argnames=("word_bound",))(
        jnp.asarray(llc), jnp.asarray(mlc), jnp.asarray(ofc),
        jnp.asarray(lle), jnp.asarray(mle), jnp.asarray(ofe),
        jnp.asarray(llb), jnp.asarray(mlb), jnp.asarray(ofb),
        len(seqs),
        ll_dn, ll_df, ll_st,
        ml_dn, ml_df, ml_st,
        of_dn, of_df, of_st,
        ll_t.accuracy_log, ml_t.accuracy_log, of_t.accuracy_log,
        word_bound=4096,
    )
    assert words_to_stream(np.asarray(words), int(total)) == expected_payload


def test_fse_decode_sequences_matches_host():
    data = structured_data(15_000)
    seqs, _ = _block_sequences(data)
    _, payload, tables, n = _host_section_parts(seqs)
    (ll_mode, ll_dt), (of_mode, of_dt), (ml_mode, ml_dt) = tables

    expected = seq_mod.decode_sequences(
        payload, n, ll_dt, of_dt, ml_dt, (1, 4, 8)
    )

    br = BackwardBitReader(payload)
    start_bits = br.remaining
    padded = payload.ljust((len(payload) + 3) // 4 * 4, b"\0")
    words = jnp.asarray(np.frombuffer(padded, "<u4"))

    def dense_dec(t, size):
        sym = np.zeros(size, np.int32); sym[: len(t.symbol)] = t.symbol
        nb = np.zeros(size, np.int32); nb[: len(t.nb_bits)] = t.nb_bits
        base = np.zeros(size, np.int32); base[: len(t.baseline)] = t.baseline
        return jnp.asarray(sym), jnp.asarray(nb), jnp.asarray(base)

    ll_s, ll_n, ll_b = dense_dec(ll_dt, 512)
    of_s, of_n, of_b = dense_dec(of_dt, 256)
    ml_s, ml_n, ml_b = dense_dec(ml_dt, 512)

    seq_bound = 1 << (n - 1).bit_length()
    lls, mls, offs, ofvs, reps = jax.jit(
        fse_decode_sequences, static_argnames=("seq_bound",)
    )(
        words, jnp.int32(start_bits), seq_bound, n,
        ll_s, ll_n, ll_b, of_s, of_n, of_b, ml_s, ml_n, ml_b,
        ll_dt.accuracy_log, of_dt.accuracy_log, ml_dt.accuracy_log,
        jnp.asarray(seq_mod.LL_BASE.astype(np.int32)),
        jnp.asarray(seq_mod.LL_BITS.astype(np.int32)),
        jnp.asarray(seq_mod.ML_BASE.astype(np.int32)),
        jnp.asarray(seq_mod.ML_BITS.astype(np.int32)),
    )
    np.testing.assert_array_equal(np.asarray(lls)[:n], expected.literal_lengths)
    np.testing.assert_array_equal(np.asarray(mls)[:n], expected.match_lengths)
    np.testing.assert_array_equal(np.asarray(offs)[:n], expected.offsets)
    assert tuple(int(x) for x in reps) == expected.rep_offsets


@pytest.mark.parametrize("case", ["struct", "text", "tiny", "skewed"])
def test_huffman_speculative_decode(case):
    # Scan-free chunk-speculation decoder must match the host bit-exactly.
    from zeekstd_tpu.ops.huffman_spec import decode_stream_spec_jit

    data = {
        "struct": structured_data(30_000),
        "text": text_data(20_000),
        "tiny": text_data(64),
        "skewed": (b"aaaaaaaaab" * 3000)[:25_000],  # dominant symbol, short codes
    }[case]
    weights, codes, nb, max_bits = build_huffman(data)
    stream = huf.encode_stream(data, codes, nb)
    dt = huf.build_decode_table(list(weights[:-1]))
    br = BackwardBitReader(stream)
    start_bits = br.remaining
    padded = stream.ljust((len(stream) + 3) // 4 * 4, b"\0")
    words = jnp.asarray(np.frombuffer(padded, "<u4"))
    sym = np.zeros(2048, np.int32); sym[: dt.symbol.shape[0]] = dt.symbol
    nbt = np.zeros(2048, np.int32); nbt[: dt.nb_bits.shape[0]] = dt.nb_bits
    out_bound = 1 << max((len(data) - 1).bit_length(), 4)
    out, n = decode_stream_spec_jit(
        words, jnp.int32(start_bits), out_bound,
        jnp.asarray(sym), jnp.asarray(nbt), jnp.int32(dt.max_bits),
    )
    assert int(n) == len(data)
    assert bytes(np.asarray(out)[: len(data)]) == data


@pytest.mark.parametrize("size,seed", [(4000, 0), (700, 1), (12000, 2)])
def test_huffman_decode_bitreach_matches_spec(size, seed):
    # The loop-free bit-reachability decoder must agree with the
    # chunk-speculation decoder (and the ground truth) bit-for-bit.
    from zeekstd_tpu.ops.huffman_spec import (
        decode_stream_bitreach,
        decode_stream_spec,
    )

    rng = np.random.default_rng(seed)
    lits = bytes(
        rng.choice(np.frombuffer(text_data(400), np.uint8), size).tobytes()
    )
    weights, codes, nb, max_bits = build_huffman(lits)
    stream = huf.encode_stream(lits, codes, nb)
    dtable = huf.build_decode_table(list(weights[:-1]))  # last weight implied
    from zeekstd_tpu.codec.bitstream import BackwardBitReader

    br = BackwardBitReader(stream)
    start_bits = br.remaining
    padded = stream.ljust((len(stream) + 3) // 4 * 4, b"\0")
    words = jnp.asarray(np.frombuffer(padded, "<u4"))
    sym_t = np.zeros(2048, np.int32)
    nb_t = np.zeros(2048, np.int32)
    size_t = 1 << dtable.max_bits
    sym_t[:size_t] = dtable.symbol
    nb_t[:size_t] = dtable.nb_bits
    out_bound = 1 << (len(lits) - 1).bit_length()

    a, na = decode_stream_spec(
        words, jnp.int32(start_bits), out_bound, jnp.asarray(sym_t),
        jnp.asarray(nb_t), jnp.asarray(np.int32(dtable.max_bits)),
    )
    b, nbs = decode_stream_bitreach(
        words, jnp.int32(start_bits), out_bound, jnp.asarray(sym_t),
        jnp.asarray(nb_t), jnp.asarray(np.int32(dtable.max_bits)),
        interpret=True,
    )
    assert int(na) == int(nbs) == len(lits)
    assert bytes(np.asarray(a)[: len(lits)]) == lits
    assert np.array_equal(np.asarray(a)[: len(lits)], np.asarray(b)[: len(lits)])
