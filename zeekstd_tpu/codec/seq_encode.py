"""Sequences-section encoding: code mapping, table-mode selection, and the
interleaved three-state FSE bitstream (inverse of ``sequences.py``)."""

from __future__ import annotations

import numpy as np

from ..errors import corruption_detected
from .bitstream import BitWriter
from .fse import (
    FseEncState,
    build_encode_table,
    normalize_counts,
    optimal_table_log,
    write_ncount,
)
from .sequences import (
    LL_BASE,
    LL_BITS,
    LL_DEFAULT_LOG,
    LL_DEFAULT_NORM,
    LL_MAX_LOG,
    MAX_LL_CODE,
    MAX_ML_CODE,
    MAX_OFFSET_CODE,
    ML_BASE,
    ML_BITS,
    ML_DEFAULT_LOG,
    ML_DEFAULT_NORM,
    ML_MAX_LOG,
    MODE_FSE,
    MODE_PREDEFINED,
    MODE_REPEAT,
    MODE_RLE,
    OF_DEFAULT_LOG,
    OF_DEFAULT_NORM,
    OF_MAX_LOG,
)

_DEFAULT_ENC_TABLES = {}
_PRICE_CACHE = {}  # (id(norm), log) -> (price vec, zero mask, len)


def _default_enc_table(category: str):
    if category not in _DEFAULT_ENC_TABLES:
        norm, log = {
            "ll": (LL_DEFAULT_NORM, LL_DEFAULT_LOG),
            "ml": (ML_DEFAULT_NORM, ML_DEFAULT_LOG),
            "of": (OF_DEFAULT_NORM, OF_DEFAULT_LOG),
        }[category]
        _DEFAULT_ENC_TABLES[category] = build_encode_table(norm, log)
    return _DEFAULT_ENC_TABLES[category]


def ll_code(ll: int) -> int:
    if ll < 16:
        return ll
    return int(np.searchsorted(LL_BASE, ll, side="right")) - 1


def ml_code(ml: int) -> int:
    if ml < 35:
        return ml - 3
    return int(np.searchsorted(ML_BASE, ml, side="right")) - 1


def of_code(offset_value: int) -> int:
    return offset_value.bit_length() - 1


def write_num_sequences(n: int) -> bytes:
    if n < 128:
        return bytes([n])
    if n < 0x7F00:
        return bytes([(n >> 8) + 128, n & 0xFF])
    if n <= 0xFFFF + 0x7F00:
        v = n - 0x7F00
        return bytes([255, v & 0xFF, v >> 8])
    raise corruption_detected("too many sequences for one block")


def _choose_table(codes, category: str, default_norm, default_log, max_code, max_log, prev_table=None, hist=None):
    """Pick the cheapest of RLE / predefined / FSE_Compressed / Repeat for
    one category. Returns (mode, enc_table, desc_bytes, cost_bits_estimate).

    ``codes`` may be None when ``hist`` (an int64 histogram over the code
    alphabet) is given — the stats-pull path already has histograms and
    synthesizing a codes array just to re-count it is pure overhead."""
    if hist is None:
        n = len(codes)
        hist = np.bincount(codes, minlength=max_code + 1).astype(np.int64)
    else:
        hist = np.asarray(hist, np.int64)
        if len(hist) < max_code + 1:
            hist = np.pad(hist, (0, max_code + 1 - len(hist)))
        n = int(hist.sum())

    if np.count_nonzero(hist) == 1:
        sym = int(np.argmax(hist))
        return MODE_RLE, build_encode_table([0] * sym + [1], 0), bytes([sym]), 0

    # Vectorized -sum(c * log2(p)) costs (this runs per block per category
    # in the batched encoder's host-decision phase).
    hc = hist[: max_code + 1].astype(np.float64)
    present = hc > 0

    def _price_of(tbl_norm, tbl_log, cache_obj=None):
        """Per-symbol price vector (tbl_log - log2(p), with -1 entries at
        p = 0.5) and zero-count mask for a table — CONSTANT per table, so
        cached on the table object (repeat mode) or by identity
        (predefined norms): recomputing log2 per block was ~40% of the
        host-decision phase."""
        if cache_obj is not None:
            got = getattr(cache_obj, "_price_cache", None)
            if got is not None:
                return got
        # Module-constant norms (the predefined tables) cache by identity;
        # a fresh per-block norm list must NOT (id() reuse after gc).
        key = (id(tbl_norm), tbl_log) if tbl_norm is default_norm else None
        got = _PRICE_CACHE.get(key) if key is not None else None
        if got is None:
            tn = np.asarray(tbl_norm, dtype=np.float64)
            p = np.where(tn > 0, tn, 0.5)
            got = (tbl_log - np.log2(p), tn == 0, len(tn))
            if key is not None:
                _PRICE_CACHE[key] = got
        if cache_obj is not None:
            cache_obj._price_cache = got
        return got

    def _table_bits(tbl_norm, tbl_log, cache_obj=None):
        """cost_bits for coding ``hist`` with a table whose normalized
        counts are ``tbl_norm``, or None when a present symbol is outside
        the table's reach."""
        price, zero, m = _price_of(tbl_norm, tbl_log, cache_obj)
        if m > max_code + 1:
            price = price[: max_code + 1]
            zero = zero[: max_code + 1]
            m = max_code + 1
        if np.any(present[m:]):
            return None  # present symbols beyond the table's reach
        prm = present[:m]
        if np.any(prm & zero):
            return None
        return float(np.dot(np.where(prm, hc[:m], 0.0), price))

    # Predefined cost: -log2(p) per symbol; -1 entries cost accuracy_log bits.
    pred_bits = _table_bits(default_norm, default_log)
    pred_ok = pred_bits is not None

    # Dedicated FSE table cost.
    log = optimal_table_log(max_log, n, max_code)
    max_present = int(np.max(np.nonzero(hist)[0]))
    norm = normalize_counts(hist, log, n, max_present)
    desc = write_ncount(norm, log)
    dedicated_bits = _table_bits(norm, log)
    # normalize_counts guarantees every present symbol a nonzero (>=1 or
    # -1) entry; a None here would mean that invariant broke upstream.
    assert dedicated_bits is not None, "dedicated table must cover all present symbols"
    fse_bits = 8 * len(desc) + dedicated_bits

    # Repeat-mode cost: previous block's table, no description bytes.
    rep_bits = None
    if prev_table is not None and prev_table.accuracy_log > 0:
        rep_bits = _table_bits(
            prev_table.norm, prev_table.accuracy_log, cache_obj=prev_table
        )

    best = min(
        x
        for x in (
            (pred_bits, MODE_PREDEFINED) if pred_ok else None,
            (fse_bits, MODE_FSE),
            (rep_bits, MODE_REPEAT) if rep_bits is not None else None,
        )
        if x is not None
    )
    if best[1] == MODE_REPEAT:
        return MODE_REPEAT, prev_table, b"", rep_bits
    if best[1] == MODE_PREDEFINED:
        return MODE_PREDEFINED, _default_enc_table(category), b"", pred_bits
    return MODE_FSE, build_encode_table(norm, log), desc, fse_bits


def encode_sequences_section(seqs, prev_tables=None) -> bytes:
    """Serialize the full sequences section for a block.

    ``seqs``: list of Sequence(ll, ml, offset_value). ``prev_tables``: an
    optional mutable dict carrying each category's encode table across
    blocks; when reusing the previous table is cheapest, Repeat_Mode is
    emitted (RFC 8878 §3.1.1.3.2.1.1 mode 3).
    """
    n = len(seqs)
    out = bytearray(write_num_sequences(n))
    if n == 0:
        return bytes(out)

    ll_codes = np.array([ll_code(s.ll) for s in seqs], dtype=np.int64)
    ml_codes = np.array([ml_code(s.ml) for s in seqs], dtype=np.int64)
    of_codes = np.array([of_code(s.offset_value) for s in seqs], dtype=np.int64)

    prev = prev_tables if prev_tables is not None else {}
    ll_mode, ll_t, ll_desc, _ = _choose_table(
        ll_codes, "ll", LL_DEFAULT_NORM, LL_DEFAULT_LOG, MAX_LL_CODE, LL_MAX_LOG,
        prev.get("ll"),
    )
    of_mode, of_t, of_desc, _ = _choose_table(
        of_codes, "of", OF_DEFAULT_NORM, OF_DEFAULT_LOG, MAX_OFFSET_CODE, OF_MAX_LOG,
        prev.get("of"),
    )
    ml_mode, ml_t, ml_desc, _ = _choose_table(
        ml_codes, "ml", ML_DEFAULT_NORM, ML_DEFAULT_LOG, MAX_ML_CODE, ML_MAX_LOG,
        prev.get("ml"),
    )
    if prev_tables is not None:
        # Repeat mode references whatever table the previous block used,
        # whichever mode produced it (decoder mirror: sequences.py
        # read_symbol_table MODE_REPEAT).
        prev_tables["ll"], prev_tables["of"], prev_tables["ml"] = ll_t, of_t, ml_t

    out.append((ll_mode << 6) | (of_mode << 4) | (ml_mode << 2))
    out += ll_desc + of_desc + ml_desc

    # Vectorized bitstream assembly: state chains run as a lean
    # python-int loop; extras and bit placement are numpy
    # (bitstream.pack_bits_numpy). Byte-identical to the BitWriter path.
    from .bitstream import pack_bits_numpy

    last = n - 1
    lls_arr = np.array([s.ll for s in seqs], dtype=np.int64)
    mls_arr = np.array([s.ml for s in seqs], dtype=np.int64)
    ovs_arr = np.array([s.offset_value for s in seqs], dtype=np.int64)
    ll_e = lls_arr - LL_BASE[ll_codes].astype(np.int64)
    ll_b = LL_BITS[ll_codes].astype(np.int64)
    ml_e = mls_arr - ML_BASE[ml_codes].astype(np.int64)
    ml_b = ML_BITS[ml_codes].astype(np.int64)
    of_e = ovs_arr - (np.int64(1) << of_codes)
    of_b = of_codes

    def chain(table, codes):
        dnb = [int(x) for x in table.delta_nb_bits]
        dfs = [int(x) for x in table.delta_find_state]
        stt = [int(x) for x in table.state_table]
        sym0 = int(codes[last])
        nb0 = (dnb[sym0] + (1 << 15)) >> 16
        state = stt[((((nb0 << 16) - dnb[sym0])) >> nb0) + dfs[sym0]]
        vals = [0] * (n - 1)
        bits = [0] * (n - 1)
        k = 0
        for i in range(n - 2, -1, -1):
            sym = codes[i]
            nb = (state + dnb[sym]) >> 16
            vals[k] = state
            bits[k] = nb
            state = stt[(state >> nb) + dfs[sym]]
            k += 1
        return vals, bits, state, table.accuracy_log

    codes_ll = ll_codes.tolist()
    codes_ml = ml_codes.tolist()
    codes_of = of_codes.tolist()
    of_v, of_nb, of_sf, of_log = chain(of_t, codes_of)
    ml_v, ml_nb, ml_sf, ml_log = chain(ml_t, codes_ml)
    ll_v, ll_nb, ll_sf, ll_log = chain(ll_t, codes_ll)

    # Item order per written stream: head extras (last seq: ll, ml, of),
    # then per i = n-2..0: of/ml/ll state bits + ll/ml/of extras, then the
    # three state flushes (ml, of, ll) and the sentinel (added by packer).
    m = n - 1
    vals = np.empty(3 + 6 * m + 3, dtype=np.int64)
    bits = np.empty_like(vals)
    vals[0:3] = (ll_e[last], ml_e[last], of_e[last])
    bits[0:3] = (ll_b[last], ml_b[last], of_b[last])
    if m:
        rev = np.arange(n - 2, -1, -1)
        body_v = np.empty((m, 6), dtype=np.int64)
        body_b = np.empty((m, 6), dtype=np.int64)
        body_v[:, 0] = of_v
        body_b[:, 0] = of_nb
        body_v[:, 1] = ml_v
        body_b[:, 1] = ml_nb
        body_v[:, 2] = ll_v
        body_b[:, 2] = ll_nb
        body_v[:, 3] = ll_e[rev]
        body_b[:, 3] = ll_b[rev]
        body_v[:, 4] = ml_e[rev]
        body_b[:, 4] = ml_b[rev]
        body_v[:, 5] = of_e[rev]
        body_b[:, 5] = of_b[rev]
        vals[3 : 3 + 6 * m] = body_v.reshape(-1)
        bits[3 : 3 + 6 * m] = body_b.reshape(-1)
    vals[3 + 6 * m :] = (ml_sf, of_sf, ll_sf)
    bits[3 + 6 * m :] = (ml_log, of_log, ll_log)
    out += pack_bits_numpy(vals, bits)
    return bytes(out)
