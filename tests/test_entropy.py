"""Entropy layer roundtrip tests (histograms, alias, ANS, prefix, ctx map)."""

import numpy as np
import pytest

from libjxl_tpu.entropy import ans as A
from libjxl_tpu.entropy.alias import build_alias_table, build_encoder_slots
from libjxl_tpu.entropy.histogram import (
    ANS_TAB_SIZE, read_histogram, write_histogram,
)
from libjxl_tpu.entropy.hybrid import HybridUintConfig
from libjxl_tpu.entropy.prefix import (
    PrefixCode, build_prefix_lengths, read_prefix_code, write_prefix_code,
)
from libjxl_tpu.utils.bits import BitReader, BitWriter


def test_hybrid_uint_examples():
    # Examples from dec_ans.h:55-68 (split=4, msb=2, lsb=0).
    cfg = HybridUintConfig(4, 2, 0)
    cases = {0: (0, 0, 0), 15: (15, 0, 0), 16: (16, 2, 0b00),
             17: (16, 2, 0b01), 20: (17, 2, 0b00), 24: (18, 2, 0b00),
             28: (19, 2, 0b00), 32: (20, 3, 0b000),
             65535: (63, 13, 0b1111111111111)}
    for value, expect in cases.items():
        assert cfg.encode(value) == expect, value
    # decode inverse
    for value in list(cases) + [1, 100, 1000, 123456, (1 << 30) - 1]:
        tok, nbits, bits = cfg.encode(value)
        assert cfg.decode(tok, lambda n: bits & ((1 << n) - 1)) == value


def test_hybrid_encode_array_matches_scalar(rng):
    for cfg in [HybridUintConfig(4, 2, 0), HybridUintConfig(0, 0, 0),
                HybridUintConfig(7, 1, 2), HybridUintConfig(4, 1, 1)]:
        values = np.concatenate([
            rng.integers(0, 32, 200), rng.integers(0, 1 << 16, 200),
            rng.integers(0, 1 << 28, 50), [0, 1, (1 << 30) - 1]])
        t, n, b = cfg.encode_array(values.astype(np.uint32))
        for i, v in enumerate(values):
            ts, ns, bs = cfg.encode(int(v))
            assert (t[i], n[i], b[i]) == (ts, ns, bs), (cfg, v)


@pytest.mark.parametrize("dist", [
    [ANS_TAB_SIZE],                       # single symbol
    [1, ANS_TAB_SIZE - 1],
    [100, 200, ANS_TAB_SIZE - 300],
    [1] * 256,                            # will be normalized first
])
def test_histogram_roundtrip(dist):
    if sum(dist) != ANS_TAB_SIZE:
        dist = list(A.normalize_counts(np.array(dist)))
    w = BitWriter()
    write_histogram(w, dist)
    out = read_histogram(BitReader(w.to_bytes()))
    # trailing zeros are not significant
    a = np.trim_zeros(np.array(dist), trim="b")
    b = np.trim_zeros(np.array(out), trim="b")
    assert np.array_equal(a, b)


def test_histogram_roundtrip_random(rng):
    for _ in range(50):
        n = int(rng.integers(1, 200))
        h = rng.integers(0, 1000, n) * rng.integers(0, 2, n)
        if h.sum() == 0:
            h[rng.integers(0, n)] = 1
        counts = A.normalize_counts(h)
        w = BitWriter()
        write_histogram(w, list(counts))
        out = read_histogram(BitReader(w.to_bytes()))
        assert np.array_equal(np.trim_zeros(counts, "b"),
                              np.trim_zeros(np.array(out), "b"))


def test_alias_table_consistency(rng):
    for log_alpha in (5, 6, 7, 8):
        for _ in range(20):
            n = int(rng.integers(1, 1 << log_alpha))
            h = rng.integers(0, 100, n)
            if h.sum() == 0:
                h[0] = 1
            counts = A.normalize_counts(h)
            sym, off, freq = build_alias_table(counts, log_alpha)
            # every slot maps to a valid (symbol, offset), bijectively
            for s in range(len(counts)):
                sel = sym == s
                assert sel.sum() == counts[s]
                assert sorted(off[sel].tolist()) == list(range(counts[s]))
            start, slots = build_encoder_slots(counts, log_alpha)
            for s in range(len(counts)):
                for o in range(int(counts[s])):
                    v = int(slots[int(start[s]) + o])
                    assert sym[v] == s and off[v] == o


def test_prefix_code_roundtrip(rng):
    for _ in range(30):
        n = int(rng.integers(2, 300))
        counts = rng.integers(0, 100, n)
        if np.count_nonzero(counts) < 2:
            counts[0] = 1
            counts[1] = 2
        lengths = build_prefix_lengths(counts)
        w = BitWriter()
        write_prefix_code(w, lengths)
        pc = read_prefix_code(n, BitReader(w.to_bytes()))
        assert np.array_equal(
            np.trim_zeros(pc.lengths, "b"), np.trim_zeros(lengths, "b"))


def _roundtrip_tokens(tokens, num_contexts, use_prefix, lz77=None):
    arrs = [A.tokens_to_array(tokens)]
    codes = A.build_entropy_codes(arrs, num_contexts,
                                  use_prefix_code=use_prefix, lz77=lz77)
    w = BitWriter()
    A.write_entropy_codes(w, codes)
    A.write_tokens(w, arrs[0], codes)
    r = BitReader(w.to_bytes())
    code = A.decode_histograms(r, num_contexts)
    reader = A.ANSSymbolReader(code, r)
    out = [reader.read_hybrid_uint(ctx, r) for ctx, _ in tokens]
    assert reader.check_final_state()
    assert not r.overflow
    return out


@pytest.mark.parametrize("use_prefix", [False, True])
def test_token_stream_roundtrip(rng, use_prefix):
    for nctx in (1, 2, 5):
        tokens = [(int(rng.integers(0, nctx)),
                   int(rng.integers(0, 1000) if rng.random() < 0.5 else
                       rng.integers(0, 16)))
                  for _ in range(2000)]
        out = _roundtrip_tokens(tokens, nctx, use_prefix)
        assert out == [v for _, v in tokens]


@pytest.mark.parametrize("use_prefix", [False, True])
def test_token_stream_degenerate(use_prefix):
    # single-symbol histogram
    tokens = [(0, 7)] * 100
    assert _roundtrip_tokens(tokens, 1, use_prefix) == [7] * 100
    # empty stream
    assert _roundtrip_tokens([], 1, use_prefix) == []


def test_token_stream_large_values(rng):
    tokens = [(0, int(v)) for v in rng.integers(0, 1 << 28, 500)]
    assert _roundtrip_tokens(tokens, 1, False) == [v for _, v in tokens]


def test_context_map_roundtrip(rng):
    for num_hist, nctx in ((2, 10), (8, 40), (20, 64)):
        cm = rng.integers(0, num_hist, nctx)
        # ensure all histograms used
        cm[:num_hist] = np.arange(num_hist)
        w = BitWriter()
        A.encode_context_map(w, cm, num_hist)
        out, nh = A.decode_context_map(BitReader(w.to_bytes()), nctx)
        assert nh == num_hist
        assert np.array_equal(out, cm)


def test_lz77_match_transform_roundtrip(rng):
    """General LZ77 match search (enc_lz77.cc:439 ApplyLZ77_LZ77):
    repeated motifs at distance > 1 become copy tokens; the transformed
    stream decodes back to the original values."""
    from libjxl_tpu.entropy.ans import (
        ANSSymbolReader, LZ77Params, build_entropy_codes,
        decode_histograms, lz77_match_transform, write_entropy_codes,
        write_tokens,
    )
    from libjxl_tpu.utils import native
    if not native.available():
        import pytest
        pytest.skip("native module unavailable")
    motif = rng.integers(0, 40, 37).astype(np.int64)
    vals = np.concatenate([
        motif, rng.integers(0, 40, 11), motif, motif[:20],
        rng.integers(0, 40, 300), motif, np.zeros(100, np.int64), motif])
    arr = np.column_stack([np.zeros(len(vals), np.int64), vals])
    lz = LZ77Params(enabled=True)
    t = lz77_match_transform([arr], 1, lz, [0])
    assert t is not None and len(t[0]) < len(arr)   # matches were found
    codes = build_entropy_codes(t, 1, lz77=lz)
    w = BitWriter()
    write_entropy_codes(w, codes)
    write_tokens(w, t[0], codes)
    w.zero_pad_to_byte()
    r = BitReader(w.to_bytes())
    code = decode_histograms(r, 1)
    rd = ANSSymbolReader(code, r, distance_multiplier=0)
    out = [rd.read_hybrid_uint(0, r) for _ in range(len(vals))]
    assert rd.check_final_state()
    assert np.array_equal(np.asarray(out), vals)


def test_lossless_e8_lz77_denser_on_repetitive(rng):
    """e8 enables the hash-chain LZ77; tiled-glyph (screenshot-like)
    content must come out markedly denser than e7 RLE-only, and decode
    bit-exact (oracle-verified when available)."""
    from libjxl_tpu.api.decoder import decode
    from libjxl_tpu.api.encoder import EncodeOptions, encode_lossless
    from libjxl_tpu.utils import native
    if not native.available():
        import pytest
        pytest.skip("native module unavailable")
    glyphs = [rng.integers(0, 255, (8, 6, 3)).astype(np.uint8)
              for _ in range(8)]
    img = np.concatenate(
        [np.concatenate([glyphs[g] for g in rng.integers(0, 8, 20)],
                        axis=1) for _ in range(12)], axis=0)
    e2 = encode_lossless(img, EncodeOptions(effort=2, palette=0))
    e5 = encode_lossless(img, EncodeOptions(effort=5, palette=0))
    e8 = encode_lossless(img, EncodeOptions(effort=8, palette=0))
    # e5+ runs the pure-LZ77 zero-tree candidate, so e5 is already
    # dense on tiled content; the invariants are (a) the e8 candidate
    # set is a superset of e5's, so e8 never loses to e5, and (b) the
    # LZ77 match search beats the e2 RLE-only path decisively.
    assert len(e8) <= len(e5)
    assert len(e8) < 0.5 * len(e2)
    dec = decode(e8)
    assert np.array_equal(dec, img)
    from libjxl_tpu.utils.oracle import oracle_available, oracle_decode
    if oracle_available():
        assert np.array_equal(oracle_decode(e8).pixels, dec)


def test_native_entropy_tail_bit_identical():
    """jxlt_entropy_tail (clustering + histograms + context map +
    uint-config search + per-group rANS) must produce bit-identical
    output to the Python pipeline it replaces (enc_ans.cc:915
    BuildAndStoreEntropyCodes semantics)."""
    from libjxl_tpu.entropy.ans import (
        build_entropy_codes, write_entropy_codes, write_tokens,
    )
    from libjxl_tpu.utils import native
    from libjxl_tpu.utils.bits import BitWriter

    if not native.available():
        import pytest
        pytest.skip("native unavailable")
    for seed in range(4):
        rng = np.random.default_rng(seed)
        n_ctx = int(rng.integers(2, 60))
        arrs = []
        for _ in range(int(rng.integers(1, 6))):
            n = int(rng.integers(0, 8000))
            arrs.append(np.stack(
                [rng.integers(0, n_ctx, n),
                 np.abs(rng.normal(
                     0, rng.choice([3, 50, 500]), n)).astype(np.int64)],
                1).astype(np.int64))
        for us in (False, True):
            codes = build_entropy_codes(
                [a.copy() for a in arrs], n_ctx, histo_shift=11,
                max_clusters=24, uint_search=us)
            pw = BitWriter()
            write_entropy_codes(pw, codes)
            res = native.entropy_tail(arrs, n_ctx, 24, 11, us)
            assert res is not None
            assert (res[0], res[1]) == (pw.to_bytes(), pw.bits_written)
            for a, (gb, gbits) in zip(arrs, res[2]):
                gw = BitWriter()
                write_tokens(gw, a, codes)
                assert (gb, gbits) == (gw.to_bytes(), gw.bits_written)
