"""Tests for bit IO and field codecs (vs reference semantics)."""

import numpy as np
import pytest

from libjxl_tpu.utils.bits import BitReader, BitWriter, pack_bits_lsb
from libjxl_tpu.core import fields as F


def test_bitwriter_reader_roundtrip(rng):
    w = BitWriter()
    items = []
    for _ in range(1000):
        n = int(rng.integers(1, 57))
        v = int(rng.integers(0, 1 << n))
        items.append((n, v))
        w.write(n, v)
    data = w.to_bytes()
    r = BitReader(data)
    for n, v in items:
        assert r.read(n) == v
    assert not r.overflow


def test_lsb_first_order():
    w = BitWriter()
    w.write(1, 1)
    w.write(3, 0b101)
    w.write(4, 0xF)
    # bits: 1, 101 (lsb first: 1,0,1), 1111 -> byte = 1 | 1<<1? compute:
    # stream: b0=1, b1=1,b2=0,b3=1, b4..b7=1111 -> 0b11111011 = 0xFB
    assert w.to_bytes() == bytes([0xFB])
    r = BitReader(bytes([0xFB]))
    assert r.read(1) == 1
    assert r.read(3) == 0b101
    assert r.read(4) == 0xF


def test_pack_bits_vectorized(rng):
    n = rng.integers(1, 33, 500)
    v = rng.integers(0, 1 << 32, 500).astype(np.uint64) & (
        (np.uint64(1) << n.astype(np.uint64)) - np.uint64(1))
    packed = pack_bits_lsb(n, v)
    r = BitReader(packed.tobytes())
    for ni, vi in zip(n, v):
        assert r.read(int(ni)) == int(vi)


def test_write_array_matches_scalar(rng):
    w1, w2 = BitWriter(), BitWriter()
    n = rng.integers(1, 25, 300)
    v = rng.integers(0, 1 << 24, 300)
    for ni, vi in zip(n, v):
        w1.write(int(ni), int(vi) & ((1 << int(ni)) - 1))
    w2.write_array(n, v.astype(np.uint64))
    assert w1.to_bytes() == w2.to_bytes()


@pytest.mark.parametrize("value", [0, 1, 16, 17, 272, 273, 4095, 4096,
                                   (1 << 32) - 1, (1 << 63) + 5,
                                   0xFFFFFFFFFFFFFFFF])
def test_u64_roundtrip(value):
    w = BitWriter()
    F.write_u64(w, value)
    r = BitReader(w.to_bytes())
    assert F.read_u64(r) == value


def test_u32_enc_example_from_reference():
    # fields.h:55 example — Offset: 00->0, 01x->1..2, 10xx->3..7, 11b8->8..263
    enc = F.U32Enc(F.Val(0), F.BitsOffset(1, 1), F.BitsOffset(2, 3),
                   F.BitsOffset(8, 8))
    # (the "10xx -> 3..7" comment in fields.h is off by one: 2 bits + offset 3
    # covers 3..6)
    for value in [0, 1, 2, 3, 6, 8, 263]:
        w = BitWriter()
        F.write_u32(w, enc, value)
        r = BitReader(w.to_bytes())
        assert F.read_u32(r, enc) == value
    # Direct example: U32Enc(Val(8), Val(16), Val(32), Bits(6)), 32 => 10b
    enc2 = F.U32Enc(F.Val(8), F.Val(16), F.Val(32), F.Bits(6))
    w = BitWriter()
    F.write_u32(w, enc2, 32)
    assert w.bits_written == 2
    r = BitReader(w.to_bytes())
    assert r.read(2) == 0b10


@pytest.mark.parametrize("value", [0.0, 1.0, -1.0, 0.5, 65504.0,
                                   2.0 ** -14, 1.5, -0.25])
def test_f16_roundtrip(value):
    w = BitWriter()
    F.write_f16(w, value)
    r = BitReader(w.to_bytes())
    assert F.read_f16(r) == value


def test_enum_coding():
    for value in [0, 1, 2, 17, 18, 63]:
        w = BitWriter()
        F.write_u32(w, F.ENUM_ENC, value)
        r = BitReader(w.to_bytes())
        assert F.read_u32(r, F.ENUM_ENC) == value
