"""Conformance: decode reference-encoder (libjxl) lossless streams
bit-exactly — the modular path's ground-truth gate (SURVEY.md §7 stage 3)."""

import numpy as np
import pytest

from libjxl_tpu.api.decoder import decode
from libjxl_tpu.utils.oracle import oracle_available, oracle_encode

pytestmark = pytest.mark.skipif(not oracle_available(),
                                reason="libjxl oracle not available")


def _structured(rng, h, w):
    x = np.arange(w)[None, :] + np.arange(h)[:, None] * 2
    img = np.stack([x % 256, (x * 3) % 256, (x * 7) % 256], axis=-1)
    img[h // 4:h // 2, w // 4:w // 2] = rng.integers(
        0, 256, (h // 4, w // 4, 3))
    return img.astype(np.uint8)


@pytest.mark.parametrize("effort", [1, 2, 3, 4, 5, 7, 9])
def test_decode_reference_lossless_rgb(rng, effort):
    img = _structured(rng, 40, 48)
    data = oracle_encode(img, lossless=True, effort=effort)
    out = decode(data)
    assert np.array_equal(out, img)


@pytest.mark.parametrize("effort", [1, 3, 7])
def test_decode_reference_lossless_noise(rng, effort):
    img = rng.integers(0, 256, (32, 40, 3), dtype=np.uint8)
    data = oracle_encode(img, lossless=True, effort=effort)
    assert np.array_equal(decode(data), img)


def test_decode_reference_gray(rng):
    img = (np.arange(48)[None, :] * np.arange(40)[:, None] % 256
           ).astype(np.uint8)
    for effort in (1, 3, 7):
        data = oracle_encode(img, lossless=True, effort=effort)
        assert np.array_equal(decode(data).squeeze(), img)


def test_decode_reference_16bit(rng):
    img = rng.integers(0, 65536, (24, 24, 3)).astype(np.uint16)
    data = oracle_encode(img, lossless=True, effort=3)
    out = decode(data)
    assert out.dtype == np.uint16
    assert np.array_equal(out, img)


def test_decode_reference_palette_image(rng):
    img = (rng.integers(0, 4, (40, 40, 3)) * 80).astype(np.uint8)
    for effort in (5, 7):
        data = oracle_encode(img, lossless=True, effort=effort)
        assert np.array_equal(decode(data), img)


def test_decode_reference_multigroup(rng):
    img = np.zeros((300, 520, 3), np.uint8)
    img[:, :, 0] = (np.arange(520) % 256)[None, :]
    img[:, :, 1] = (np.arange(300) % 256)[:, None]
    img[100:200, 100:400, 2] = 200
    data = oracle_encode(img, lossless=True, effort=3)
    assert np.array_equal(decode(data), img)


def test_decode_reference_odd_sizes(rng):
    for h, w in [(1, 1), (7, 3), (33, 17), (64, 1)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        data = oracle_encode(img, lossless=True, effort=2)
        assert np.array_equal(decode(data), img), (h, w)


def test_decode_reference_rgba(rng):
    img = rng.integers(0, 256, (40, 48, 4), dtype=np.uint8)
    data = oracle_encode(img, lossless=True, effort=3)
    assert np.array_equal(decode(data), img)


@pytest.mark.skipif(not oracle_available(), reason="no system libjxl")
def test_decode_libjxl_all_efforts(rng):
    """Conformance sweep: libjxl-encoded lossless streams at every
    effort (e9 exercises WP modes, select/average predictors and deep
    trees through the NATIVE decode path — a predictor-id swap there
    once only showed up on these streams)."""
    from libjxl_tpu.api.decoder import decode
    from libjxl_tpu.utils.oracle import oracle_encode

    yy, xx = np.mgrid[0:96, 0:144]
    img = (np.stack([xx % 256, yy % 256, (xx + yy) % 256], -1)
           + rng.integers(0, 10, (96, 144, 3))
           ).clip(0, 255).astype(np.uint8)
    for e in range(1, 10):
        ref = oracle_encode(img, lossless=True, effort=e)
        assert np.array_equal(decode(ref), img), f"effort {e}"


@pytest.mark.skipif(not oracle_available(), reason="no system libjxl")
def test_conformance_matrix_gray_alpha_16bit(rng):
    """Both-direction conformance over channel/depth variants at
    low/mid/high effort: libjxl streams decode exactly in ours, and our
    streams decode exactly in libjxl."""
    from libjxl_tpu.api.encoder import EncodeOptions, encode_lossless
    from libjxl_tpu.utils.oracle import oracle_decode

    yy, xx = np.mgrid[0:64, 0:80]
    base = (np.stack([xx % 256, yy % 256, (xx + yy) % 256], -1)
            + rng.integers(0, 10, (64, 80, 3))
            ).clip(0, 255).astype(np.uint8)
    cases = {
        "gray": base[:, :, 0],
        "rgba": np.concatenate(
            [base, rng.integers(200, 256, (64, 80, 1)).astype(np.uint8)],
            -1),
        "rgb16": base.astype(np.uint16) * 257,
    }
    for name, im in cases.items():
        nch = 1 if im.ndim == 2 else im.shape[2]
        bits = 16 if im.dtype == np.uint16 else 8
        dt = np.uint16 if bits == 16 else np.uint8
        for e in (3, 6, 9):
            ref = oracle_encode(
                im if im.ndim == 3 else im[:, :, None],
                lossless=True, effort=e, bits_per_sample=bits)
            assert np.array_equal(np.squeeze(decode(ref)),
                                  np.squeeze(im)), (name, e, "dec")
            mine = encode_lossless(im, EncodeOptions(effort=e))
            got = oracle_decode(mine, dtype=dt, num_channels=nch).pixels
            assert np.array_equal(np.squeeze(got),
                                  np.squeeze(im)), (name, e, "enc")


def test_float32_lossless_roundtrip_and_interop():
    """32-bit float samples ride as binary32 bit patterns
    (enc_modular.cc float_to_int / dec_modular.cc int_to_float); the
    int32 PropertyVal / residual wrap semantics make huge bit-pattern
    values decode exactly. Both directions: our roundtrip is
    bit-exact and libjxl's own float streams decode bit-exactly."""
    from libjxl_tpu.api.decoder import decode
    from libjxl_tpu.api.encoder import EncodeOptions, encode_lossless

    rng = np.random.default_rng(0)
    img = (rng.random((64, 80, 3)) * 4 - 1).astype(np.float32)
    for e in (2, 5):
        data = encode_lossless(img, EncodeOptions(effort=e))
        out = decode(data)
        assert out.dtype == np.float32
        assert np.array_equal(out, img)
    if oracle_available():
        from libjxl_tpu.utils.oracle import oracle_encode
        theirs = oracle_encode(img, lossless=True, effort=5)
        assert np.array_equal(decode(theirs), img)
