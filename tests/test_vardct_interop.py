"""Conformance: decode reference-encoder VarDCT (lossy) streams and match
the reference decoder within a small RMSE (SURVEY.md §7 stage 4 gate)."""

import numpy as np
import pytest

from libjxl_tpu.api.decoder import decode
from libjxl_tpu.utils.oracle import (
    oracle_available, oracle_decode, oracle_encode,
)

pytestmark = pytest.mark.skipif(not oracle_available(),
                                reason="libjxl oracle not available")


def _photo(rng, h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([(xx * 2 + yy) % 256, (yy * 3) % 256,
                    ((xx * xx // 40 + yy) % 256)], -1)
    img = img + rng.integers(0, 30, img.shape)
    return img.clip(0, 255).astype(np.uint8)


def _check(img, effort, rmse_limit=0.05, max_limit=2):
    data = oracle_encode(img, lossless=False, effort=effort)
    ours = decode(data)
    ref = oracle_decode(data, num_channels=3).pixels
    d = (ours.astype(float) - ref.astype(float))
    rmse = np.sqrt(np.mean(d * d))
    assert rmse <= rmse_limit, f"RMSE {rmse}"
    assert np.abs(d).max() <= max_limit


@pytest.mark.parametrize("effort", [1, 2, 3])
def test_vardct_dct8_only(rng, effort):
    _check(_photo(rng, 64, 64), effort)


@pytest.mark.parametrize("effort", [5, 7])
def test_vardct_all_strategies(rng, effort):
    _check(_photo(rng, 128, 160), effort)


def test_vardct_smooth_gaborish(rng):
    yy, xx = np.mgrid[0:128, 0:160]
    img = np.stack([(xx + yy) // 2, xx // 2, yy // 2], -1).astype(np.uint8)
    # float32-vs-float64 filter differences allow slightly more slack
    _check(img, 7, rmse_limit=0.6, max_limit=5)


def test_vardct_multigroup(rng):
    img = np.zeros((300, 400, 3), np.uint8)
    img[:, :, 0] = (np.arange(400) % 256)[None, :]
    img[:, :, 1] = (np.arange(300) % 256)[:, None]
    img[:, :, 2] = 100
    _check(img, 3, rmse_limit=0.1)


def test_vardct_flat_dc_exact():
    img = np.full((8, 8, 3), 128, np.uint8)
    data = oracle_encode(img, lossless=False, effort=3)
    assert np.array_equal(decode(data),
                          oracle_decode(data, num_channels=3).pixels)


def test_vardct_odd_size(rng):
    img = _photo(rng, 33, 49)
    _check(img, 3)


@pytest.mark.skipif(not oracle_available(), reason="no system libjxl")
def test_decode_libjxl_lossy_all_efforts(rng):
    """Conformance sweep: libjxl VarDCT streams at every effort decode
    within +-1 of the reference decoder's own output."""
    from libjxl_tpu.utils.oracle import oracle_decode, oracle_encode

    yy, xx = np.mgrid[0:96, 0:144]
    img = (np.stack([xx % 256, yy % 256, (xx + yy) % 256], -1)
           + rng.integers(0, 10, (96, 144, 3))
           ).clip(0, 255).astype(np.uint8)
    for e in range(1, 10):
        ref = oracle_encode(img, lossless=False, distance=1.0, effort=e)
        theirs = oracle_decode(ref).pixels
        ours = decode(ref)
        assert np.abs(theirs.astype(int) -
                      ours.astype(int)).max() <= 1, f"effort {e}"
