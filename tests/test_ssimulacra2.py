"""SSIMULACRA 2.1 metric behavior (reference tools/ssimulacra2.cc):
identical -> 100, monotone in distortion, documented quality bands."""

import numpy as np
import pytest

from libjxl_tpu.metrics.ssimulacra2 import ssimulacra2


@pytest.fixture
def img(rng):
    h, w = 200, 280
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack([((xx * 2 + yy) // 3) % 256, yy % 256,
                     ((xx + yy) // 2) % 256], -1).astype(int)
    return (base + rng.integers(0, 30, base.shape)).clip(0, 255) \
        .astype(np.uint8)


def test_identical_is_100(img):
    assert ssimulacra2(img, img) == 100.0


def test_monotone_in_distance(img):
    from libjxl_tpu.api.decoder import decode
    from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy
    scores = []
    for d in (0.5, 2.0, 8.0):
        dec = decode(encode_lossy(img, LossyOptions(distance=d)))
        scores.append(ssimulacra2(img, dec))
    assert scores[0] > scores[1] > scores[2]
    assert scores[0] - scores[2] > 20
    assert scores[2] < 50      # d=8 is clearly bad


def test_heavy_noise_negative(img, rng):
    noisy = (img.astype(int) + rng.integers(-60, 61, img.shape)) \
        .clip(0, 255).astype(np.uint8)
    assert ssimulacra2(img, noisy) < 0


def test_alpha_blending(img):
    rgba = np.concatenate([img, np.full(img.shape[:2] + (1,), 255,
                                        np.uint8)], -1)
    assert ssimulacra2(rgba, img) == 100.0
