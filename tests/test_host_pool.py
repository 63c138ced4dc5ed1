"""Process-pool host entropy stage (parallel/host_pool.py).

The serving decode's host half must produce identical staging arrays
whether it runs in-process, on threads, or on worker processes — and
decode_many must emit identical pixels with the pool enabled
(reference analog: thread_parallel_runner results are agnostic to the
runner, lib/threads/thread_parallel_runner_internal.h)."""

import numpy as np
import pytest

from libjxl_tpu.config import config
from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy


def _img():
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:96, 0:160]
    return np.stack([
        (xx * 255 // 160 + rng.integers(0, 10, (96, 160))),
        (yy * 255 // 96 + rng.integers(0, 10, (96, 160))),
        ((xx + yy) * 255 // 256 + rng.integers(0, 10, (96, 160))),
    ], -1).clip(0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def stream():
    return encode_lossy(_img(), LossyOptions(distance=1.0, effort=3))


def _pool_or_skip():
    from libjxl_tpu.parallel import host_pool
    try:
        host_pool.warm(2)
    except Exception as e:                      # no spawn in this env
        pytest.skip(f"process pool unavailable: {e}")
    return host_pool


def test_pool_matches_inprocess_staging(stream):
    from libjxl_tpu.api.decoder import _device_decode_inputs
    hp = _pool_or_skip()
    ref = _device_decode_inputs(stream)
    assert ref is not None
    got = hp.map_decode_inputs([stream] * 3, workers=2)
    assert all(g is not None for g in got)
    for g in got:
        assert g[1] == ref[1]                   # batch key
        for a, b in zip(ref[0], g[0]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_decode_many_with_process_pool(stream):
    from libjxl_tpu.api.decoder import decode_many
    hp = _pool_or_skip()
    old_f, old_p = config.device_filters, config.decode_host_processes
    config.device_filters = True
    try:
        config.decode_host_processes = 0
        ref = decode_many([stream] * 3)
        config.decode_host_processes = 2
        got = decode_many([stream] * 3)
    finally:
        config.device_filters = old_f
        config.decode_host_processes = old_p
        hp.shutdown()
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)
