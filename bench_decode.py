"""Decode throughput axis: 1024x768 VarDCT d1.0 stream (BASELINE
config 2), serving mode — a batch of streams decoded on host threads
with the native AC-group token decoder + batched reconstruction +
XLA restoration filters."""

import time

import numpy as np


def _make_stream():
    from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:768, 0:1024]
    img = np.stack([
        (xx * 255 // 1024 + rng.integers(0, 8, (768, 1024))),
        (yy * 255 // 768 + rng.integers(0, 8, (768, 1024))),
        ((xx + yy) * 255 // 1792 + rng.integers(0, 8, (768, 1024))),
    ], -1).clip(0, 255).astype(np.uint8)
    return encode_lossy(img, LossyOptions(distance=1.0, effort=3))


def bench_decode_mpps() -> float:
    """Serving throughput: a batch of streams through decode_many, so
    host entropy decode, device filter/output and link transfers
    overlap across streams."""
    from libjxl_tpu.api.decoder import decode, decode_many
    from libjxl_tpu.config import config

    data = _make_stream()
    config.device_filters = True
    decode(data)  # warm: native build + filter compile
    n = 10
    t0 = time.perf_counter()
    decode_many([data] * n)
    dt = time.perf_counter() - t0
    return round(n * 0.786432 / dt, 2)


if __name__ == "__main__":
    import json
    print(json.dumps({"decode_mpps": bench_decode_mpps()}))
