"""VarDCT (lossy) encode throughput axis: 1024x768 d1.0 (BASELINE
config 2) through the device encode pipeline (XYB + MXU-batched DCT +
quantize on TPU, host entropy coding)."""

import time

import numpy as np


def _make_images(n: int):
    out = []
    for s in range(n):
        rng = np.random.default_rng(s)
        yy, xx = np.mgrid[0:768, 0:1024]
        out.append(np.stack([
            (xx * 255 // 1024 + rng.integers(0, 8, (768, 1024))),
            (yy * 255 // 768 + rng.integers(0, 8, (768, 1024))),
            ((xx + yy) * 255 // 1792 + rng.integers(0, 8, (768, 1024))),
        ], -1).clip(0, 255).astype(np.uint8))
    return out


def bench_vardct_encode_mpps() -> float:
    from libjxl_tpu.vardct.frame_enc import (
        LossyOptions, encode_lossy, encode_lossy_many,
    )

    imgs = _make_images(8)
    opts = LossyOptions(distance=1.0, effort=3, use_device=True)
    encode_lossy(imgs[0], opts)          # warm: compile
    dt = float("inf")
    for _ in range(4):        # best of 4: dev-relay throughput wobbles
        t0 = time.perf_counter()
        outs = encode_lossy_many(imgs, opts)
        dt = min(dt, time.perf_counter() - t0)
    assert all(len(o) > 0 for o in outs)
    return round(len(imgs) * 0.786432 / dt, 2)


def bench_vardct_e7_mpps() -> float:
    """Full-heuristics e7 encode via the device-resident butteraugli
    loop (models/vardct_loop: requantize + recon + filters + diffmap as
    one program per iteration) + device EPF sharpness search: the
    BASELINE config-4 effort class. Streams verified oracle-conformant
    with quality identical to the host loop (tests/test_vardct_encoder
    ::test_device_heuristics_e5_e7)."""
    from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy

    img = _make_images(1)[0]
    opts = LossyOptions(distance=1.0, effort=7, use_device=True)
    encode_lossy(img, opts)              # warm: compile
    dt = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        out = encode_lossy(img, opts)
        dt = min(dt, time.perf_counter() - t0)
    assert len(out) > 0
    return round(0.786432 / dt, 3)


if __name__ == "__main__":
    import json

    print(json.dumps({"vardct_encode_mpps": bench_vardct_encode_mpps(),
                      "vardct_e7_mpps": bench_vardct_e7_mpps()}))
