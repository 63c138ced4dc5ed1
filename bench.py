"""Benchmark: lossless encode throughput (BASELINE config 1 axis).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: libjxl's published multithreaded design target is ~400 MP/s
decode (doc/xl_overview.md:8-9); our north star is >=10x libjxl per host
at e7/d1.0. Until the VarDCT path lands, this measures end-to-end
Modular lossless encode megapixels/s (device compute + host rANS +
byte assembly) on one chip, and vs_baseline reports the ratio against a
25 MP/s single-host libjxl-class encoder baseline.
"""

import json
import sys
import time

import numpy as np


def main():
    from libjxl_tpu.api.encoder import EncodeOptions, encode_lossless

    rng = np.random.default_rng(42)
    # Structured 1024x1024 RGB (photographic-ish gradients + texture).
    h = w = 1024
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([
        (xx * 255 // w + rng.integers(0, 8, (h, w))),
        (yy * 255 // h + rng.integers(0, 8, (h, w))),
        ((xx + yy) * 255 // (h + w) + rng.integers(0, 8, (h, w))),
    ], axis=-1).clip(0, 255).astype(np.uint8)

    opts = EncodeOptions(use_device=True)
    # warmup (compile; same shape as the measurement to hit the jit cache)
    encode_lossless(img, opts)

    n_reps = 3
    t0 = time.perf_counter()
    for _ in range(n_reps):
        data = encode_lossless(img, opts)
    dt = (time.perf_counter() - t0) / n_reps
    mpps = (h * w) / dt / 1e6

    baseline_mpps = 25.0  # libjxl-class host encoder at comparable effort
    print(json.dumps({
        "metric": "lossless_encode_throughput",
        "value": round(mpps, 3),
        "unit": "MP/s",
        "vs_baseline": round(mpps / baseline_mpps, 3),
    }))


if __name__ == "__main__":
    main()
