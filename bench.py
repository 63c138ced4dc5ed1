"""Benchmark: lossless encode throughput (BASELINE config 1/5 axis).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Measures pipelined batch lossless encode (the serving mode): device
compute + transfers overlap host rANS across images. vs_baseline is the
ratio against a 25 MP/s single-host libjxl-class encoder at comparable
effort.
"""

import json
import time

import numpy as np


def make_image(seed: int, h: int = 1024, w: int = 1024) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        (xx * 255 // w + rng.integers(0, 8, (h, w))),
        (yy * 255 // h + rng.integers(0, 8, (h, w))),
        ((xx + yy) * 255 // (h + w) + rng.integers(0, 8, (h, w))),
    ], axis=-1).clip(0, 255).astype(np.uint8)


def main():
    from libjxl_tpu.api.encoder import EncodeOptions, encode_lossless_many

    n_images = 6
    imgs = [make_image(s) for s in range(n_images)]
    opts = EncodeOptions(use_device=True, entropy="prefix-device")

    # warmup: compile + first-transfer stall absorption (same shapes)
    encode_lossless_many(imgs[:2], opts)

    t0 = time.perf_counter()
    outs = encode_lossless_many(imgs, opts)
    dt = time.perf_counter() - t0
    assert all(len(o) > 0 for o in outs)
    mp = sum(im.shape[0] * im.shape[1] for im in imgs) / 1e6
    mpps = mp / dt

    baseline_mpps = 25.0  # libjxl-class host encoder at comparable effort
    print(json.dumps({
        "metric": "lossless_encode_throughput",
        "value": round(mpps, 3),
        "unit": "MP/s",
        "vs_baseline": round(mpps / baseline_mpps, 3),
    }))


if __name__ == "__main__":
    main()
