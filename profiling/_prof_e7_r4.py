"""Round-4 e7 bench-path profile (use_device=True, the vardct_e7_mpps
axis)."""
import cProfile
import io
import os
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy  # noqa: E402


def make_image():
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:768, 0:1024]
    return np.stack([
        (xx * 255 // 1024 + rng.integers(0, 8, (768, 1024))),
        (yy * 255 // 768 + rng.integers(0, 8, (768, 1024))),
        ((xx + yy) * 255 // 1792 + rng.integers(0, 8, (768, 1024))),
    ], -1).clip(0, 255).astype(np.uint8)


img = make_image()
opts = LossyOptions(distance=1.0, effort=7, use_device=True)
t0 = time.time()
encode_lossy(img, opts)
print("warm %.1fs" % (time.time() - t0), flush=True)

pr = cProfile.Profile()
t0 = time.time()
pr.enable()
encode_lossy(img, opts)
pr.disable()
print("e7 device encode: %.2fs -> %.3f MP/s" %
      (time.time() - t0, 0.786432 / (time.time() - t0)), flush=True)
s = io.StringIO()
ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
ps.print_stats(36)
print(s.getvalue()[:6200], flush=True)
