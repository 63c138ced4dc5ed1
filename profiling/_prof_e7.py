"""Profile where e7 VarDCT encode time goes (CPU-forced for stable
stage attribution; the bench runs the same path against the TPU)."""
import cProfile, pstats, io, time
import numpy as np

import jax
# keep the real backend (axon) — bench parity

from bench_vardct import _make_images
from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy

img = _make_images(1)[0]
opts = LossyOptions(distance=1.0, effort=7)
t0=time.time(); encode_lossy(img, opts); print("warm %.1fs" % (time.time()-t0), flush=True)

pr = cProfile.Profile()
t0 = time.time()
pr.enable()
encode_lossy(img, opts)
pr.disable()
print("e7 encode: %.2fs" % (time.time() - t0), flush=True)
s = io.StringIO()
ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
ps.print_stats(32)
print(s.getvalue()[:5500], flush=True)
