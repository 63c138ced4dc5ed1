import cProfile, pstats, io, time
import numpy as np
from bench_vardct import _make_images
from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy

img = _make_images(1)[0]
opts = LossyOptions(distance=1.0, effort=7, use_device=True)
encode_lossy(img, opts)
pr = cProfile.Profile()
t0 = time.time()
pr.enable(); encode_lossy(img, opts); pr.disable()
print(f"wall {time.time()-t0:.2f}s", flush=True)
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(30)
print(s.getvalue()[:5200], flush=True)
