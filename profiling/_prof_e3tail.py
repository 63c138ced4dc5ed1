import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from bench_vardct import _make_images
from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy
imgs = _make_images(4)
opts = LossyOptions(distance=1.0, effort=3, use_device=True)
encode_lossy(imgs[0], opts)   # warm
t0=time.time()
for im in imgs: encode_lossy(im, opts)
print(f"4 seq e3: {time.time()-t0:.2f}s", flush=True)
import cProfile, pstats, io
pr = cProfile.Profile(); pr.enable()
for im in imgs: encode_lossy(im, opts)
pr.disable()
s = io.StringIO(); pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(40); print(s.getvalue(), flush=True)
