import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JXLT_PROF", "1")
import numpy as np
from bench_vardct import _make_images
from libjxl_tpu.utils import prof
from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy_many
imgs = _make_images(8)
opts = LossyOptions(distance=1.0, effort=3, use_device=True)
encode_lossy_many(imgs, opts, workers=3)       # warm
best=1e9
for i in range(5):
    prof.reset()
    t0=time.time(); encode_lossy_many(imgs, opts, workers=3); dt=time.time()-t0
    best=min(best,dt)
    print(f"run {i}: {dt:.2f}s = {8*0.786432/dt:.2f} MP/s", flush=True)
prof.dump("last run stages")
print(f"best {best:.2f}s = {8*0.786432/best:.2f} MP/s", flush=True)
