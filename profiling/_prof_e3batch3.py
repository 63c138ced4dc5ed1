import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JXLT_PROF", "1")
import numpy as np
from bench_vardct import _make_images
from libjxl_tpu.utils import prof
from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy, encode_lossy_many
imgs = _make_images(8)
opts = LossyOptions(distance=1.0, effort=3, use_device=True)
encode_lossy_many(imgs, opts, workers=2)       # warm B=8
for wk in (2, 3):
    best = 1e9
    for _ in range(3):
        t0=time.time(); encode_lossy_many(imgs, opts, workers=wk); best=min(best, time.time()-t0)
    print(f"batched workers={wk}: {best:.2f}s = {8*0.786432/best:.2f} MP/s", flush=True)
prof.reset()
t0=time.time(); encode_lossy_many(imgs, opts, workers=2); dt=time.time()-t0
print(f"one run {dt:.2f}s", flush=True)
prof.dump("per-stage (8 imgs, 2 workers)")
# e7 with native tail
img = imgs[0]
o7 = LossyOptions(distance=1.0, effort=7, use_device=True)
encode_lossy(img, o7)
prof.reset()
ts=[]
for _ in range(3):
    t0=time.time(); encode_lossy(img, o7); ts.append(time.time()-t0)
print("e7 runs:", [round(t,2) for t in ts], "=", round(0.786432/min(ts),3), "MP/s", flush=True)
prof.dump("e7 stages (3 runs)")
