"""Per-stage roofline profile of VarDCT e7 and e3 on the live device.

Run with JXLT_PROF=1."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JXLT_PROF", "1")

import numpy as np                                    # noqa: E402

from bench_vardct import _make_images                 # noqa: E402
from libjxl_tpu.utils import prof                     # noqa: E402
from libjxl_tpu.vardct.frame_enc import (             # noqa: E402
    LossyOptions, encode_lossy, encode_lossy_many,
)

img = _make_images(1)[0]

print("== e7 warm ==", flush=True)
opts = LossyOptions(distance=1.0, effort=7, use_device=True)
t0 = time.time()
encode_lossy(img, opts)
print(f"warm {time.time()-t0:.1f}s", flush=True)

prof.reset()
ts = []
for i in range(3):
    t0 = time.time()
    encode_lossy(img, opts)
    ts.append(time.time() - t0)
print(f"e7 runs: {[round(t, 2) for t in ts]}", flush=True)
prof.dump("e7 stages (3 runs)")

print("== e3 warm ==", flush=True)
imgs = _make_images(8)
opts3 = LossyOptions(distance=1.0, effort=3, use_device=True)
encode_lossy(imgs[0], opts3)
prof.reset()
t0 = time.time()
outs = encode_lossy_many(imgs, opts3)
dt = time.time() - t0
print(f"e3 batch of 8: {dt:.2f}s = {8*0.786432/dt:.2f} MP/s", flush=True)
prof.dump("e3 stages (8 images)")

json.dump({"e7_runs": ts, "e3_batch_s": dt},
          open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "_prof_stages.json"), "w"))
print("DONE", flush=True)
