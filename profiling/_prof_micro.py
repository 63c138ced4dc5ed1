"""Micro: front fetch f32-vs-f64, loop_step device time, entropy_codes split."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
from bench_vardct import _make_images
from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy

img = _make_images(1)[0]
d = 1.0
h, w = img.shape[:2]
yb, xb = (h+7)//8, (w+7)//8

from libjxl_tpu.models.vardct_heuristics import front_device
from libjxl_tpu.utils.device import device_put_fast
qf_d, xyb_p_d, pre_gab_d = front_device(device_put_fast(img[:, :, :3]), d, True, h=h, w=w, yb=yb, xb=xb)
jax.block_until_ready(xyb_p_d)
# compute time
t0=time.time()
qf_d, xyb_p_d, pre_gab_d = front_device(device_put_fast(img[:, :, :3]), d, True, h=h, w=w, yb=yb, xb=xb)
jax.block_until_ready(xyb_p_d); tc = time.time()-t0
t0=time.time(); a32 = np.asarray(xyb_p_d); t32=time.time()-t0
t0=time.time(); a64 = np.asarray(xyb_p_d, np.float64); t64=time.time()-t0
t0=time.time(); a64b = a32.astype(np.float64); tconv=time.time()-t0
print(f"front compute {tc:.3f}s fetch_f32 {t32:.3f}s fetch_f64 {t64:.3f}s host_widen {tconv:.3f}s shape {a32.shape}", flush=True)

# loop_step device time: run e7 once with instrumented LoopState
import libjxl_tpu.models.vardct_loop as VL
orig_run = VL.LoopState._run
times = []
def timed_run(self, qf, score):
    t0=time.time()
    out = orig_run(self, qf, score)
    jax.block_until_ready(out)
    t1=time.time()
    o2 = np.asarray(out)
    times.append((t1-t0, time.time()-t1))
    return out
VL.LoopState._run = timed_run
opts = LossyOptions(distance=1.0, effort=7, use_device=True)
encode_lossy(img, opts)
print("loop _run (device_s, fetch_s):", [(round(a,3), round(b,3)) for a,b in times], flush=True)
VL.LoopState._run = orig_run

# entropy_codes split on the e7 tokens: time sub-parts via patching
import libjxl_tpu.entropy.ans as A
import cProfile, pstats, io
pr = cProfile.Profile(); pr.enable()
encode_lossy(img, opts)
pr.disable()
s = io.StringIO(); pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(28); out = s.getvalue()
print(out, flush=True)
