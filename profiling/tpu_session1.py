"""Consolidated TPU measurement session (round 5): front_device fetch
timing, e7 stage timing, pallas filter bench, e2e serving decomposition.
Writes progress lines + JSON to profiling/tpu_session1.out."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
OUT = {}
def log(*a):
    print(*a, flush=True)

import numpy as np
import bench_vardct as B

log("== front_device fetch timing ==")
from libjxl_tpu.models.vardct_heuristics import front_device
from libjxl_tpu.utils.device import device_put_fast
img = B._make_images(1)[0]
h, w = 768, 1024; yb, xb = h//8, w//8
qf_d, xyb_p_d, pre_gab_d = front_device(device_put_fast(img[:, :, :3]), 1.0, True, h=h, w=w, yb=yb, xb=xb)
np.asarray(qf_d)
rows=[]
for rep in range(3):
    t0=time.time()
    qf_d, xyb_p_d, pre_gab_d = front_device(device_put_fast(img[:, :, :3]), 1.0, True, h=h, w=w, yb=yb, xb=xb)
    t1=time.time(); qf = np.asarray(qf_d)
    t2=time.time(); xyb_p = np.asarray(xyb_p_d)
    t3=time.time()
    rows.append((t1-t0, t2-t1, t3-t2))
    log(f"dispatch {t1-t0:.3f} qf_fetch(sync) {t2-t1:.3f} xyb_fetch {t3-t2:.3f}")
OUT["front_device"] = rows

log("== e7 timing (2-iter loop) ==")
from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy
opts = LossyOptions(distance=1.0, effort=7, use_device=True)
t0=time.time(); encode_lossy(img, opts); log(f"e7 warm {time.time()-t0:.1f}s")
ts=[]
for _ in range(3):
    t0=time.time(); encode_lossy(img, opts); ts.append(time.time()-t0)
log("e7 times:", [round(t,2) for t in ts], "->", round(0.786432/min(ts),3), "MP/s")
OUT["e7_s"] = ts

log("== e3 batch ==")
t0=time.time()
v = B.bench_vardct_encode_mpps()
log(f"vardct e3 batch: {v} MP/s ({time.time()-t0:.0f}s incl warm)")
OUT["e3_mpps"] = v

log("== pallas filters ==")
try:
    import subprocess
    r = subprocess.run([sys.executable, "bench_pallas.py"], capture_output=True, text=True, timeout=1200,
                       cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    log("bench_pallas stdout:", r.stdout[-2000:])
    OUT["pallas"] = r.stdout[-2000:]
except Exception as e:
    log("pallas failed:", e)

log("== e2e lossless serving decomposition ==")
import bench as BE
try:
    t0=time.time()
    mp = BE.bench_encode_mpps() if hasattr(BE, 'bench_encode_mpps') else None
    log("lossless e2e:", mp, f"({time.time()-t0:.0f}s)")
    OUT["lossless_e2e"] = mp
except Exception as e:
    log("e2e failed:", repr(e))

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "tpu_session1.json"), "w") as f:
    json.dump(OUT, f, default=str)
log("SESSION DONE")
