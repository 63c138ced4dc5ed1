"""Profile the device decode axis: where do the 6.3MP batches spend time?"""
import time
import numpy as np
import jax

from bench_decode import _make_stream
from libjxl_tpu.api.decoder import _device_decode_inputs
from libjxl_tpu.models.vardct_decode import decode_frames_device

def sync(x): np.asarray(x.reshape(-1)[:16])

def timeit(fn, reps=6):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); fn(); best = min(best, time.perf_counter()-t0)
    return best

data = _make_stream()
fr, key, lf = _device_decode_inputs(data)
h, w, yb, xb, gab, epf_iters, bits = key
print("epf_iters", epf_iters, "gab", gab, flush=True)
for K in (8, 16):
    inputs = [fr] * K
    t = timeit(lambda: sync(decode_frames_device(inputs, lf, gab, epf_iters, h, w, fetch=False)))
    print(f"K={K}: {t*1e3:8.1f} ms ({K*0.786432/t:8.1f} MP/s)", flush=True)
