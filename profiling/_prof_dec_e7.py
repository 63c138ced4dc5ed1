import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from bench_decode import E7_STREAM_PATH
data = open(E7_STREAM_PATH, "rb").read()
from libjxl_tpu.api.decoder import decode_many, _device_decode_inputs
from libjxl_tpu.config import config
config.device_filters = True
decode_many([data]*4)
for n in (8, 16):
    t0=time.time(); decode_many([data]*n); dt=time.time()-t0
    print(f"decode_many({n}): {dt:.2f}s = {n*0.786432/dt:.2f} MP/s", flush=True)
# host alone
from concurrent.futures import ThreadPoolExecutor
t0=time.time()
with ThreadPoolExecutor(3) as ex: list(ex.map(_device_decode_inputs, [data]*16))
print(f"host var entropy 16 on 3 threads: {time.time()-t0:.2f}s", flush=True)
