"""Round-4 decode decomposition: host entropy stage vs device program
vs relay fetch, for the e2e decode_many axis (VERDICT r3 item #3)."""
import time
import numpy as np

import bench_decode
from libjxl_tpu.api.decoder import _device_decode_inputs, decode_many
from libjxl_tpu.config import config

data = bench_decode._make_stream()
config.device_filters = True
MP = 0.786432

# 1. Host entropy stage alone (single thread)
_device_decode_inputs(data)  # warm native lib
n = 8
t0 = time.perf_counter()
for _ in range(n):
    _device_decode_inputs(data)
dt = time.perf_counter() - t0
print(f"host _device_decode_inputs 1-thread: {dt/n*1000:.1f} ms/img = "
      f"{n*MP/dt:.2f} MP/s")

# 1b. threaded (3 workers, as decode_many does)
from concurrent.futures import ThreadPoolExecutor
with ThreadPoolExecutor(3) as ex:
    t0 = time.perf_counter()
    list(ex.map(lambda s: _device_decode_inputs(s), [data] * 24))
    dt = time.perf_counter() - t0
print(f"host entropy 3-threads x24: {dt:.3f} s = {24*MP/dt:.2f} MP/s")

with ThreadPoolExecutor(8) as ex:
    t0 = time.perf_counter()
    list(ex.map(lambda s: _device_decode_inputs(s), [data] * 24))
    dt = time.perf_counter() - t0
print(f"host entropy 8-threads x24: {dt:.3f} s = {24*MP/dt:.2f} MP/s")

# 2. Full decode_many (warm)
decode_many([data] * 8)
t0 = time.perf_counter()
decode_many([data] * 24)
dt = time.perf_counter() - t0
print(f"decode_many x24 e2e: {dt:.3f} s = {24*MP/dt:.2f} MP/s")
