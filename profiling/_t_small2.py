import time, numpy as np
from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy
rng = np.random.default_rng(0)
img = np.clip(np.cumsum(rng.integers(-2,3,(256,256,3)),1), 0, 255).astype(np.uint8)
opts = LossyOptions(distance=1.0, effort=7, use_device=True)
t0=time.time(); encode_lossy(img, opts); print(f"warm {time.time()-t0:.1f}s", flush=True)
for i in range(3):
    t0=time.time(); encode_lossy(img, opts); print(f"run {time.time()-t0:.2f}s", flush=True)
