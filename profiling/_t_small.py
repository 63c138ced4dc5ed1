import time, numpy as np
import jax
from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy
rng = np.random.default_rng(0)
img = np.clip(np.cumsum(rng.integers(-2,3,(256,256,3)),1), 0, 255).astype(np.uint8)
for dev in (True,):
    t0=time.time(); out = encode_lossy(img, LossyOptions(distance=1.0, effort=7, use_device=dev))
    print(f"dev={dev} {time.time()-t0:.1f}s size={len(out)}", flush=True)
