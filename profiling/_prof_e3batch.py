import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, copy
from bench_vardct import _make_images
from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy, encode_lossy_many
imgs = _make_images(8)
opts = LossyOptions(distance=1.0, effort=3, use_device=True)
encode_lossy(imgs[0], opts)   # warm
for wk in (1, 2, 3, 4):
    best = 1e9
    for _ in range(3):
        t0=time.time(); encode_lossy_many(imgs, opts, workers=wk); best=min(best, time.time()-t0)
    print(f"workers={wk}: {best:.2f}s = {8*0.786432/best:.2f} MP/s", flush=True)
# dispatch+fetch only
disp = copy.copy(opts); disp._dispatch_only = True
import jax.numpy as jnp
best=1e9
for _ in range(3):
    t0=time.time()
    pending = [encode_lossy(im, disp) for im in imgs]
    stacked = np.asarray(jnp.stack([p[0] for p in pending]))
    best=min(best, time.time()-t0)
print(f"dispatch+stacked fetch only: {best:.2f}s = {8*0.786432/best:.2f} MP/s, payload {stacked.nbytes/1e6:.1f} MB", flush=True)
