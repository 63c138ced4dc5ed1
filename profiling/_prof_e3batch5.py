import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax
from bench_vardct import _make_images
from libjxl_tpu.vardct.frame_enc import LossyOptions, _falcon_device_scalars
from libjxl_tpu.models.vardct_pipeline import encode_lossy_frame_device_batch
from libjxl_tpu.utils.device import device_put_fast
imgs = _make_images(8)
opts = LossyOptions(distance=1.0, effort=3, use_device=True)
s = _falcon_device_scalars(imgs[0].shape, opts)
(qac_f, inv_qac_f, table, th_y, th_xb, mul_dc, h, w, yb, xb, x_qm_mul) = s
px = np.stack(imgs)
args = [device_put_fast(px), device_put_fast(qac_f), device_put_fast(inv_qac_f),
        device_put_fast(table), device_put_fast(th_y), device_put_fast(th_xb), device_put_fast(mul_dc)]
pb, db = encode_lossy_frame_device_batch(*args, h=h, w=w, yb=yb, xb=xb, x_qm_mul=x_qm_mul)
jax.block_until_ready(pb)
for i in range(4):
    t0=time.time()
    pxd = device_put_fast(px); jax.block_until_ready(pxd)
    t1=time.time()
    pb, db = encode_lossy_frame_device_batch(pxd, *args[1:], h=h, w=w, yb=yb, xb=xb, x_qm_mul=x_qm_mul)
    jax.block_until_ready(pb)
    t2=time.time()
    st = np.asarray(pb)
    t3=time.time()
    print(f"h2d {t1-t0:.3f}s compute {t2-t1:.3f}s fetch {t3-t2:.3f}s payload {st.nbytes/1e6:.1f}MB", flush=True)
