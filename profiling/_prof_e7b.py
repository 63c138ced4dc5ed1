import cProfile, pstats, io, time
import numpy as np
from bench_vardct import _make_images
from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy

img = _make_images(1)[0]
for dev in (False, True):
    opts = LossyOptions(distance=1.0, effort=7, use_device=dev)
    t0=time.time(); out = encode_lossy(img, opts); print(f"dev={dev} warm {time.time()-t0:.1f}s size={len(out)}", flush=True)
    best = 1e9
    for _ in range(2):
        t0=time.time(); out = encode_lossy(img, opts); best=min(best, time.time()-t0)
    print(f"dev={dev} e7: {best:.2f}s = {0.786432/best:.3f} MP/s", flush=True)

pr = cProfile.Profile()
opts = LossyOptions(distance=1.0, effort=7, use_device=True)
pr.enable(); encode_lossy(img, opts); pr.disable()
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("tottime").print_stats(22)
print(s.getvalue()[:4200], flush=True)
