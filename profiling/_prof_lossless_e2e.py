import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JXLT_PROF"] = "1"
import numpy as np
from libjxl_tpu.utils import prof
import libjxl_tpu.api.encoder as E

# wrap hot internals with stages
for name in ("_prefix_upload", "_prefix_code_state", "_prefix_fused", "_prefix_assemble"):
    fn = getattr(E, name)
    def mk(fn=fn, name=name):
        def wrapped(*a, **k):
            with prof.stage(name):
                return fn(*a, **k)
        return wrapped
    setattr(E, name, mk())

from bench import make_image, bench_lossless_encode
r = bench_lossless_encode()
prof.reset()
from libjxl_tpu.api.encoder import EncodeOptions, encode_lossless_many
imgs = [make_image(s) for s in range(16)]
opts = EncodeOptions(use_device=True, entropy="prefix-device")
t0=time.time(); outs = encode_lossless_many(imgs, opts); dt=time.time()-t0
print(f"16x1MP: {dt:.2f}s = {16/dt:.1f} MP/s (bench said {r})", flush=True)
prof.dump("stages")
total = sum(len(o) for o in outs)
print(f"payload {total/1e6:.2f} MB -> {total/1e6/dt:.1f} MB/s effective", flush=True)
