"""Pallas-vs-XLA filter benchmark (run on a real TPU: `bash
_tpu_run.sh bench_pallas.py`); measures the gab+EPF chain both ways
and validates the Pallas output against XLA."""

import time
import numpy as np, jax, jax.numpy as jnp
from libjxl_tpu.core.frame_header import LoopFilter
from libjxl_tpu.models.pallas_filters import available, restore_pallas, static_lf_params
print("pallas available:", available(), flush=True)
rng = np.random.default_rng(0)
H, W = 2048, 2048
xyb = rng.random((3, H, W)).astype(np.float32)
lf = LoopFilter(); lf.gab = True; lf.epf_iters = 2
# per-pixel inv-sigma matching the XLA path's compute_sigma inputs
from libjxl_tpu.render import filters as F
rq_np = np.full((H // 8, W // 8), 20, np.int32)
sh_np = np.full((H // 8, W // 8), 4, np.int32)
inv_sig = np.repeat(np.repeat(np.asarray(F.compute_sigma(
    lf, None, None, rq_np, sh_np, 0.005, xp=np)), 8, 0), 8, 1).astype(
        np.float32)
t0 = time.time()
out = restore_pallas(jnp.asarray(xyb), jnp.asarray(inv_sig), static_lf_params(lf), True, 2)
r = np.asarray(out[:, :2, :2])
print(f"first call (compile): {time.time()-t0:.1f}s", flush=True)
xd = jax.device_put(jnp.asarray(xyb)); sd = jax.device_put(jnp.asarray(inv_sig))
n = 10
t0 = time.time()
for _ in range(n):
    out = restore_pallas(xd, sd, static_lf_params(lf), True, 2)
np.asarray(out[:, :2, :2])
dt = time.time()-t0
print(f"pallas gab+EPF2: {n*H*W/1e6/dt:.0f} MP/s", flush=True)

# XLA comparison
from libjxl_tpu.render.filters_jax import _restore, lf_params
yb, xb = H//8, W//8
rq = jnp.asarray(np.full((yb, xb), 20, np.int32))
sh = jnp.asarray(np.full((yb, xb), 4, np.int32))
o2 = _restore(xd, rq, sh, jnp.float32(0.005), lf_params(lf), True, 2)
np.asarray(o2[:, :2, :2])
t0 = time.time()
for _ in range(n):
    o2 = _restore(xd, rq, sh, jnp.float32(0.005), lf_params(lf), True, 2)
np.asarray(o2[:, :2, :2])
print(f"XLA gab+EPF2:    {n*H*W/1e6/(time.time()-t0):.0f} MP/s", flush=True)
# output validation: the two paths must agree to float32 summation noise
d = float(jnp.max(jnp.abs(out - o2)))
print(f"max |pallas - XLA| = {d:.2e}", flush=True)
