import time
import numpy as np
import jax, jax.numpy as jnp
import functools

from bench_decode import _make_stream
from libjxl_tpu.api.decoder import _device_decode_inputs
from libjxl_tpu.models.vardct_decode import FrameRecon
from libjxl_tpu.render.filters_jax import lf_params, _output_int
from libjxl_tpu.render import filters as F
from libjxl_tpu.vardct.dct import idct_matrix

def sync(x): np.asarray(x.reshape(-1)[:16])
def timeit(fn, reps=6):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); fn(); best = min(best, time.perf_counter()-t0)
    return best

data = _make_stream()
fr0, key, lf = _device_decode_inputs(data)
h, w, yb, xb, gab, epf_iters, bits = key
K = 8
lfp = lf_params(lf)
img_d = jax.device_put(jnp.asarray(np.random.default_rng(0).random((K, 3, yb*8, xb*8), np.float32)))
rq = jax.device_put(jnp.asarray(np.stack([fr0.raw_quant]*K)))
sh = jax.device_put(jnp.asarray(np.stack([fr0.sharpness]*K)))
sc = jax.device_put(jnp.asarray(np.asarray([fr0.quant_scale]*K, np.float32)))
it = jax.device_put(jnp.asarray(np.asarray([fr0.intensity]*K, np.float32)))
dq_d = jax.device_put(jnp.asarray(np.random.default_rng(0).random((K, 3, yb, xb, 64), np.float32)))
dc_d = jax.device_put(jnp.asarray(np.random.default_rng(0).random((K, 3, yb, xb), np.float32)))

@functools.partial(jax.jit, static_argnames=())
def idct_only(dq, dc):
    stored = dq.at[..., 0].set(dc)
    blocks = stored.reshape(K, 3, yb, xb, 8, 8).transpose(0, 1, 2, 3, 5, 4)
    im = jnp.asarray(idct_matrix(8), jnp.float32)
    pix = jnp.einsum("rk,KCyxkl,cl->KCyrxc", im, blocks, im,
                     preferred_element_type=jnp.float32)
    return pix.reshape(K, 3, yb * 8, xb * 8)

@jax.jit
def restore_only(img):
    def restore(xyb, raw_quant, sharp, scale):
        inv_sigma = F.compute_sigma(lfp, None, None, raw_quant, sharp, scale, xp=jnp)
        return F.epf_step1(xyb, inv_sigma, lfp, xp=jnp)
    return jax.vmap(restore)(img, rq, sh, sc)

@jax.jit
def out_only(img):
    return jax.vmap(lambda x, i: _output_int(x, i, 255))(img[:, :, :h, :w], it).reshape(-1)

MP = K * 0.786432
for name, fn in [("idct", lambda: sync(idct_only(dq_d, dc_d))),
                 ("epf1+sigma", lambda: sync(restore_only(img_d))),
                 ("output_int", lambda: sync(out_only(img_d)))]:
    t = timeit(fn)
    print(f"{name:12s} {t*1e3:8.1f} ms ({MP/t:8.1f} MP/s)", flush=True)
