import time, functools
import numpy as np
import jax, jax.numpy as jnp
from bench_decode import _make_stream
from libjxl_tpu.api.decoder import _device_decode_inputs
import libjxl_tpu.models.vardct_decode as V
from libjxl_tpu.render.filters_jax import lf_params

def sync(x): np.asarray(x.reshape(-1)[:16])
def timeit(fn, reps=6):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); fn(); best = min(best, time.perf_counter()-t0)
    return best

data = _make_stream()
fr, key, lf = _device_decode_inputs(data)
h, w, yb, xb, gab, epf_iters, bits = key
lfp = lf_params(lf)
K = 8
inputs = [fr] * K
per_frame = 3 * yb * xb * 64
vals = np.concatenate([f.coeff_vals for f in inputs])
idx = np.concatenate([f.coeff_idx.astype(np.int64) + k * per_frame for k, f in enumerate(inputs)])
cap = max(1024, 1 << int(np.ceil(np.log2(len(vals)))))
vals_p = np.pad(vals.astype(np.int32), (0, cap - len(vals)))
idx_p = np.pad(idx, (0, cap - len(idx))).astype(np.int32)
parts = [vals_p, idx_p]
for f in inputs: parts.append(f.dc.ravel().astype(np.float32).view(np.int32))
for f in inputs: parts.append(f.raw_quant.ravel().astype(np.int32))
for f in inputs: parts.append(f.sharpness.ravel().astype(np.int32))
for f in inputs: parts.append(f.x_cc.ravel().astype(np.float32).view(np.int32))
for f in inputs: parts.append(f.b_cc.ravel().astype(np.float32).view(np.int32))
parts.append(np.asarray([f.inv_gs for f in inputs], np.float32).view(np.int32))
for f in inputs: parts.append(f.dms.ravel().astype(np.float32).view(np.int32))
parts.append(inputs[0].table.ravel().astype(np.float32).view(np.int32))
parts.append(np.asarray([f.quant_scale for f in inputs], np.float32).view(np.int32))
parts.append(np.asarray([f.intensity for f in inputs], np.float32).view(np.int32))
blob = jax.device_put(jnp.asarray(np.concatenate(parts))); sync(blob)

from libjxl_tpu.render import filters as F
from libjxl_tpu.render.filters_jax import _output_int
from libjxl_tpu.vardct.dct import idct_matrix
from libjxl_tpu.vardct.frame_dec import K_BIASES
ty_n, tx_n = fr.x_cc.shape

def build(stage):
    @jax.jit
    def prog(blob):
        off = 0
        def take(n, dtype=None, shape=None):
            nonlocal off
            part = jax.lax.slice_in_dim(blob, off, off + n)
            off += n
            if dtype is not None and dtype != jnp.int32:
                part = jax.lax.bitcast_convert_type(part, dtype)
            return part.reshape(shape) if shape is not None else part
        frd = V.FrameRecon(
            coeff_vals=take(cap), coeff_idx=take(cap),
            dc=take(K*3*yb*xb, jnp.float32, (K,3,yb,xb)),
            raw_quant=take(K*yb*xb, None, (K,yb,xb)),
            sharpness=take(K*yb*xb, None, (K,yb,xb)),
            x_cc=take(K*ty_n*tx_n, jnp.float32, (K,ty_n,tx_n)),
            b_cc=take(K*ty_n*tx_n, jnp.float32, (K,ty_n,tx_n)),
            inv_gs=take(K, jnp.float32),
            dms=take(K*3, jnp.float32, (K,3)),
            table=take(3*64, jnp.float32, (3,64)),
            quant_scale=take(K, jnp.float32),
            intensity=take(K, jnp.float32))
        q = jnp.zeros(K*3*yb*xb*64, jnp.float32).at[frd.coeff_idx].add(
            frd.coeff_vals.astype(jnp.float32)).reshape(K,3,yb,xb,64)
        if stage == "scatter": return q.sum()
        absq = jnp.abs(q)
        biased = q - K_BIASES[3] / jnp.where(q == 0, 1.0, q)
        biased = jnp.where(absq < 0.5, 0.0, biased)
        small = jnp.sign(q) * jnp.asarray(K_BIASES[:3], jnp.float32).reshape(1,3,1,1,1)
        biased = jnp.where((absq > 0.5) & (absq < 1.5), small, biased)
        tab = frd.table.reshape(1,3,1,1,64) * frd.dms.reshape(K,3,1,1,1)
        sd = (frd.inv_gs.reshape(K,1,1) / frd.raw_quant.astype(jnp.float32)).reshape(K,1,yb,xb,1)
        dq = biased * tab * sd
        ty = jnp.arange(yb)//8; tx = jnp.arange(xb)//8
        xc = frd.x_cc[:, ty[:,None], tx[None,:]].reshape(K,1,yb,xb,1)
        bc = frd.b_cc[:, ty[:,None], tx[None,:]].reshape(K,1,yb,xb,1)
        y_ch = dq[:,1:2]
        dq = jnp.concatenate([dq[:,0:1]+xc*y_ch, y_ch, dq[:,2:3]+bc*y_ch], axis=1)
        if stage == "dequant": return dq.sum()
        stored = dq.at[..., 0].set(frd.dc)
        blocks = stored.reshape(K,3,yb,xb,8,8).transpose(0,1,2,3,5,4)
        im = jnp.asarray(idct_matrix(8), jnp.float32)
        pix = jnp.einsum("rk,KCyxkl,cl->KCyrxc", im, blocks, im, preferred_element_type=jnp.float32)
        img = pix.reshape(K,3,yb*8,xb*8)[:,:,:h,:w]
        if stage == "idct": return img.sum()
        def restore(xyb, raw_quant, sharp, scale):
            inv_sigma = F.compute_sigma(lfp, None, None, raw_quant, sharp, scale, xp=jnp)
            return F.epf_step1(xyb, inv_sigma, lfp, xp=jnp)
        img = jax.vmap(restore)(img, frd.raw_quant, frd.sharpness, frd.quant_scale)
        if stage == "epf": return img.sum()
        out = jax.vmap(lambda x, i: _output_int(x, i, 255))(img, frd.intensity)
        return out.reshape(-1)
    return prog

for st in ("scatter", "dequant", "idct", "epf", "full"):
    p = build(st)
    t = timeit(lambda: sync(p(blob)))
    print(f"{st:8s} {t*1e3:7.1f} ms", flush=True)
