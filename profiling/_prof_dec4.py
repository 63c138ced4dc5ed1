import time
import numpy as np
import jax, jax.numpy as jnp

from bench_decode import _make_stream
from libjxl_tpu.api.decoder import _device_decode_inputs
import libjxl_tpu.models.vardct_decode as V

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
from libjxl_tpu.render.filters_jax import lf_params
lfp = lf_params(lf)

for K in (8, 16):
    inputs = [fr] * K
    # host pack (reuse the production code path up to the blob)
    import numpy as np
    per_frame = 3 * yb * xb * 64
    vals = np.concatenate([f.coeff_vals for f in inputs])
    idx = np.concatenate([f.coeff_idx.astype(np.int64) + k * per_frame for k, f in enumerate(inputs)])
    cap = max(1024, 1 << int(np.ceil(np.log2(len(vals)))))
    t0 = time.perf_counter()
    # emulate host pack cost
    out = V.decode_frames_device(inputs, lf, gab, epf_iters, h, w, fetch=False)
    sync(out)
    # now: device-only timing with blob prebuilt
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
    blob_h = np.concatenate(parts)
    t_pack = timeit(lambda: np.concatenate(parts))
    blob = jax.device_put(jnp.asarray(blob_h)); sync(blob)
    t_up = timeit(lambda: sync(jax.device_put(jnp.asarray(blob_h))))
    t_dev = timeit(lambda: sync(V._decode_batch(blob, lfp, bool(gab), int(epf_iters), h, w, 255, K, yb, xb, *fr.x_cc.shape, cap)))
    print(f"K={K}: host-pack {t_pack*1e3:6.1f} ms | upload {t_up*1e3:6.1f} ms | device {t_dev*1e3:6.1f} ms ({K*0.786432/t_dev:6.1f} MP/s)", flush=True)
