import time
import numpy as np
import jax, jax.numpy as jnp
import functools

from bench_decode import _make_stream
from libjxl_tpu.api.decoder import _device_decode_inputs

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
K = 8
per_frame = 3 * yb * xb * 64
vals = np.concatenate([fr.coeff_vals for _ in range(K)])
idx = np.concatenate([fr.coeff_idx.astype(np.int64) + k * per_frame for k in range(K)])
cap = 1 << int(np.ceil(np.log2(len(vals))))
vals = np.pad(vals, (0, cap - len(vals)))
idx = np.pad(idx, (0, cap - len(idx))).astype(np.int32)
v_d = jax.device_put(jnp.asarray(vals)); i_d = jax.device_put(jnp.asarray(idx))
N = K * per_frame
print(f"nnz={len(fr.coeff_vals)} per frame, dense {N}", flush=True)

@jax.jit
def scat_add(i, v):
    return jnp.zeros(N, jnp.float32).at[i].add(v.astype(jnp.float32))

@jax.jit
def scat_set_sorted(i, v):
    return jnp.zeros(N, jnp.float32).at[i].set(
        v.astype(jnp.float32), unique_indices=True, indices_are_sorted=True)

t = timeit(lambda: sync(scat_add(i_d, v_d)))
print(f"scatter add:        {t*1e3:8.1f} ms", flush=True)
t = timeit(lambda: sync(scat_set_sorted(i_d, v_d)))
print(f"scatter set sorted: {t*1e3:8.1f} ms", flush=True)
