"""Validate the Pallas pack kernel compiled on real TPU vs XLA, then time it."""
import time
import numpy as np
import jax, jax.numpy as jnp

from libjxl_tpu.models.lossless import _pack_buffers_xla, chunk_pack_device
from libjxl_tpu.models.pack_kernel import CB, T, pack_chunks_tpu

rng = np.random.default_rng(1)
cn = CB * 4
n = cn * T
v = np.minimum(rng.geometric(0.2, n) - 1, (1 << 19) - 1).astype(np.uint32)
valid = np.ones(n, bool)
valid[T // 2:T] = False
valid[(cn - 1) * T:] = False
lens_t = rng.integers(1, 16, 96).astype(np.int32)
bits_t = (rng.integers(0, 1 << 30, 96).astype(np.uint32)
          & ((np.uint32(1) << lens_t.astype(np.uint32)) - 1))
code_bits = np.zeros(256, np.uint32); code_bits[:96] = bits_t
code_len = np.zeros(256, np.int32); code_len[:96] = lens_t

buf_x, cb_x = _pack_buffers_xla(
    jnp.asarray(np.where(valid, v, 0)), jnp.asarray(valid),
    jnp.asarray(code_bits), jnp.asarray(code_len))
vs = np.where(valid, v, np.uint32(0xFFFFFFFF)).reshape(cn, T)
lut = ((code_len.astype(np.int64) << 16) | code_bits).astype(np.int32)[:96]
t0 = time.time()
buf_k, cb_k = pack_chunks_tpu(jnp.asarray(vs), jnp.asarray(lut))
np.asarray(buf_k)
print(f"first call (compile): {time.time()-t0:.1f}s", flush=True)
assert np.array_equal(np.asarray(cb_k), np.asarray(cb_x)), "cb mismatch"
assert np.array_equal(np.asarray(buf_k), np.asarray(buf_x)), "buf mismatch"
print("MATCH OK", flush=True)

# timing at bench scale: 25.2M tokens
big_n = 8 * 16 * 3 * 256 * 256
big_cn = big_n // T
vbig = jax.device_put(jnp.asarray(
    np.minimum(rng.geometric(0.25, big_n) - 1, 4000)
    .astype(np.uint32).reshape(big_cn, T)))
lutj = jax.device_put(jnp.asarray(lut))

def sync(x): np.asarray(x.reshape(-1)[:16])

def timeit(fn, reps=6):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); fn(); best = min(best, time.perf_counter() - t0)
    return best

MP = 8 * 1.048576
t = timeit(lambda: sync(pack_chunks_tpu(vbig, lutj)[0]))
print(f"kernel pack 25.2M tokens: {t*1e3:8.1f} ms ({MP/t:8.1f} MP/s)", flush=True)

# full chunk_pack_device (kernel + rows8 compaction)
wide = vbig.reshape(-1).astype(jnp.uint16)
validb = jnp.ones(big_n, bool)
cbj = jax.device_put(jnp.asarray(code_bits)); clj = jax.device_put(jnp.asarray(code_len))
t = timeit(lambda: sync(chunk_pack_device(wide, validb, cbj, clj, cap_words=1 << 23)[0]))
print(f"chunk_pack full:          {t*1e3:8.1f} ms ({MP/t:8.1f} MP/s)", flush=True)
