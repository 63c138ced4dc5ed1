import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
x = jnp.zeros((1<<23,), jnp.uint32) + jnp.arange(1<<23, dtype=jnp.uint32)  # 32MB
jax.block_until_ready(x)
for i in range(3):
    t0=time.time(); a = np.asarray(x); dt=time.time()-t0
    print(f"d2h 32MB: {dt:.2f}s = {32/dt:.1f} MB/s", flush=True)
y = np.arange(1<<23, dtype=np.uint32)
for i in range(3):
    t0=time.time(); d = jax.device_put(y); jax.block_until_ready(d); dt=time.time()-t0
    print(f"h2d 32MB: {dt:.2f}s = {32/dt:.1f} MB/s", flush=True)
# small-transfer latency
s = jnp.zeros((16,), jnp.uint32); jax.block_until_ready(s)
t0=time.time()
for _ in range(20): np.asarray(s)
print(f"fixed d2h latency: {(time.time()-t0)/20*1000:.1f} ms", flush=True)
