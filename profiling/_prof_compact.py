"""Isolate compaction sub-costs on TPU and test row-gather variants."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    np.asarray(x.reshape(-1)[:16])


def timeit(fn, reps=6):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


Cn = 393216          # chunks (25.2M tokens / 64)
NW = 60
CAP = 1 << 22


@functools.partial(jax.jit, static_argnames=("cap",))
def cid_only(nw, cap=CAP):
    wstart = jnp.cumsum(nw) - nw
    marks = jnp.zeros(cap, jnp.int32).at[wstart].add(1, mode="drop")
    cid = jnp.cumsum(marks) - 1
    return cid, wstart


@functools.partial(jax.jit, static_argnames=("cap",))
def gather_scalar(buf, cid, wstart, cap=CAP):
    j = jnp.arange(cap)
    src = cid * NW + (j - wstart[cid])
    return buf.reshape(-1)[jnp.clip(src, 0, buf.size - 1)]


@functools.partial(jax.jit, static_argnames=("cap",))
def compact_rows8(buf64, nw8, cap=CAP // 8):
    # buf64: (Cn, 64) padded; rows of 8 words; nw8 = rows per chunk
    wstart8 = jnp.cumsum(nw8) - nw8
    marks = jnp.zeros(cap, jnp.int32).at[wstart8].add(1, mode="drop")
    cid = jnp.cumsum(marks) - 1
    j = jnp.arange(cap)
    rsrc = cid * 8 + (j - wstart8[cid])
    rows = buf64.reshape(-1, 8)
    return rows[jnp.clip(rsrc, 0, rows.shape[0] - 1)]


@functools.partial(jax.jit, static_argnames=("cap",))
def compact_rows16(buf64, nw16, cap=CAP // 16):
    wstart = jnp.cumsum(nw16) - nw16
    marks = jnp.zeros(cap, jnp.int32).at[wstart].add(1, mode="drop")
    cid = jnp.cumsum(marks) - 1
    j = jnp.arange(cap)
    rsrc = cid * 4 + (j - wstart[cid])
    rows = buf64.reshape(-1, 16)
    return rows[jnp.clip(rsrc, 0, rows.shape[0] - 1)]


def main():
    rng = np.random.default_rng(0)
    nw_h = rng.integers(12, 28, Cn).astype(np.int32)
    nw = jax.device_put(jnp.asarray(nw_h))
    buf = jax.device_put(
        jnp.asarray(rng.integers(0, 1 << 31, (Cn, NW)).astype(np.uint32)))
    buf64 = jnp.pad(buf, ((0, 0), (0, 4)))
    buf64 = jax.device_put(buf64)
    sync(buf64)

    t = timeit(lambda: sync(cid_only(nw)[0]))
    print(f"scatter+cumsum cid: {t*1e3:8.1f} ms", flush=True)

    cid, wstart = cid_only(nw)
    sync(cid)
    t = timeit(lambda: sync(gather_scalar(buf, cid, wstart)))
    print(f"scalar gather 4M:   {t*1e3:8.1f} ms", flush=True)

    nw8 = (nw + 7) // 8
    t = timeit(lambda: sync(compact_rows8(buf64, nw8)))
    print(f"rows8 full compact: {t*1e3:8.1f} ms", flush=True)

    nw16 = (nw + 15) // 16
    t = timeit(lambda: sync(compact_rows16(buf64, nw16)))
    print(f"rows16 full compact:{t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
