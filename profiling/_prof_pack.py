"""Stage-level profile of chunk_pack_device on live TPU.

Separates: _lut2_apply (prefix LUT), token math, the 64-step insertion
scan, and the word compaction.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from libjxl_tpu.models.lossless import (
    PACK_NW, PACK_T, _floor_log2_u32, _lut2_apply, _token_id,
)


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


N = 8 * 16 * 3 * 256 * 256  # 8 images of 16 groups x 3ch x 256^2
MP = 8 * 1.048576


@jax.jit
def stage_lut(v, code_bits, code_len):
    token = _token_id(v)
    cb, cl = _lut2_apply(token, code_bits.astype(jnp.int32),
                         code_len.astype(jnp.int32))
    return cb + cl


@jax.jit
def stage_tokmath(v):
    token = _token_id(v)
    n = jnp.maximum(_floor_log2_u32(jnp.maximum(v, 1)), 2)
    nbits = jnp.where(v < 16, 0, n - 2).astype(jnp.uint32)
    raw = jnp.where(v < 16, 0, v & ((jnp.uint32(1) << nbits) - 1))
    return token + raw.astype(jnp.int32) + nbits.astype(jnp.int32)


@jax.jit
def stage_scan(comb, lens):
    T, NW = PACK_T, PACK_NW
    off = jnp.cumsum(lens, axis=1) - lens
    wt = (off >> 5).astype(jnp.int32)
    b = (off & 31).astype(jnp.uint32)
    lo = comb << b
    hi = jnp.where(b == 0, 0, comb >> ((jnp.uint32(32) - b) & 31))
    iota = jax.lax.broadcasted_iota(jnp.int32, (comb.shape[0], NW), 1)

    def insert(buf, xs):
        wtj, loj, hij = xs
        buf = buf | jnp.where(iota == wtj[:, None], loj[:, None], 0) \
                  | jnp.where(iota == wtj[:, None] + 1, hij[:, None], 0)
        return buf, None

    buf, _ = jax.lax.scan(
        insert, jnp.zeros((comb.shape[0], NW), jnp.uint32),
        (wt.T, lo.T, hi.T))
    return buf, (off[:, -1] + lens[:, -1]).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("cap_words",))
def stage_compact(buf, chunk_bits, cap_words=1 << 22):
    NW = PACK_NW
    nw = (chunk_bits + 31) >> 5
    wstart = jnp.cumsum(nw) - nw
    marks = jnp.zeros(cap_words, jnp.int32).at[wstart].add(1, mode="drop")
    cid = jnp.cumsum(marks) - 1
    j = jnp.arange(cap_words)
    src = cid * NW + (j - wstart[cid])
    dense = buf.reshape(-1)[jnp.clip(src, 0, buf.size - 1)]
    total_words = wstart[-1] + nw[-1]
    return jnp.where(j < total_words, dense, 0)


def main():
    rng = np.random.default_rng(0)
    # realistic residual distribution: geometric-ish small values
    v_host = np.minimum(
        rng.geometric(0.25, N) - 1, 4000).astype(np.uint32)
    v = jax.device_put(jnp.asarray(v_host))
    code_bits = jnp.asarray(rng.integers(0, 1 << 14, 256).astype(np.uint32))
    code_len = jnp.asarray(rng.integers(4, 15, 256).astype(np.int32))

    t = timeit(lambda: sync(stage_lut(v, code_bits, code_len)))
    print(f"lut2_apply+token: {t*1e3:8.1f} ms ({MP/t:8.1f} MP/s)", flush=True)

    t = timeit(lambda: sync(stage_tokmath(v)))
    print(f"token math only:  {t*1e3:8.1f} ms ({MP/t:8.1f} MP/s)", flush=True)

    comb = (v & 0x3FFF).reshape(-1, PACK_T)
    lens_h = np.where(v_host < 16, 6, 10 + (v_host % 7)).astype(np.int32)
    lens = jnp.asarray(lens_h).reshape(-1, PACK_T)
    comb = jax.device_put(comb)
    lens = jax.device_put(lens)

    def scan_only():
        buf, cb = stage_scan(comb, lens)
        sync(buf)

    t = timeit(scan_only)
    print(f"insertion scan:   {t*1e3:8.1f} ms ({MP/t:8.1f} MP/s)", flush=True)

    buf, cbits = stage_scan(comb, lens)
    sync(buf)

    t = timeit(lambda: sync(stage_compact(buf, cbits)))
    print(f"word compaction:  {t*1e3:8.1f} ms ({MP/t:8.1f} MP/s)", flush=True)


if __name__ == "__main__":
    main()
