"""ROOFLINE.md measurement plan: separate dispatch latency from compute.

Runs on live TPU. For each sub-program and batch size, reports MP/s and
the per-dispatch wall time; hypothesis 1 (relay dispatch latency
dominates) predicts time ~ constant as batch doubles.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from libjxl_tpu.models.lossless import (
    chunk_pack_device, frame_groups_host, lossless_hist_device,
    lossless_pack_fused, lossless_tokens_device,
)


def make_image(seed: int, h: int = 1024, w: int = 1024) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        (xx * 255 // w + rng.integers(0, 8, (h, w))),
        (yy * 255 // h + rng.integers(0, 8, (h, w))),
        ((xx + yy) * 255 // (h + w) + rng.integers(0, 8, (h, w))),
    ], axis=-1).clip(0, 255).astype(np.uint8)


def sync(x):
    np.asarray(x.reshape(-1)[:16])


def timeit(fn, reps=6):
    fn()  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    lut_b = jnp.asarray(rng.integers(0, 1 << 14, 256).astype(np.uint32))
    lut_l = jnp.asarray(rng.integers(4, 15, 256).astype(np.int32))

    for n_img in (2, 4, 8, 16):
        imgs = [make_image(100 + s) for s in range(n_img)]
        groups = np.concatenate(
            [frame_groups_host(im, 256)[0] for im in imgs])
        g = jax.device_put(groups)
        mp = n_img * 1.048576

        def fused():
            w, cb = lossless_pack_fused(g, 1024, 1024, lut_b, lut_l,
                                        gx=4, per_image=16,
                                        cap_words=1 << 22)
            sync(cb)

        def hist_only():
            p = lossless_hist_device(g, 1024, 1024, gx=4, per_image=16)
            sync(p)

        t_f = timeit(fused)
        t_h = timeit(hist_only)
        print(f"n={n_img:3d} ({mp:6.1f} MP): fused {t_f*1e3:8.1f} ms "
              f"({mp/t_f:8.1f} MP/s) | hist-only {t_h*1e3:8.1f} ms "
              f"({mp/t_h:8.1f} MP/s)", flush=True)

    # stage isolation at n=8
    imgs = [make_image(100 + s) for s in range(8)]
    groups = np.concatenate([frame_groups_host(im, 256)[0] for im in imgs])
    g = jax.device_put(groups)
    mp = 8 * 1.048576

    def tokens_only():
        wide, w8, valid, payload = lossless_tokens_device(
            g, 1024, 1024, gx=4, per_image=16)
        sync(payload)

    t = timeit(tokens_only)
    print(f"stage tokens+hist+planes: {t*1e3:8.1f} ms ({mp/t:8.1f} MP/s)",
          flush=True)

    wide, w8, valid, payload = lossless_tokens_device(
        g, 1024, 1024, gx=4, per_image=16)
    sync(payload)

    def pack_only():
        w, cb = chunk_pack_device(wide, valid, lut_b, lut_l,
                                  cap_words=1 << 22)
        sync(cb)

    t = timeit(pack_only)
    print(f"stage chunk_pack alone:  {t*1e3:8.1f} ms ({mp/t:8.1f} MP/s)",
          flush=True)

    # pure dispatch latency floor: trivial program, tiny fetch
    tiny = jax.device_put(np.zeros(64, np.uint8))
    f = jax.jit(lambda x: x + 1)

    def noop():
        sync(f(tiny))

    t = timeit(noop, reps=10)
    print(f"dispatch+fetch floor:    {t*1e3:8.1f} ms", flush=True)

    # h2d cost for 8 images of groups (16.8 MB u8)
    def h2d():
        gg = jax.device_put(groups)
        sync(gg)

    t = timeit(h2d)
    print(f"h2d 24 MB:               {t*1e3:8.1f} ms "
          f"({groups.nbytes/t/1e6:8.1f} MB/s)", flush=True)


if __name__ == "__main__":
    main()
