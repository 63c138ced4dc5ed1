"""Round-4 stage profile of VarDCT e3 device encode (verdict item 2).

Decomposes encode_lossy_many: device dispatch+fetch vs host finish, and
cProfiles the host half.
"""
import copy
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def make_images(n):
    out = []
    for s in range(n):
        rng = np.random.default_rng(s)
        yy, xx = np.mgrid[0:768, 0:1024]
        out.append(np.stack([
            (xx * 255 // 1024 + rng.integers(0, 8, (768, 1024))),
            (yy * 255 // 768 + rng.integers(0, 8, (768, 1024))),
            ((xx + yy) * 255 // 1792 + rng.integers(0, 8, (768, 1024))),
        ], -1).clip(0, 255).astype(np.uint8))
    return out


def main():
    from libjxl_tpu.vardct.frame_enc import (
        LossyOptions, encode_lossy, encode_lossy_many,
    )
    imgs = make_images(8)
    opts = LossyOptions(distance=1.0, effort=3, use_device=True)
    encode_lossy(imgs[0], opts)  # warm

    # total (best of 2: first pass may compile the stacked-fetch program)
    total = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        encode_lossy_many(imgs, opts)
        total = min(total, time.perf_counter() - t0)
    print(f"total encode_lossy_many 8x0.786MP: {total*1000:.1f} ms "
          f"-> {8*0.786432/total:.2f} MP/s")

    # phase 1 alone: dispatch + collect payloads
    disp = copy.copy(opts)
    disp._dispatch_only = True
    t0 = time.perf_counter()
    pending = [encode_lossy(im, disp) for im in imgs]
    t_disp = time.perf_counter() - t0
    t0 = time.perf_counter()
    payloads = [(np.asarray(p[0]), p[1]) for p in pending]
    t_fetch = time.perf_counter() - t0
    print(f"phase1 dispatch: {t_disp*1000:.1f} ms, fetch: "
          f"{t_fetch*1000:.1f} ms")

    # host finish alone (serial, 1 image) with payload in hand
    o = copy.copy(opts)
    o._predispatched = pending[0]
    t0 = time.perf_counter()
    encode_lossy(imgs[0], o)
    t_host1 = time.perf_counter() - t0
    print(f"host finish 1 image serial: {t_host1*1000:.1f} ms")

    # cProfile host finish
    import cProfile, pstats
    pr = cProfile.Profile()
    pr.enable()
    for i in range(4):
        o = copy.copy(opts)
        o._predispatched = pending[i]
        encode_lossy(imgs[i], o)
    pr.disable()
    st = pstats.Stats(pr)
    st.sort_stats("cumulative")
    st.print_stats(30)


if __name__ == "__main__":
    main()
