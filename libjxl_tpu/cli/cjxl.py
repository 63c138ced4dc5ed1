"""cjxl_tpu — JPEG XL encoder CLI (reference ``tools/cjxl_main.cc``).

Usage: python -m libjxl_tpu.cli.cjxl in.png out.jxl [-d DIST] [-e EFFORT]
       [--lossless] [--device]
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    from libjxl_tpu.cli import apply_platform_env
    apply_platform_env()
    p = argparse.ArgumentParser(prog="cjxl_tpu",
                                description="TPU-native JPEG XL encoder")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("-d", "--distance", type=float, default=1.0,
                   help="Butteraugli distance target; 0 = lossless")
    p.add_argument("-e", "--effort", type=int, default=3)
    p.add_argument("--lossless", action="store_true")
    p.add_argument("-m", "--modular", action="store_true",
                   help="modular mode; with -d > 0: lossy modular "
                        "(squeeze-residual quantization)")
    p.add_argument("--device", action="store_true",
                   help="run pixel compute on the TPU (JAX) path")
    p.add_argument("-q", "--quiet", action="store_true")
    p.add_argument("--lossless_jpeg", type=int, default=1,
                   help="1 (default): recompress .jpg input losslessly "
                        "(byte-exact reconstruction); 0: re-encode pixels")
    args = p.parse_args(argv)

    # JPEG input defaults to lossless recompression (cjxl_main.cc behavior)
    with open(args.input, "rb") as f:
        head = f.read(3)
    if head[:2] == b"\xff\xd8" and args.lossless_jpeg:
        from libjxl_tpu.jpeg.transcode import encode_jpeg
        with open(args.input, "rb") as f:
            jpg = f.read()
        t0 = time.perf_counter()
        data = encode_jpeg(jpg)
        dt = time.perf_counter() - t0
        with open(args.output, "wb") as f:
            f.write(data)
        if not args.quiet:
            print(f"Recompressed JPEG {len(jpg)} -> {len(data)} bytes "
                  f"({100 * (1 - len(data) / len(jpg)):.1f}% smaller, "
                  f"{dt * 1000:.0f} ms; byte-exact reversible)",
                  file=sys.stderr)
        return 0

    from libjxl_tpu.extras.io import load_animation, load_image

    # animated GIF/APNG input becomes an animated JXL (cjxl_main.cc)
    if args.input.lower().endswith((".gif", ".png", ".apng", ".webp")):
        frames, durations_ms, loops = load_animation(args.input)
        if len(frames) > 1:
            t0 = time.perf_counter()
            if args.lossless or args.distance == 0:
                from libjxl_tpu.api.encoder import (
                    EncodeOptions, encode_animation,
                )
                data = encode_animation(
                    frames, durations_ms,
                    EncodeOptions(effort=args.effort),
                    tps=(1000, 1), num_loops=loops)
            else:
                from libjxl_tpu.vardct.frame_enc import (
                    LossyOptions, encode_lossy_animation,
                )
                data = encode_lossy_animation(
                    frames, durations_ms,
                    LossyOptions(distance=args.distance,
                                 effort=args.effort),
                    tps=(1000, 1), num_loops=loops)
            dt = time.perf_counter() - t0
            with open(args.output, "wb") as f:
                f.write(data)
            if not args.quiet:
                print(f"Compressed {len(frames)} frames to {len(data)} "
                      f"bytes ({dt:.2f} s)", file=sys.stderr)
            return 0

    img = load_image(args.input)
    t0 = time.perf_counter()
    if args.lossless or args.distance == 0 or args.modular:
        from libjxl_tpu.api.encoder import EncodeOptions, encode_lossless
        data = encode_lossless(img, EncodeOptions(
            effort=args.effort, use_device=args.device,
            distance=0.0 if (args.lossless or args.distance == 0)
            else args.distance))
    else:
        from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy
        data = encode_lossy(img, LossyOptions(
            distance=args.distance, effort=args.effort,
            use_device=args.device))
    dt = time.perf_counter() - t0
    with open(args.output, "wb") as f:
        f.write(data)
    if not args.quiet:
        h, w = img.shape[:2]
        mp = h * w / 1e6
        bpp = len(data) * 8 / (h * w)
        print(f"Compressed {w}x{h} to {len(data)} bytes "
              f"({bpp:.3f} bpp, {mp / dt:.2f} MP/s)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
