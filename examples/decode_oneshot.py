"""Minimal one-shot decode (analog of reference examples/decode_oneshot.cc):
read a .jxl codestream, decode to pixels, write a PNG/PNM.

Usage: python examples/decode_oneshot.py in.jxl out.png
"""
import sys

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main(argv):
    with open(argv[1], "rb") as f:
        data = f.read()
    from libjxl_tpu.api.decoder import decode
    from libjxl_tpu.extras.io import save_image
    img = decode(data)
    save_image(argv[2], img)
    print(f"decoded {img.shape[1]}x{img.shape[0]}x{img.shape[2]}")


if __name__ == "__main__":
    main(sys.argv)
