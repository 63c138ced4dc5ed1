"""Encode with Exif metadata in the container (analog of reference
examples/encode_exif.cc): the Exif payload rides an ISOBMFF box.

Usage: python examples/encode_exif.py in.png out.jxl
"""
import sys

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

EXIF_STUB = b"\x00\x00\x00\x00MM\x00*\x00\x00\x00\x08\x00\x00"


def main(argv):
    from libjxl_tpu.api.encoder_api import Encoder
    from libjxl_tpu.extras.io import load_image
    img = load_image(argv[1])
    e = Encoder()
    e.add_frame(img)
    e.add_box("Exif", EXIF_STUB)
    data = e.output()
    with open(argv[2], "wb") as f:
        f.write(data)
    print(f"container with Exif box: {len(data)} bytes")


if __name__ == "__main__":
    main(sys.argv)
