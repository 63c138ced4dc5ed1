"""Progressive decode (analog of reference examples/decode_progressive.cc):
feed the stream in chunks and flush a partial image at each step.

Usage: python examples/decode_progressive.py in.jxl out_prefix
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
    from libjxl_tpu.api.events import DecoderEvent, StreamingDecoder
    from libjxl_tpu.extras.io import save_image
    step = max(1024, len(data) // 8)
    dec = StreamingDecoder(
        events=DecoderEvent.BASIC_INFO | DecoderEvent.FULL_IMAGE)
    n_flushed = 0
    for off in range(0, len(data), step):
        dec.feed(data[off:off + step])
        img = dec.flush()
        if img is not None:
            import numpy as np
            u8 = np.clip(np.round(np.asarray(img)[:, :, :3] * 255),
                         0, 255).astype(np.uint8)
            save_image(f"{argv[2]}_{n_flushed:02d}.png", u8)
            n_flushed += 1
    import numpy as np
    for ev, payload in dec.process():
        if ev == DecoderEvent.FULL_IMAGE:
            u8 = np.clip(np.round(np.asarray(payload)[:, :, :3] * 255),
                         0, 255).astype(np.uint8)
            save_image(f"{argv[2]}_final.png", u8)
    print(f"{n_flushed} partial flushes + final image")


if __name__ == "__main__":
    main(sys.argv)
