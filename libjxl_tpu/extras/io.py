"""Image file I/O for the tools layer (reference ``lib/extras/dec/decode.cc``
and ``lib/extras/enc/*``): auto-detected decode of PNG/PNM/PGM/PPM/JPEG
etc., and PNG/PNM/NPY encode. PNM is implemented natively; other formats
go through PIL when present."""

from __future__ import annotations

import io
import os
import re

import numpy as np


def _read_pnm(data: bytes) -> np.ndarray:
    """P5 (gray) / P6 (rgb), 8- or 16-bit big-endian."""
    m = re.match(rb"(P[56])\s+(?:#[^\n]*\n\s*)*(\d+)\s+(\d+)\s+(\d+)\s",
                 data)
    if not m:
        raise ValueError("unsupported PNM header")
    kind, w, h, maxval = (m.group(1), int(m.group(2)), int(m.group(3)),
                          int(m.group(4)))
    nch = 3 if kind == b"P6" else 1
    offset = m.end()
    if maxval < 256:
        arr = np.frombuffer(data, np.uint8, w * h * nch, offset)
    else:
        arr = np.frombuffer(data, ">u2", w * h * nch, offset).astype(
            np.uint16)
    return arr.reshape(h, w, nch)


def _write_pnm(img: np.ndarray) -> bytes:
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nch = img.shape
    kind = b"P6" if nch == 3 else b"P5"
    maxval = 255 if img.dtype == np.uint8 else 65535
    header = b"%s\n%d %d\n%d\n" % (kind, w, h, maxval)
    body = img.astype(">u2").tobytes() if maxval > 255 else \
        img.astype(np.uint8).tobytes()
    return header + body


def load_image(path: str) -> np.ndarray:
    """Decode a PNG/PNM/JPEG/... file to (h, w, c) uint8/uint16."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] in (b"P5", b"P6"):
        return _read_pnm(data)
    if data[:2] == b"\xff\x0a" or data[:12].endswith(b"JXL \r\n\x87\n"):
        from libjxl_tpu.api.decoder import decode
        return decode(data)
    if data[:4] == b"\x76\x2f\x31\x01":
        from libjxl_tpu.extras.exr import read_exr
        return read_exr(data)              # float32 HDR
    try:
        from PIL import Image
        img = Image.open(io.BytesIO(data))
        if img.mode in ("I;16", "I;16B", "I"):
            return np.asarray(img, dtype=np.uint16)[..., None]
        if img.mode == "L":
            return np.asarray(img, dtype=np.uint8)[..., None]
        if img.mode not in ("RGB", "RGBA"):
            img = img.convert("RGB")
        return np.asarray(img, dtype=np.uint8)
    except ImportError as e:
        raise ValueError(f"cannot decode {path}: PIL unavailable") from e


def save_image(path: str, img: np.ndarray) -> None:
    """Encode to the format implied by the extension."""
    ext = os.path.splitext(path)[1].lower()
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[2] == 1:
        img2d = img[:, :, 0]
    else:
        img2d = img
    if ext in (".pnm", ".ppm", ".pgm"):
        with open(path, "wb") as f:
            f.write(_write_pnm(img))
        return
    if ext == ".npy":
        np.save(path, img)
        return
    if ext == ".exr":
        from libjxl_tpu.extras.exr import write_exr
        f32 = img.astype(np.float32)
        if img.dtype == np.uint8:
            f32 /= 255.0
        elif img.dtype == np.uint16:
            f32 /= 65535.0
        # float input keeps full precision; integer input fits in half
        ptype = "float" if img.dtype == np.float32 else "half"
        with open(path, "wb") as f:
            f.write(write_exr(f32, pixel_type=ptype))
        return
    from PIL import Image
    Image.fromarray(img2d).save(path)


def load_animation(path: str):
    """Decode an animated GIF/APNG/WebP to (frames, durations_ms,
    num_loops); a still image returns a single frame (the reference's
    extras GIF/APNG decoders, lib/extras/dec/gif.cc, apng.cc)."""
    from PIL import Image, ImageSequence
    img = Image.open(path)
    n = getattr(img, "n_frames", 1)
    if n <= 1:
        return [load_image(path)], [0], 0
    frames, durations = [], []
    mode = "RGBA" if "transparency" in img.info or img.mode == "RGBA" \
        else "RGB"
    for frame in ImageSequence.Iterator(img):
        durations.append(int(frame.info.get("duration", 100)))
        frames.append(np.asarray(frame.convert(mode), dtype=np.uint8))
    loops = img.info.get("loop", 0)
    return frames, durations, int(loops)
