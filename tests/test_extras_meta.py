"""Metadata extras: Exif orientation (lib/extras/exif.cc), gain-map
bundle (include/jxl/gain_map.h, extras/gain_map.cc), standalone
compressed-ICC API (include/jxl/compressed_icc.h)."""

import struct

import numpy as np
import pytest


def _exif_with_orientation(value: int, big: bool = False) -> bytes:
    e = ">" if big else "<"
    head = b"MM\x00*" if big else b"II*\x00"
    blob = head + struct.pack(e + "I", 8)
    blob += struct.pack(e + "H", 1)                    # one tag
    blob += struct.pack(e + "HHI", 274, 3, 1)
    blob += struct.pack(e + "H", value) + b"\x00\x00"
    blob += struct.pack(e + "I", 0)                    # next IFD
    return blob


def test_exif_orientation_read_and_reset():
    from libjxl_tpu.extras.exif import (
        get_exif_orientation, reset_exif_orientation,
    )
    for big in (False, True):
        blob = _exif_with_orientation(6, big)
        assert get_exif_orientation(blob) == 6
        reset = reset_exif_orientation(blob)
        assert get_exif_orientation(reset) == 1
        assert len(reset) == len(blob)
    assert get_exif_orientation(b"garbage") is None
    assert reset_exif_orientation(b"xy") == b"xy"


def test_orientation_roundtrip_all_eight():
    """Streams carrying metadata orientation decode re-oriented, and
    libjxl agrees (image_metadata.h Orientation semantics)."""
    from libjxl_tpu.api.decoder import decode
    from libjxl_tpu.api.encoder import EncodeOptions, encode_lossless
    from libjxl_tpu.extras.exif import apply_orientation
    from libjxl_tpu.utils.oracle import oracle_available, oracle_decode

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (24, 40, 3)).astype(np.uint8)
    for o in range(1, 9):
        data = encode_lossless(img, EncodeOptions(effort=2,
                                                  orientation=o))
        ours = decode(data)
        assert np.array_equal(ours, apply_orientation(img, o)), o
        if oracle_available():
            ref = oracle_decode(data).pixels
            assert np.array_equal(ref, ours), o


def test_gain_map_bundle_roundtrip():
    from libjxl_tpu.core.headers import ColorEncoding
    from libjxl_tpu.extras.gain_map import (
        GainMapBundle, gain_map_bundle_size, read_gain_map_bundle,
        write_gain_map_bundle,
    )

    b = GainMapBundle(jhgm_version=0,
                      gain_map_metadata=b"iso21496-metadata",
                      color_encoding=ColorEncoding.srgb(gray=False),
                      alt_icc=b"",
                      gain_map=b"\xff\x0a fake jxl payload")
    blob = write_gain_map_bundle(b)
    assert gain_map_bundle_size(b) == len(blob)
    back = read_gain_map_bundle(blob)
    assert back.jhgm_version == 0
    assert back.gain_map_metadata == b.gain_map_metadata
    assert back.color_encoding is not None
    assert back.gain_map == b.gain_map

    # no color encoding
    b2 = GainMapBundle(gain_map=b"payload")
    back2 = read_gain_map_bundle(write_gain_map_bundle(b2))
    assert back2.color_encoding is None
    assert back2.gain_map == b"payload"

    from libjxl_tpu.core.fields import FormatError
    with pytest.raises(FormatError):
        read_gain_map_bundle(blob[:2])


def test_compressed_icc_roundtrip():
    """JxlICCProfileEncode/Decode over the ISO 18181 ICC codec."""
    from libjxl_tpu.color.compressed_icc import (
        icc_profile_decode, icc_profile_encode,
    )

    # a plausible minimal ICC-like payload (the codec is general)
    icc = (b"\x00\x00\x02\x00lcms\x040\x00\x00mntrRGB XYZ "
           + bytes(range(256)) * 3)
    comp = icc_profile_encode(icc)
    assert icc_profile_decode(comp) == icc
    assert len(comp) < len(icc) + 64


def test_exr_roundtrip_all_modes(tmp_path):
    """Minimal EXR codec (extras/exr.py; the reference wraps OpenEXR in
    lib/extras/dec/exr.cc): HALF/FLOAT x NONE/ZIP/ZIPS scanline files
    roundtrip, and load_image/save_image dispatch on magic/extension."""
    from libjxl_tpu.extras.exr import read_exr, write_exr
    from libjxl_tpu.extras.io import load_image, save_image

    rng = np.random.default_rng(0)
    img = (rng.random((37, 53, 3)) * 4).astype(np.float32)
    for pt in ("half", "float"):
        for comp in ("none", "zip", "zips"):
            out = read_exr(write_exr(img, pt, comp))
            want = img.astype(np.float16).astype(np.float32) \
                if pt == "half" else img
            assert np.allclose(out, want, atol=2e-3 if pt == "half"
                               else 0)
    p = str(tmp_path / "t.exr")
    save_image(p, img)
    assert np.allclose(load_image(p), img.astype(np.float16), atol=2e-3)


def test_load_animation_gif_apng(tmp_path):
    """Animated GIF/APNG input (lib/extras/dec/gif.cc, apng.cc):
    frames + per-frame durations + loop count."""
    from PIL import Image

    from libjxl_tpu.extras.io import load_animation

    rng = np.random.default_rng(4)
    frames = [Image.fromarray(
        rng.integers(0, 256, (20, 24, 3)).astype(np.uint8))
        for _ in range(3)]
    for ext in ("gif", "png"):
        p = str(tmp_path / f"a.{ext}")
        frames[0].save(p, save_all=True, append_images=frames[1:],
                       duration=70, loop=2)
        fr, dur, loops = load_animation(p)
        assert len(fr) == 3 and dur == [70, 70, 70] and loops == 2
        if ext == "png":                    # APNG is lossless
            assert np.array_equal(fr[1], np.asarray(frames[1]))


def test_pam_pfm_pgx_roundtrip(tmp_path):
    """PAM/PFM/PGX codecs (lib/extras/dec/pnm.cc, pgx.cc): write+read
    roundtrips for 8/16-bit and float, including bottom-up PFM rows."""
    import numpy as np
    from libjxl_tpu.extras.io import load_image, save_image

    rng = np.random.default_rng(0)
    rgba8 = rng.integers(0, 256, (7, 9, 4), dtype=np.uint8)
    p = str(tmp_path / "t.pam")
    save_image(p, rgba8)
    assert np.array_equal(load_image(p), rgba8)

    g16 = rng.integers(0, 65536, (5, 6, 1), dtype=np.uint16)
    p = str(tmp_path / "t.pgx")
    save_image(p, g16)
    assert np.array_equal(load_image(p), g16)

    f32 = rng.random((6, 4, 3)).astype(np.float32)
    p = str(tmp_path / "t.pfm")
    save_image(p, f32)
    assert np.allclose(load_image(p), f32)

    gray_f = rng.random((4, 5)).astype(np.float32)
    p2 = str(tmp_path / "g.pfm")
    save_image(p2, gray_f)
    assert np.allclose(load_image(p2)[:, :, 0], gray_f)
