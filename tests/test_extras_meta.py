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
