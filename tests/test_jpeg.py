"""JPEG recompression tests: byte-exact parser/writer, jbrd codec, and
lossless JPEG<->JXL transcoding cross-validated against the system libjxl
(reference test model: ``lib/jxl/jpeg_data_test.cc``,
``lib/extras/jpegli_test.cc``, ``lib/jxl/decode_test.cc`` JPEG
reconstruction cases)."""

import io

import numpy as np
import pytest

from libjxl_tpu.jpeg.jbrd import parse_jbrd, serialize_jbrd
from libjxl_tpu.jpeg.reader import parse_jpeg
from libjxl_tpu.jpeg.transcode import decode_to_jpeg, encode_jpeg
from libjxl_tpu.jpeg.writer import write_jpeg
from libjxl_tpu.utils.oracle import oracle_available

PIL = pytest.importorskip("PIL.Image")
from PIL import Image, ImageFilter  # noqa: E402


def _jpeg_bytes(shape=(89, 121), gray=False, **save_kwargs):
    shape = save_kwargs.pop("shape", shape)
    rng = np.random.default_rng(sum(shape))
    arr = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    img = Image.fromarray(arr).filter(ImageFilter.GaussianBlur(2))
    if gray:
        img = img.convert("L")
    save_kwargs.setdefault("subsampling", 0)
    if gray:
        save_kwargs.pop("subsampling")
    buf = io.BytesIO()
    img.save(buf, format="JPEG", **save_kwargs)
    return buf.getvalue()


CONFIGS = [
    dict(quality=85),
    dict(quality=70, progressive=True),
    dict(quality=95, restart_marker_blocks=4),
    dict(quality=100),
    dict(quality=80, gray=True),
    dict(quality=75, comment=b"a comment marker"),
    dict(quality=85, subsampling=2),                      # 420
    dict(quality=85, subsampling=1),                      # 422
    dict(quality=75, subsampling=2, progressive=True),
    dict(quality=85, subsampling=2, shape=(100, 100)),    # MCU padding
]


@pytest.mark.parametrize("cfg", CONFIGS)
def test_jpeg_parse_write_byte_exact(cfg):
    jb = _jpeg_bytes(**cfg)
    jd = parse_jpeg(jb)
    assert write_jpeg(jd) == jb


@pytest.mark.parametrize("cfg", CONFIGS)
def test_jbrd_roundtrip_byte_exact(cfg):
    jb = _jpeg_bytes(**cfg)
    jd = parse_jpeg(jb)
    payload = serialize_jbrd(jd)
    jd2 = parse_jbrd(payload)
    # graft the coefficients (they travel in the VarDCT frame, not jbrd)
    jd2.width, jd2.height = jd.width, jd.height
    for c2, c in zip(jd2.components, jd.components):
        c2.coeffs = c.coeffs
        c2.width_in_blocks = c.width_in_blocks
        c2.height_in_blocks = c.height_in_blocks
        c2.h_samp_factor = c.h_samp_factor
        c2.v_samp_factor = c.v_samp_factor
    for q2, q in zip(jd2.quant, jd.quant):
        q2.values = q.values
    assert write_jpeg(jd2) == jb


@pytest.mark.parametrize("cfg", CONFIGS)
def test_transcode_roundtrip(cfg):
    jb = _jpeg_bytes(**cfg)
    jxl = encode_jpeg(jb)
    assert decode_to_jpeg(jxl) == jb


def test_transcode_multigroup():
    jb = _jpeg_bytes(shape=(291, 317), quality=88)
    jxl = encode_jpeg(jb)
    assert decode_to_jpeg(jxl) == jb
    assert len(jxl) < len(jb)   # recompression should actually compress


@pytest.mark.skipif(not oracle_available(), reason="libjxl not found")
@pytest.mark.parametrize("cfg", [dict(quality=85),
                                 dict(quality=70, progressive=True),
                                 dict(quality=80, gray=True),
                                 dict(quality=85, subsampling=2),
                                 dict(quality=85, subsampling=1)])
def test_transcode_oracle_cross(cfg):
    from libjxl_tpu.utils.oracle import (
        oracle_decode_jpeg, oracle_encode_jpeg,
    )
    jb = _jpeg_bytes(**cfg)
    # libjxl reconstructs the exact .jpg from OUR .jxl
    assert oracle_decode_jpeg(encode_jpeg(jb)) == jb
    # we reconstruct the exact .jpg from LIBJXL's .jxl (exercises the
    # chroma-from-luma jpeg path: force_cfl_jpeg_recompression default)
    assert decode_to_jpeg(oracle_encode_jpeg(jb)) == jb


@pytest.mark.skipif(not oracle_available(), reason="libjxl not found")
@pytest.mark.parametrize("sub", [0, 1, 2])
def test_transcoded_jpeg_pixel_decode(sub):
    """Pixel (non-reconstruction) decode of transcoded JPEGs: YCbCr
    VarDCT frames incl. chroma upsampling, matches libjxl within +-1."""
    from libjxl_tpu.api.decoder import decode as jxl_decode
    from libjxl_tpu.utils.oracle import oracle_decode
    jb = _jpeg_bytes(shape=(112, 120), quality=90, subsampling=sub)
    jxl = encode_jpeg(jb)
    ours = jxl_decode(jxl)
    ref = oracle_decode(jxl).pixels[:, :, :3]
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1
