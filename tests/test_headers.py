"""Header codec tests: roundtrip + interop with reference bitstreams."""

import numpy as np
import pytest

from libjxl_tpu.api.codestream import parse_codestream, read_codec_metadata
from libjxl_tpu.core.fields import FieldReader, FieldWriter
from libjxl_tpu.core.frame_header import FrameEncoding, FrameHeader
from libjxl_tpu.core.headers import (
    BitDepth, ColorEncoding, ImageMetadata, SizeHeader, read_bundle,
    write_bundle,
)
from libjxl_tpu.utils.bits import BitReader, BitWriter
from libjxl_tpu.utils.oracle import oracle_available, oracle_encode

needs_oracle = pytest.mark.skipif(not oracle_available(),
                                  reason="libjxl oracle not available")


@pytest.mark.parametrize("xsize,ysize", [(1, 1), (64, 64), (48, 64),
                                         (256, 256), (1024, 768),
                                         (4096, 2160), (33, 17)])
def test_size_header_roundtrip(xsize, ysize):
    sh = SizeHeader()
    sh.set(xsize, ysize)
    w = BitWriter()
    write_bundle(w, sh)
    out = read_bundle(BitReader(w.to_bytes()), SizeHeader())
    assert (out.xsize, out.ysize) == (xsize, ysize)


def test_image_metadata_roundtrip_nondefault():
    m = ImageMetadata(xyb_encoded=False, bit_depth=BitDepth(
        bits_per_sample=16))
    w = BitWriter()
    write_bundle(w, m)
    out = read_bundle(BitReader(w.to_bytes()), ImageMetadata())
    assert out.xyb_encoded is False
    assert out.bit_depth.bits_per_sample == 16


def test_image_metadata_all_default():
    m = ImageMetadata()
    w = BitWriter()
    write_bundle(w, m)
    assert w.bits_written == 1
    out = read_bundle(BitReader(w.to_bytes()), ImageMetadata())
    assert out == m


def test_frame_header_roundtrip():
    m = ImageMetadata(xyb_encoded=False)
    m.nonserialized_xsize = 64
    m.nonserialized_ysize = 64
    fh = FrameHeader(encoding=FrameEncoding.MODULAR)
    fh.loop_filter.gab = False
    fh.loop_filter.epf_iters = 0
    fh.color_transform = 1  # None
    w = BitWriter()
    fh.visit(FieldWriter(w), m)
    out = FrameHeader()
    out.visit(FieldReader(BitReader(w.to_bytes())), m)
    assert out.encoding == FrameEncoding.MODULAR
    assert out.loop_filter.gab is False
    assert out.loop_filter.epf_iters == 0
    assert out.is_last


@needs_oracle
@pytest.mark.parametrize("lossless,effort", [(True, 1), (True, 3),
                                             (False, 3), (False, 7)])
def test_parse_reference_codestream(rng, lossless, effort):
    img = rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)
    data = oracle_encode(img, lossless=lossless, effort=effort)
    meta, frames = parse_codestream(data)
    assert meta.xsize == 48 and meta.ysize == 64
    assert meta.m.xyb_encoded == (not lossless)
    assert len(frames) == 1
    fh = frames[0].header
    expected = FrameEncoding.MODULAR if lossless else FrameEncoding.VARDCT
    assert fh.encoding == expected
    # All section bytes accounted for: TOC sizes sum to remaining payload.
    header_and_toc = len(data) - int(frames[0].toc_sizes.sum())
    assert header_and_toc > 0
    assert sum(len(s) for s in frames[0].sections) == int(
        frames[0].toc_sizes.sum())


@needs_oracle
def test_parse_reference_multigroup(rng):
    img = rng.integers(0, 256, (300, 520, 3), dtype=np.uint8)
    data = oracle_encode(img, lossless=False, effort=3)
    meta, frames = parse_codestream(data)
    fd = frames[0].dims
    assert fd.num_groups == 6 and fd.num_dc_groups == 1
    # DCGlobal, 1 DC group, ACGlobal, 6 AC groups
    assert len(frames[0].sections) == 9
