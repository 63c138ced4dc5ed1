"""ICC profile codec tests (reference ``lib/jxl/icc_codec.cc``)."""

import numpy as np
import pytest

from libjxl_tpu.utils.oracle import oracle_available


def _srgb_icc() -> bytes:
    ImageCms = pytest.importorskip("PIL.ImageCms")
    return ImageCms.ImageCmsProfile(ImageCms.createProfile("sRGB")).tobytes()


def test_icc_predict_roundtrip():
    from libjxl_tpu.color.icc import predict_icc_simple, unpredict_icc
    icc = _srgb_icc()
    assert unpredict_icc(predict_icc_simple(icc)) == icc


def test_icc_ans_roundtrip():
    from libjxl_tpu.color.icc import read_encoded_icc, write_encoded_icc
    from libjxl_tpu.utils.bits import BitReader, BitWriter
    icc = _srgb_icc()
    w = BitWriter()
    write_encoded_icc(w, icc)
    assert read_encoded_icc(BitReader(w.to_bytes())) == icc
    assert w.bits_written // 8 < len(icc)     # it should actually compress


@pytest.mark.skipif(not oracle_available(), reason="libjxl not found")
def test_icc_decode_oracle_stream():
    """Decode the reference encoder's fully-predicted ICC stream."""
    import ctypes

    from libjxl_tpu.api.codestream import parse_codestream
    from libjxl_tpu.api.container import extract_codestream
    from libjxl_tpu.api.decoder import decode
    from libjxl_tpu.utils import oracle as orc
    icc = _srgb_icc()
    _jxl = orc._jxl
    _jxl.JxlEncoderSetICCProfile.argtypes = [ctypes.c_void_p,
                                             ctypes.c_char_p,
                                             ctypes.c_size_t]
    img = np.full((32, 32, 3), 120, np.uint8)
    enc = _jxl.JxlEncoderCreate(None)
    try:
        info = orc.JxlBasicInfo()
        _jxl.JxlEncoderInitBasicInfo(ctypes.byref(info))
        info.xsize = info.ysize = 32
        info.bits_per_sample = 8
        info.num_color_channels = 3
        info.uses_original_profile = 1
        assert _jxl.JxlEncoderSetBasicInfo(enc, ctypes.byref(info)) == 0
        assert _jxl.JxlEncoderSetICCProfile(enc, icc, len(icc)) == 0
        st = _jxl.JxlEncoderFrameSettingsCreate(enc, None)
        _jxl.JxlEncoderSetFrameLossless(st, 1)
        fmt = orc.JxlPixelFormat(3, orc.JXL_TYPE_UINT8,
                                 orc.JXL_LITTLE_ENDIAN, 0)
        carr = np.ascontiguousarray(img)
        assert _jxl.JxlEncoderAddImageFrame(
            st, ctypes.byref(fmt),
            carr.ctypes.data_as(ctypes.c_void_p), carr.nbytes) == 0
        _jxl.JxlEncoderCloseInput(enc)
        chunks = []
        chunk = np.empty(1 << 20, np.uint8)
        while True:
            ptr = ctypes.cast(chunk.ctypes.data,
                              ctypes.POINTER(ctypes.c_uint8))
            avail = ctypes.c_size_t(chunk.nbytes)
            stt = _jxl.JxlEncoderProcessOutput(enc, ctypes.byref(ptr),
                                               ctypes.byref(avail))
            chunks.append(chunk[:chunk.nbytes - avail.value].tobytes())
            if stt == orc.JXL_ENC_SUCCESS:
                break
        data = b"".join(chunks)
    finally:
        _jxl.JxlEncoderDestroy(enc)
    meta, _ = parse_codestream(extract_codestream(data))
    assert meta.m.color_encoding.want_icc
    assert meta.m.color_encoding.icc == icc
    assert np.array_equal(decode(data), img)
