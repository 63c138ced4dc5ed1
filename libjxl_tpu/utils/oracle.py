"""Conformance oracle: ctypes bindings to the system libjxl shared library.

The JPEG XL bitstream format is frozen (ISO/IEC 18181), so any conforming
decoder/encoder is a valid oracle for interop testing:

  * ``oracle_decode(jxl_bytes)``  — proves bitstreams WE produce are
    spec-conformant (the reference decoder accepts them and yields the
    expected pixels).
  * ``oracle_encode(pixels, ...)`` — produces reference bitstreams that OUR
    decoder must handle.

This mirrors the role of the conformance harness in the reference
(``tools/conformance/conformance.py``) and the ``Roundtrip()`` helpers in
``lib/jxl/test_utils.h``.  Pure test/validation infrastructure — the
production codec in this package never calls into libjxl.
"""

from __future__ import annotations

import ctypes
import ctypes.util
from dataclasses import dataclass

import numpy as np

# ---------------------------------------------------------------------------
# Library loading (graceful: oracle_available() gates tests)
# ---------------------------------------------------------------------------

_LIB_CANDIDATES = (
    "libjxl.so",
    "libjxl.so.0.7",
    "libjxl.so.0.8",
    "libjxl.so.0.9",
    "libjxl.so.0.10",
)


def _load():
    for name in _LIB_CANDIDATES:
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    found = ctypes.util.find_library("jxl")
    if found:
        try:
            return ctypes.CDLL(found)
        except OSError:
            pass
    return None


_jxl = _load()


def oracle_available() -> bool:
    return _jxl is not None


# ---------------------------------------------------------------------------
# Public C API mirror (stable ABI; layouts per include/jxl/*.h)
# ---------------------------------------------------------------------------

JXL_DEC_SUCCESS = 0
JXL_DEC_ERROR = 1
JXL_DEC_NEED_MORE_INPUT = 2
JXL_DEC_NEED_IMAGE_OUT_BUFFER = 5
JXL_DEC_BASIC_INFO = 0x40
JXL_DEC_COLOR_ENCODING = 0x100
JXL_DEC_FRAME = 0x400
JXL_DEC_FULL_IMAGE = 0x1000

JXL_ENC_SUCCESS = 0
JXL_ENC_ERROR = 1
JXL_ENC_NEED_MORE_OUTPUT = 2

JXL_TYPE_FLOAT = 0
JXL_TYPE_UINT8 = 2
JXL_TYPE_UINT16 = 3
JXL_TYPE_FLOAT16 = 5

JXL_NATIVE_ENDIAN = 0
JXL_LITTLE_ENDIAN = 1

JXL_ENC_FRAME_SETTING_EFFORT = 0
JXL_ENC_FRAME_SETTING_DECODING_SPEED = 1
JXL_ENC_FRAME_SETTING_RESAMPLING = 2
JXL_ENC_FRAME_SETTING_MODULAR = 11


class JxlPixelFormat(ctypes.Structure):
    _fields_ = [
        ("num_channels", ctypes.c_uint32),
        ("data_type", ctypes.c_int),
        ("endianness", ctypes.c_int),
        ("align", ctypes.c_size_t),
    ]


class JxlPreviewHeader(ctypes.Structure):
    _fields_ = [("xsize", ctypes.c_uint32), ("ysize", ctypes.c_uint32)]


class JxlAnimationHeader(ctypes.Structure):
    _fields_ = [
        ("tps_numerator", ctypes.c_uint32),
        ("tps_denominator", ctypes.c_uint32),
        ("num_loops", ctypes.c_uint32),
        ("have_timecodes", ctypes.c_int),
    ]


class JxlBasicInfo(ctypes.Structure):
    # Layout per include/jxl/codestream_header.h (stable across 0.7..0.12).
    _fields_ = [
        ("have_container", ctypes.c_int),
        ("xsize", ctypes.c_uint32),
        ("ysize", ctypes.c_uint32),
        ("bits_per_sample", ctypes.c_uint32),
        ("exponent_bits_per_sample", ctypes.c_uint32),
        ("intensity_target", ctypes.c_float),
        ("min_nits", ctypes.c_float),
        ("relative_to_max_display", ctypes.c_int),
        ("linear_below", ctypes.c_float),
        ("uses_original_profile", ctypes.c_int),
        ("have_preview", ctypes.c_int),
        ("have_animation", ctypes.c_int),
        ("orientation", ctypes.c_int),
        ("num_color_channels", ctypes.c_uint32),
        ("num_extra_channels", ctypes.c_uint32),
        ("alpha_bits", ctypes.c_uint32),
        ("alpha_exponent_bits", ctypes.c_uint32),
        ("alpha_premultiplied", ctypes.c_int),
        ("preview", JxlPreviewHeader),
        ("animation", JxlAnimationHeader),
        ("intrinsic_xsize", ctypes.c_uint32),
        ("intrinsic_ysize", ctypes.c_uint32),
        ("padding", ctypes.c_uint8 * 100),
    ]


class JxlColorEncoding(ctypes.Structure):
    _fields_ = [
        ("color_space", ctypes.c_int),
        ("white_point", ctypes.c_int),
        ("white_point_xy", ctypes.c_double * 2),
        ("primaries", ctypes.c_int),
        ("primaries_red_xy", ctypes.c_double * 2),
        ("primaries_green_xy", ctypes.c_double * 2),
        ("primaries_blue_xy", ctypes.c_double * 2),
        ("transfer_function", ctypes.c_int),
        ("gamma", ctypes.c_double),
        ("rendering_intent", ctypes.c_int),
    ]


if _jxl is not None:
    _jxl.JxlDecoderCreate.restype = ctypes.c_void_p
    _jxl.JxlDecoderCreate.argtypes = [ctypes.c_void_p]
    _jxl.JxlDecoderDestroy.argtypes = [ctypes.c_void_p]
    _jxl.JxlDecoderSubscribeEvents.argtypes = [ctypes.c_void_p, ctypes.c_int]
    _jxl.JxlDecoderSetInput.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t]
    _jxl.JxlDecoderCloseInput.argtypes = [ctypes.c_void_p]
    _jxl.JxlDecoderProcessInput.argtypes = [ctypes.c_void_p]
    _jxl.JxlDecoderGetBasicInfo.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(JxlBasicInfo)]
    _jxl.JxlDecoderImageOutBufferSize.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(JxlPixelFormat),
        ctypes.POINTER(ctypes.c_size_t)]
    _jxl.JxlDecoderSetImageOutBuffer.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(JxlPixelFormat), ctypes.c_void_p,
        ctypes.c_size_t]

    _jxl.JxlEncoderCreate.restype = ctypes.c_void_p
    _jxl.JxlEncoderCreate.argtypes = [ctypes.c_void_p]
    _jxl.JxlEncoderDestroy.argtypes = [ctypes.c_void_p]
    _jxl.JxlEncoderSetBasicInfo.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(JxlBasicInfo)]
    _jxl.JxlEncoderInitBasicInfo.argtypes = [ctypes.POINTER(JxlBasicInfo)]
    _jxl.JxlEncoderSetColorEncoding.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(JxlColorEncoding)]
    _jxl.JxlColorEncodingSetToSRGB.argtypes = [
        ctypes.POINTER(JxlColorEncoding), ctypes.c_int]
    _jxl.JxlEncoderFrameSettingsCreate.restype = ctypes.c_void_p
    _jxl.JxlEncoderFrameSettingsCreate.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p]
    _jxl.JxlEncoderSetFrameLossless.argtypes = [ctypes.c_void_p, ctypes.c_int]
    _jxl.JxlEncoderFrameSettingsSetOption.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int64]
    _jxl.JxlEncoderAddImageFrame.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(JxlPixelFormat), ctypes.c_void_p,
        ctypes.c_size_t]
    _jxl.JxlEncoderCloseInput.argtypes = [ctypes.c_void_p]
    _jxl.JxlEncoderProcessOutput.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_size_t)]


# ---------------------------------------------------------------------------
# High-level helpers
# ---------------------------------------------------------------------------

@dataclass
class OracleImage:
    pixels: np.ndarray          # (ysize, xsize, channels)
    bits_per_sample: int
    num_color_channels: int
    num_extra_channels: int
    alpha_bits: int


class OracleError(RuntimeError):
    pass


def oracle_decode(data: bytes, dtype=np.uint8, num_channels: int | None = None
                  ) -> OracleImage:
    """Decode a JXL codestream with the system libjxl; return pixels."""
    if _jxl is None:
        raise OracleError("libjxl shared library not available")
    dec = _jxl.JxlDecoderCreate(None)
    if not dec:
        raise OracleError("JxlDecoderCreate failed")
    try:
        events = JXL_DEC_BASIC_INFO | JXL_DEC_FULL_IMAGE
        if _jxl.JxlDecoderSubscribeEvents(dec, events) != JXL_DEC_SUCCESS:
            raise OracleError("SubscribeEvents failed")
        buf = ctypes.create_string_buffer(data, len(data))
        _jxl.JxlDecoderSetInput(dec, ctypes.cast(buf, ctypes.c_char_p),
                                len(data))
        _jxl.JxlDecoderCloseInput(dec)

        info = JxlBasicInfo()
        out = None
        fmt = None
        while True:
            status = _jxl.JxlDecoderProcessInput(dec)
            if status == JXL_DEC_ERROR:
                raise OracleError("oracle decoder reported JXL_DEC_ERROR")
            if status == JXL_DEC_NEED_MORE_INPUT:
                raise OracleError("oracle decoder: truncated input")
            if status == JXL_DEC_BASIC_INFO:
                if _jxl.JxlDecoderGetBasicInfo(dec, ctypes.byref(info)) != 0:
                    raise OracleError("GetBasicInfo failed")
                continue
            if status == JXL_DEC_NEED_IMAGE_OUT_BUFFER:
                nch = num_channels
                if nch is None:
                    nch = info.num_color_channels + (
                        1 if info.alpha_bits > 0 else 0)
                dt = {np.uint8: JXL_TYPE_UINT8, np.uint16: JXL_TYPE_UINT16,
                      np.float32: JXL_TYPE_FLOAT}[dtype]
                fmt = JxlPixelFormat(nch, dt, JXL_LITTLE_ENDIAN, 0)
                size = ctypes.c_size_t()
                if _jxl.JxlDecoderImageOutBufferSize(
                        dec, ctypes.byref(fmt), ctypes.byref(size)) != 0:
                    raise OracleError("ImageOutBufferSize failed")
                out = np.empty(size.value, dtype=np.uint8)
                if _jxl.JxlDecoderSetImageOutBuffer(
                        dec, ctypes.byref(fmt),
                        out.ctypes.data_as(ctypes.c_void_p), size.value) != 0:
                    raise OracleError("SetImageOutBuffer failed")
                continue
            if status == JXL_DEC_FULL_IMAGE:
                continue
            if status == JXL_DEC_SUCCESS:
                break
        if out is None or fmt is None:
            raise OracleError("no image produced")
        pixels = out.view(dtype).reshape(
            info.ysize, info.xsize, fmt.num_channels)
        return OracleImage(
            pixels=pixels,
            bits_per_sample=info.bits_per_sample,
            num_color_channels=info.num_color_channels,
            num_extra_channels=info.num_extra_channels,
            alpha_bits=info.alpha_bits,
        )
    finally:
        _jxl.JxlDecoderDestroy(dec)


def oracle_encode(pixels: np.ndarray, *, lossless: bool = True,
                  effort: int = 3, bits_per_sample: int | None = None,
                  container: bool = False,
                  distance: float = 1.0) -> bytes:
    """Encode pixels to a JXL codestream with the system libjxl."""
    if _jxl is None:
        raise OracleError("libjxl shared library not available")
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    ysize, xsize, nch = pixels.shape
    if pixels.dtype == np.uint8:
        dt, bps = JXL_TYPE_UINT8, 8
    elif pixels.dtype == np.uint16:
        dt, bps = JXL_TYPE_UINT16, 16
    elif pixels.dtype == np.float32:
        dt, bps = JXL_TYPE_FLOAT, 32
    else:
        raise OracleError(f"unsupported dtype {pixels.dtype}")
    if bits_per_sample is not None:
        bps = bits_per_sample

    enc = _jxl.JxlEncoderCreate(None)
    if not enc:
        raise OracleError("JxlEncoderCreate failed")
    try:
        info = JxlBasicInfo()
        _jxl.JxlEncoderInitBasicInfo(ctypes.byref(info))
        info.xsize = xsize
        info.ysize = ysize
        info.bits_per_sample = bps
        info.exponent_bits_per_sample = 8 if dt == JXL_TYPE_FLOAT else 0
        ncolor = 1 if nch <= 2 else 3
        has_alpha = nch in (2, 4)
        info.num_color_channels = ncolor
        info.num_extra_channels = 1 if has_alpha else 0
        info.alpha_bits = bps if has_alpha else 0
        info.uses_original_profile = 1 if lossless else 0
        if _jxl.JxlEncoderSetBasicInfo(enc, ctypes.byref(info)) != 0:
            raise OracleError("SetBasicInfo failed")
        color = JxlColorEncoding()
        _jxl.JxlColorEncodingSetToSRGB(ctypes.byref(color),
                                       1 if ncolor == 1 else 0)
        if _jxl.JxlEncoderSetColorEncoding(enc, ctypes.byref(color)) != 0:
            raise OracleError("SetColorEncoding failed")
        st = _jxl.JxlEncoderFrameSettingsCreate(enc, None)
        if lossless:
            _jxl.JxlEncoderSetFrameLossless(st, 1)
        else:
            _jxl.JxlEncoderSetFrameDistance.argtypes = [
                ctypes.c_void_p, ctypes.c_float]
            _jxl.JxlEncoderSetFrameDistance(st, distance)
        _jxl.JxlEncoderFrameSettingsSetOption(
            st, JXL_ENC_FRAME_SETTING_EFFORT, effort)
        fmt = JxlPixelFormat(nch, dt, JXL_LITTLE_ENDIAN, 0)
        contiguous = np.ascontiguousarray(pixels)
        if _jxl.JxlEncoderAddImageFrame(
                st, ctypes.byref(fmt),
                contiguous.ctypes.data_as(ctypes.c_void_p),
                contiguous.nbytes) != 0:
            raise OracleError("AddImageFrame failed")
        _jxl.JxlEncoderCloseInput(enc)

        chunks = []
        chunk = np.empty(1 << 20, dtype=np.uint8)
        while True:
            ptr = ctypes.cast(chunk.ctypes.data, ctypes.POINTER(ctypes.c_uint8))
            avail = ctypes.c_size_t(chunk.nbytes)
            status = _jxl.JxlEncoderProcessOutput(
                enc, ctypes.byref(ptr), ctypes.byref(avail))
            used = chunk.nbytes - avail.value
            chunks.append(chunk[:used].tobytes())
            if status == JXL_ENC_SUCCESS:
                break
            if status != JXL_ENC_NEED_MORE_OUTPUT:
                raise OracleError("oracle encoder error")
        return b"".join(chunks)
    finally:
        _jxl.JxlEncoderDestroy(enc)


# ---------------------------------------------------------------------------
# JPEG recompression oracle (decode.h JxlDecoderSetJPEGBuffer,
# encode.h JxlEncoderAddJPEGFrame)
# ---------------------------------------------------------------------------

JXL_DEC_JPEG_NEED_MORE_OUTPUT = 6
JXL_DEC_JPEG_RECONSTRUCTION = 0x2000


def oracle_decode_jpeg(data: bytes) -> bytes:
    """Reconstruct the original JPEG from a jbrd-carrying JXL container."""
    if _jxl is None:
        raise OracleError("libjxl shared library not available")
    _jxl.JxlDecoderSetJPEGBuffer.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t]
    _jxl.JxlDecoderReleaseJPEGBuffer.restype = ctypes.c_size_t
    _jxl.JxlDecoderReleaseJPEGBuffer.argtypes = [ctypes.c_void_p]
    dec = _jxl.JxlDecoderCreate(None)
    if not dec:
        raise OracleError("JxlDecoderCreate failed")
    try:
        events = (JXL_DEC_BASIC_INFO | JXL_DEC_JPEG_RECONSTRUCTION |
                  JXL_DEC_FULL_IMAGE)
        if _jxl.JxlDecoderSubscribeEvents(dec, events) != JXL_DEC_SUCCESS:
            raise OracleError("SubscribeEvents failed")
        buf = ctypes.create_string_buffer(data, len(data))
        _jxl.JxlDecoderSetInput(dec, ctypes.cast(buf, ctypes.c_char_p),
                                len(data))
        _jxl.JxlDecoderCloseInput(dec)
        out = bytearray()
        jbuf = np.empty(max(len(data) * 4, 1 << 20), dtype=np.uint8)
        jpeg_active = False
        while True:
            status = _jxl.JxlDecoderProcessInput(dec)
            if status == JXL_DEC_ERROR:
                raise OracleError("oracle decoder error")
            if status == JXL_DEC_BASIC_INFO:
                continue
            if status == JXL_DEC_JPEG_RECONSTRUCTION:
                if _jxl.JxlDecoderSetJPEGBuffer(
                        dec, jbuf.ctypes.data_as(ctypes.c_void_p),
                        jbuf.nbytes) != JXL_DEC_SUCCESS:
                    raise OracleError("SetJPEGBuffer failed")
                jpeg_active = True
                continue
            if status == JXL_DEC_JPEG_NEED_MORE_OUTPUT:
                remaining = _jxl.JxlDecoderReleaseJPEGBuffer(dec)
                out += jbuf[:jbuf.nbytes - remaining].tobytes()
                if _jxl.JxlDecoderSetJPEGBuffer(
                        dec, jbuf.ctypes.data_as(ctypes.c_void_p),
                        jbuf.nbytes) != JXL_DEC_SUCCESS:
                    raise OracleError("SetJPEGBuffer failed")
                continue
            if status == JXL_DEC_FULL_IMAGE or status == JXL_DEC_SUCCESS:
                if jpeg_active:
                    remaining = _jxl.JxlDecoderReleaseJPEGBuffer(dec)
                    out += jbuf[:jbuf.nbytes - remaining].tobytes()
                    jpeg_active = False
                if status == JXL_DEC_SUCCESS:
                    return bytes(out)
                continue
            if status == JXL_DEC_NEED_IMAGE_OUT_BUFFER:
                # no pixel buffer needed for JPEG reconstruction; but some
                # versions still request one — give a scratch buffer
                raise OracleError("unexpected pixel buffer request")
            raise OracleError(f"unexpected decoder status {status}")
    finally:
        _jxl.JxlDecoderDestroy(dec)


def oracle_encode_jpeg(jpeg_bytes: bytes, *, effort: int = 3) -> bytes:
    """Losslessly recompress a JPEG with the system libjxl (jbrd box)."""
    if _jxl is None:
        raise OracleError("libjxl shared library not available")
    _jxl.JxlEncoderAddJPEGFrame.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t]
    _jxl.JxlEncoderUseContainer.argtypes = [ctypes.c_void_p, ctypes.c_int]
    _jxl.JxlEncoderStoreJPEGMetadata.argtypes = [ctypes.c_void_p,
                                                 ctypes.c_int]
    enc = _jxl.JxlEncoderCreate(None)
    if not enc:
        raise OracleError("JxlEncoderCreate failed")
    try:
        if _jxl.JxlEncoderUseContainer(enc, 1) != 0:
            raise OracleError("UseContainer failed")
        if _jxl.JxlEncoderStoreJPEGMetadata(enc, 1) != 0:
            raise OracleError("StoreJPEGMetadata failed")
        st = _jxl.JxlEncoderFrameSettingsCreate(enc, None)
        _jxl.JxlEncoderFrameSettingsSetOption(
            st, JXL_ENC_FRAME_SETTING_EFFORT, effort)
        if _jxl.JxlEncoderAddJPEGFrame(st, jpeg_bytes,
                                       len(jpeg_bytes)) != 0:
            raise OracleError("AddJPEGFrame failed")
        _jxl.JxlEncoderCloseInput(enc)
        chunks = []
        chunk = np.empty(1 << 20, dtype=np.uint8)
        while True:
            ptr = ctypes.cast(chunk.ctypes.data,
                              ctypes.POINTER(ctypes.c_uint8))
            avail = ctypes.c_size_t(chunk.nbytes)
            status = _jxl.JxlEncoderProcessOutput(
                enc, ctypes.byref(ptr), ctypes.byref(avail))
            used = chunk.nbytes - avail.value
            chunks.append(chunk[:used].tobytes())
            if status == JXL_ENC_SUCCESS:
                break
            if status != JXL_ENC_NEED_MORE_OUTPUT:
                raise OracleError("oracle encoder error")
        return b"".join(chunks)
    finally:
        _jxl.JxlEncoderDestroy(enc)


def oracle_butteraugli(img0_u8: np.ndarray, img1_u8: np.ndarray,
                       pnorm: float = 3.0):
    """(distance_pnorm, distance_max, distmap) via JxlButteraugliCompute."""
    if _jxl is None:
        raise OracleError("libjxl shared library not available")
    _jxl.JxlButteraugliApiCreate.restype = ctypes.c_void_p
    _jxl.JxlButteraugliApiCreate.argtypes = [ctypes.c_void_p]
    _jxl.JxlButteraugliApiDestroy.argtypes = [ctypes.c_void_p]
    _jxl.JxlButteraugliCompute.restype = ctypes.c_void_p
    _jxl.JxlButteraugliCompute.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.POINTER(JxlPixelFormat), ctypes.c_void_p, ctypes.c_size_t,
        ctypes.POINTER(JxlPixelFormat), ctypes.c_void_p, ctypes.c_size_t]
    _jxl.JxlButteraugliResultGetDistance.restype = ctypes.c_float
    _jxl.JxlButteraugliResultGetDistance.argtypes = [
        ctypes.c_void_p, ctypes.c_float]
    _jxl.JxlButteraugliResultGetMaxDistance.restype = ctypes.c_float
    _jxl.JxlButteraugliResultGetMaxDistance.argtypes = [ctypes.c_void_p]
    _jxl.JxlButteraugliResultGetDistmap.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_uint32)]
    _jxl.JxlButteraugliResultDestroy.argtypes = [ctypes.c_void_p]

    api = _jxl.JxlButteraugliApiCreate(None)
    if not api:
        raise OracleError("ButteraugliApiCreate failed")
    try:
        h, w, _ = img0_u8.shape
        fmt = JxlPixelFormat(3, JXL_TYPE_UINT8, JXL_LITTLE_ENDIAN, 0)
        a = np.ascontiguousarray(img0_u8)
        b = np.ascontiguousarray(img1_u8)
        res = _jxl.JxlButteraugliCompute(
            api, w, h, ctypes.byref(fmt), a.ctypes.data_as(ctypes.c_void_p),
            a.nbytes, ctypes.byref(fmt),
            b.ctypes.data_as(ctypes.c_void_p), b.nbytes)
        if not res:
            raise OracleError("ButteraugliCompute failed")
        try:
            dist = float(_jxl.JxlButteraugliResultGetDistance(res, pnorm))
            try:
                dmax = float(_jxl.JxlButteraugliResultGetMaxDistance(res))
            except AttributeError:
                dmax = float("nan")
            buf = ctypes.POINTER(ctypes.c_float)()
            stride = ctypes.c_uint32(0)
            _jxl.JxlButteraugliResultGetDistmap(res, ctypes.byref(buf),
                                               ctypes.byref(stride))
            distmap = np.ctypeslib.as_array(
                buf, shape=(h, stride.value))[:, :w].copy()
            return dist, dmax, distmap
        finally:
            _jxl.JxlButteraugliResultDestroy(res)
    finally:
        _jxl.JxlButteraugliApiDestroy(api)
