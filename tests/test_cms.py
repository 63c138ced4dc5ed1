"""CMS / HDR: transfer functions, primaries conversion, tone mapping,
HDR encode/decode (reference: lib/jxl/cms/transfer_functions.h,
tone_mapping.h, jxl_cms.cc — BASELINE config 4's color machinery)."""

import numpy as np
import pytest

from libjxl_tpu.color import cms
from libjxl_tpu.core.headers import (
    ColorEncoding, ColorSpace, CustomTransferFunction, Primaries,
    TransferFunction, WhitePoint,
)


def _pq2020() -> ColorEncoding:
    return ColorEncoding(
        color_space=ColorSpace.RGB, white_point=WhitePoint.D65,
        primaries=Primaries.BT2100,
        tf=CustomTransferFunction(transfer_function=TransferFunction.PQ))


def _hlg2020() -> ColorEncoding:
    ce = _pq2020()
    ce.tf.transfer_function = TransferFunction.HLG
    return ce


def test_transfer_function_anchors_and_roundtrips():
    # PQ: signal 1.0 = 10000 nits (SMPTE ST 2084)
    assert abs(cms.pq_display_from_encoded(1.0, 10000.0) - 1.0) < 1e-12
    # HLG: signal 0.5 = scene 1/12 (ARIB STD-B67 knee)
    assert abs(cms.hlg_display_from_encoded(0.5) - 1 / 12) < 1e-12
    x = np.linspace(0, 1, 257)
    for enc, dec in [
        (lambda v: cms.pq_encoded_from_display(v, 1000.0),
         lambda v: cms.pq_display_from_encoded(v, 1000.0)),
        (cms.hlg_encoded_from_display, cms.hlg_display_from_encoded),
        (cms.tf709_encoded_from_display, cms.tf709_display_from_encoded),
        (cms.srgb_encoded_from_display, cms.srgb_display_from_encoded),
    ]:
        assert np.abs(dec(enc(x)) - x).max() < 1e-9
    # sign mirroring (unbounded CMM convention, transfer_functions.h:20-27)
    assert cms.pq_encoded_from_display(-0.5, 255.0) == \
        -cms.pq_encoded_from_display(0.5, 255.0)


def test_primaries_matrices():
    # sRGB->XYZ white row sums to the white point Y=1
    m = cms.rgb_to_xyz_matrix(ColorEncoding.srgb())
    assert np.allclose(m @ np.ones(3), cms._xy_to_xyz(0.3127, 0.3290),
                       atol=1e-6)
    # Rec2020 luminances (BT.2100 coefficients)
    lum = cms.primaries_luminances(_pq2020())
    assert np.allclose(lum, [0.2627, 0.6780, 0.0593], atol=2e-3)
    # round trip srgb -> 2020 -> srgb is identity
    m1 = cms.rgb_conversion_matrix(ColorEncoding.srgb(), _pq2020())
    m2 = cms.rgb_conversion_matrix(_pq2020(), ColorEncoding.srgb())
    assert np.allclose(m2 @ m1, np.eye(3), atol=1e-10)


def test_tone_map_and_gamut_map():
    rng = np.random.default_rng(1)
    rgb = rng.uniform(0, 1, (3, 16, 16)).astype(np.float32)
    lum = cms.primaries_luminances(_pq2020())
    out = cms.rec2408_tone_map(rgb, lum, (0.0, 10000.0), (0.0, 255.0))
    assert out.shape == rgb.shape and np.isfinite(out).all()
    # bright content compresses into the target's normalized range
    # (output units: 1.0 = target peak, Rec2408ToneMapperBase normalizer_)
    bright = np.full((3, 4, 4), 0.9, np.float32)
    toned = cms.rec2408_tone_map(bright, lum, (0.0, 10000.0), (0.0, 255.0))
    assert toned.max() <= 1.0 + 1e-3
    # gamut map pulls negative components up to >= 0
    oog = np.stack([np.full((4, 4), 0.7), np.full((4, 4), -0.2),
                    np.full((4, 4), 0.4)]).astype(np.float32)
    mapped = cms.gamut_map(oog, lum)
    assert mapped.min() >= -1e-6
    assert np.isfinite(mapped).all()


def _hdr_image(h=256, w=384):
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([0.1 + 0.4 * xx / w, 0.1 + 0.4 * yy / h,
                    0.2 + 0.3 * (xx + yy) / (h + w)], -1).astype(np.float32)
    img += rng.normal(0, 0.004, img.shape).astype(np.float32)
    return img.clip(0, 0.8)


@pytest.mark.parametrize("ce_fn,tol", [(_pq2020, 5e-5), (_hlg2020, 5e-4)])
def test_hdr_roundtrip_vs_oracle(ce_fn, tol):
    """HDR float encode -> both decoders produce near-identical signal
    values in the stream's color space (validates PQ/HLG + Rec2020 +
    Bradford adaptation against libjxl's CMS)."""
    from libjxl_tpu.api.decoder import decode
    from libjxl_tpu.utils.oracle import oracle_available, oracle_decode
    from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy

    img = _hdr_image()
    data = encode_lossy(img, LossyOptions(distance=1.0, effort=3,
                                          color_encoding=ce_fn()))
    out = decode(data)
    assert out.dtype == np.float32 and out.shape == img.shape
    err = np.abs(out - img)
    assert np.sqrt((err ** 2).mean()) < 0.01   # lossy-but-close signal
    if oracle_available():
        ref = oracle_decode(data, dtype=np.float32, num_channels=3).pixels
        d = np.abs(out - ref)
        assert d.max() < tol, d.max()


def test_hdr_with_epf_and_float16():
    """EPF-on HDR path (BASELINE config 4 semantics) + float16 input."""
    from libjxl_tpu.api.decoder import decode
    from libjxl_tpu.utils.oracle import oracle_available, oracle_decode
    from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy

    img = _hdr_image(192, 256).astype(np.float16)
    data = encode_lossy(img, LossyOptions(distance=2.0, effort=5,
                                          color_encoding=_pq2020()))
    out = decode(data)
    assert out.dtype == np.float32
    err = np.abs(out - img.astype(np.float32))
    assert np.sqrt((err ** 2).mean()) < 0.02
    if oracle_available():
        ref = oracle_decode(data, dtype=np.float32, num_channels=3).pixels
        assert np.abs(out - ref).max() < 2e-3


def test_gray_and_gamma_encodings():
    """Gray output space and gamma transfer through the CMS."""
    lin = np.random.default_rng(2).uniform(0, 1, (3, 8, 8)) \
        .astype(np.float32)
    gray = ColorEncoding(color_space=ColorSpace.GRAY)
    y = cms.linear_srgb_to_encoding(lin, gray, 255.0)
    assert y.shape == (1, 8, 8)
    gamma_ce = ColorEncoding(
        tf=CustomTransferFunction(have_gamma=True, gamma=4545455))
    sig = cms.linear_srgb_to_encoding(lin, gamma_ce, 255.0)
    back = cms.encoding_to_linear_srgb(sig, gamma_ce, 255.0)
    assert np.allclose(back, lin, atol=1e-5)

def _make_matrix_trc_icc(matrix_cols, gamma):
    """Minimal v2 RGB matrix/TRC profile (test fixture)."""
    import struct

    def xyz_tag(v):
        return b"XYZ " + b"\0" * 4 + b"".join(
            struct.pack(">i", int(round(x * 65536))) for x in v)

    def curv_gamma(g):
        return (b"curv" + b"\0" * 4 + struct.pack(">I", 1) +
                struct.pack(">H", int(round(g * 256))))

    tags = [(b"wtpt", xyz_tag([0.9642, 1.0, 0.8249])),
            (b"rXYZ", xyz_tag(matrix_cols[0])),
            (b"gXYZ", xyz_tag(matrix_cols[1])),
            (b"bXYZ", xyz_tag(matrix_cols[2])),
            (b"rTRC", curv_gamma(gamma)), (b"gTRC", curv_gamma(gamma)),
            (b"bTRC", curv_gamma(gamma))]
    n = len(tags)
    table, payload = b"", b""
    off = 132 + 12 * n
    for sig, data in tags:
        pad = (4 - len(data) % 4) % 4
        table += struct.pack(">4sII", sig, off, len(data))
        payload += data + b"\0" * pad
        off += len(data) + pad
    hdr = bytearray(128)
    struct.pack_into(">I", hdr, 0, 132 + 12 * n + len(payload))
    hdr[8:12] = b"\x02\x10\x00\x00"
    hdr[12:16] = b"mntr"
    hdr[16:20] = b"RGB "
    hdr[20:24] = b"XYZ "
    hdr[36:40] = b"acsp"
    struct.pack_into(">iii", hdr, 68, int(0.9642 * 65536), 65536,
                     int(0.8249 * 65536))
    return bytes(hdr) + struct.pack(">I", n) + table + payload


def test_icc_profile_cms_vs_littlecms():
    """Matrix/TRC ICC color management (color/icc_profile.py; the
    jxl_cms.cc surface): parsed transforms agree with littleCMS within
    +-1/255 on both an sRGB profile and a wide-gamut gamma profile."""
    import io

    pytest.importorskip("PIL.ImageCms")
    from PIL import Image, ImageCms

    from libjxl_tpu.color.icc_profile import icc_to_linear_srgb
    from libjxl_tpu.color.xyb import linear_to_srgb

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (24, 36, 3)).astype(np.uint8)
    cols = [[0.6097, 0.3111, 0.0195], [0.2053, 0.6257, 0.0609],
            [0.1492, 0.0632, 0.7445]]          # AdobeRGB-like, D50
    for icc in (_make_matrix_trc_icc(cols, 2.2),
                ImageCms.ImageCmsProfile(
                    ImageCms.createProfile("sRGB")).tobytes()):
        tr = ImageCms.buildTransform(
            ImageCms.ImageCmsProfile(io.BytesIO(icc)),
            ImageCms.createProfile("sRGB"), "RGB", "RGB",
            renderingIntent=ImageCms.Intent.RELATIVE_COLORIMETRIC)
        ref = np.asarray(ImageCms.applyTransform(Image.fromarray(img),
                                                 tr))
        sig = np.moveaxis(img.astype(np.float64) / 255.0, -1, 0)
        lin = icc_to_linear_srgb(sig, icc)
        ours = np.moveaxis(np.clip(
            linear_to_srgb(lin) * 255 + 0.5, 0, 255).astype(np.uint8),
            0, -1)
        assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_icc_input_to_encoder():
    """ICC-described encoder input normalizes through the profile CMS
    (encoding_to_linear_srgb ICC branch) instead of silently assuming
    sRGB."""
    from libjxl_tpu.color.cms import encoding_to_linear_srgb
    from libjxl_tpu.core.headers import ColorEncoding

    cols = [[0.6097, 0.3111, 0.0195], [0.2053, 0.6257, 0.0609],
            [0.1492, 0.0632, 0.7445]]
    icc = _make_matrix_trc_icc(cols, 2.2)
    ce = ColorEncoding()
    ce.want_icc = True
    ce.icc = icc
    rng = np.random.default_rng(0)
    sig = rng.random((3, 8, 9))
    out = encoding_to_linear_srgb(sig, ce)
    # gamma-2.2 wide-gamut reds land OUTSIDE the naive sRGB decode
    naive = sig ** 2.4
    assert not np.allclose(out, naive, atol=1e-3)
    assert out.shape == sig.shape


def test_icc_lut_profiles_vs_littlecms():
    """LUT-class ICC profiles (mft2 lut16 + v4 mAB/mBA pipelines with
    tetrahedral CLUT interpolation; jxl_cms.cc through skcms/lcms):
    A2B agrees with littleCMS's v2 16-bit path within 1.5/255; the v4
    layout parses to the numerically identical pipeline; B2A agrees
    with littleCMS except where the coarse-grid CLUT's near-black
    curvature amplifies lcms's internal 16-bit stage quantization."""
    import io

    pytest.importorskip("PIL.ImageCms")
    from PIL import Image, ImageCms

    from libjxl_tpu.color.icc_profile import (
        icc_to_linear_srgb, linear_srgb_to_icc,
    )
    from tests._icc_lut_helper import (
        _linear_to_srgb, _srgb_to_linear, build_lut_profile,
        build_mab_profile,
    )

    icc2 = build_lut_profile(17)
    icc4 = build_mab_profile(17)
    sr = ImageCms.ImageCmsProfile(ImageCms.createProfile("sRGB"))
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (32, 48, 3), np.uint8)
    sig = np.moveaxis(img, -1, 0) / 255.0

    # device->PCS->sRGB vs lcms (v2 layout; 16-bit tetrahedral path)
    pf = ImageCms.ImageCmsProfile(io.BytesIO(icc2))
    xf = ImageCms.buildTransformFromOpenProfiles(
        pf, sr, "RGB", "RGB", renderingIntent=0)
    ref = np.asarray(ImageCms.applyTransform(
        Image.fromarray(img), xf)).astype(float)
    ours = np.moveaxis(_linear_to_srgb(
        icc_to_linear_srgb(sig, icc2)), 0, -1) * 255.0
    assert np.abs(ours - ref).max() <= 1.5

    # v4 mAB layout -> identical pipeline as the v2 layout
    ours4 = np.moveaxis(_linear_to_srgb(
        icc_to_linear_srgb(sig, icc4)), 0, -1) * 255.0
    assert np.abs(ours4 - ours).max() < 1e-9

    # sRGB->PCS->device (B2A/mBA): layouts agree exactly; vs lcms the
    # bulk agrees (the max sits in the near-black high-slope cells)
    lin = _srgb_to_linear(sig)
    dev2 = linear_srgb_to_icc(lin, icc2)
    dev4 = linear_srgb_to_icc(lin, icc4)
    assert np.abs(dev4 - dev2).max() < 1e-9
    xf2 = ImageCms.buildTransformFromOpenProfiles(
        sr, pf, "RGB", "RGB", renderingIntent=0)
    ref2 = np.asarray(ImageCms.applyTransform(
        Image.fromarray(img), xf2)).astype(float)
    d = np.abs(np.moveaxis(dev2, 0, -1) * 255.0 - ref2)
    assert d.mean() < 1.0 and np.percentile(d, 99) < 5.0


def test_icc_lut_decode_output():
    """decode(..., icc_out=LUT profile) routes through the B2A
    pipeline end to end: a lossy stream whose signaled color encoding
    is the synthetic LUT profile (which wraps sRGB device encoding)
    roundtrips encoder CMS -> XYB -> decoder CMS back to approximately
    the original device signal, with no fallback warning."""
    import warnings

    from libjxl_tpu.api.decoder import decode
    from libjxl_tpu.core.headers import ColorEncoding
    from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy
    from tests._icc_lut_helper import build_lut_profile

    ce = ColorEncoding()
    ce.want_icc = True
    ce.icc = build_lut_profile(33)
    rng = np.random.default_rng(3)
    base = np.linspace(40, 215, 56)[None, :, None]
    img = np.clip(base + rng.integers(-6, 6, (40, 56, 3)), 0,
                  255).astype(np.uint8)
    data = encode_lossy(img, LossyOptions(
        distance=1.0, effort=2, color_encoding=ce))
    with warnings.catch_warnings():
        warnings.simplefilter("error")       # fallback would warn
        out = decode(data)
    assert out.shape == img.shape
    assert np.abs(out[3:-3, 3:-3].astype(int) -
                  img[3:-3, 3:-3].astype(int)).mean() < 6.0
