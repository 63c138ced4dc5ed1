"""Round-4 CLI/API surface tests: group_order TOC permutation, filter
overrides, ec_resampling, color descriptions, decoding-speed group
shift, auto-banded decode (tools/cjxl_main.cc:1000-1232 parity)."""

import numpy as np
import pytest

from libjxl_tpu.utils.oracle import oracle_available

needs_oracle = pytest.mark.skipif(not oracle_available(),
                                  reason="system libjxl not available")


def _rgba(h=200, w=300):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([xx % 256, yy % 256, (xx + yy) % 256,
                     np.clip(xx - yy + 128, 0, 255)], -1).astype(np.uint8)


@needs_oracle
def test_group_order_center_first():
    """--group_order 1: permuted-TOC stream decodes identically in both
    decoders (enc_frame.cc PermuteGlobalTOC)."""
    from libjxl_tpu.api.decoder import decode
    from libjxl_tpu.utils.oracle import oracle_decode
    from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy

    img = _rgba(520, 700)[:, :, :3]
    base = encode_lossy(img, LossyOptions(distance=1.0, effort=3))
    perm = encode_lossy(img, LossyOptions(distance=1.0, effort=3,
                                          group_order=1, center_x=690,
                                          center_y=10))
    assert perm != base
    assert np.array_equal(decode(perm), decode(base))
    ref = oracle_decode(perm, num_channels=3).pixels
    assert np.abs(decode(perm).astype(int) - ref.astype(int)).max() <= 1


@needs_oracle
def test_filter_overrides():
    """--epf/--gaborish force the loop-filter fields."""
    from libjxl_tpu.api.decoder import parse_codestream
    from libjxl_tpu.api.container import extract_codestream
    from libjxl_tpu.utils.bits import BitReader  # noqa: F401
    from libjxl_tpu.utils.oracle import oracle_decode
    from libjxl_tpu.api.decoder import decode
    from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy

    img = _rgba(128, 160)[:, :, :3]
    for kw, gab, epf in ((dict(epf=0), None, 0), (dict(epf=3), None, 3),
                         (dict(gaborish=1), True, None),
                         (dict(gaborish=0), False, None)):
        d = encode_lossy(img, LossyOptions(distance=1.0, effort=5, **kw))
        _, frames = parse_codestream(extract_codestream(d))
        lf = frames[0].header.loop_filter
        if gab is not None:
            assert lf.gab == gab, kw
        if epf is not None:
            assert lf.epf_iters == epf, kw
        ref = oracle_decode(d, num_channels=3).pixels
        assert np.abs(decode(d).astype(int) - ref.astype(int)).max() <= 1


@needs_oracle
def test_ec_resampling_alpha():
    """-r 2 --ec_resampling 2: alpha rides at 1/2 scale with
    extra_channel_upsampling signaled; both decoders agree."""
    from libjxl_tpu.api.decoder import decode
    from libjxl_tpu.utils.oracle import oracle_decode
    from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy

    img = _rgba()
    d = encode_lossy(img, LossyOptions(distance=1.0, effort=3,
                                       resampling=2, ec_resampling=2))
    out = decode(d)
    ref = oracle_decode(d).pixels
    assert out.shape == (200, 300, 4)
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_color_description_parser():
    from libjxl_tpu.core.headers import (
        ColorSpace, Primaries, TransferFunction, WhitePoint,
    )
    from libjxl_tpu.extras.color_description import (
        parse_color_description,
    )

    ce = parse_color_description("RGB_D65_202_Rel_PeQ")
    assert ce.color_space == ColorSpace.RGB
    assert ce.white_point == WhitePoint.D65
    assert ce.primaries == Primaries.BT2100
    assert ce.tf.transfer_function == TransferFunction.PQ
    g = parse_color_description("Gra_D65_Rel_SRG")
    assert g.color_space == ColorSpace.GRAY
    gm = parse_color_description("RGB_D65_SRG_Rel_g0.454550")
    assert gm.tf.have_gamma and abs(gm.tf.gamma - 4545500) <= 1
    with pytest.raises(ValueError):
        parse_color_description("RGB_D65_SRG_Rel_Zzz")


@needs_oracle
def test_faster_decoding_group_shift():
    """decoding_speed >= 2 drops modular groups to 128px
    (enc_frame.cc GetGroupSizeShift)."""
    from libjxl_tpu.api.decoder import decode
    from libjxl_tpu.api.encoder import EncodeOptions, encode_lossless
    from libjxl_tpu.utils.oracle import oracle_decode

    yy, xx = np.mgrid[0:300, 0:300]
    img = (np.stack([xx, yy, xx + yy], -1) % 256).astype(np.uint8)
    opts = EncodeOptions(effort=3, faster_decoding=2)
    assert opts.group_size_shift == 0
    d = encode_lossless(img, opts)
    assert np.array_equal(decode(d), img)
    assert np.array_equal(oracle_decode(d).pixels[:, :, :3], img)


def test_auto_banded_decode():
    """decode() above the pixel threshold streams through decode_rows
    and matches the whole-frame result exactly."""
    from libjxl_tpu.api.decoder import decode
    from libjxl_tpu.config import config
    from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy

    img = _rgba(300, 300)[:, :, :3]
    d = encode_lossy(img, LossyOptions(distance=1.0, effort=3))
    whole = decode(d)
    old = config.auto_band_pixels
    try:
        config.auto_band_pixels = 10000
        banded = decode(d)
    finally:
        config.auto_band_pixels = old
    assert np.array_equal(banded, whole)


def test_streaming_input_chunked_pnm(tmp_path):
    """--streaming_input: binary PNM rides as a memory-mapped view
    (ChunkedPNM, extras/dec/pnm.cc) into the band-streaming encoder;
    8- and 16-bit (big-endian raster) must roundtrip bit-exact."""
    import subprocess
    import sys

    import numpy as np

    from libjxl_tpu.api.decoder import decode
    from libjxl_tpu.extras.io import _write_pnm, open_image_chunked

    rng = np.random.default_rng(7)
    for dt, mx in ((np.uint8, 255), (np.uint16, 65535)):
        img = rng.integers(0, mx + 1, (300, 280, 3)).astype(dt)
        img[:, :, 1] = img[:, :, 0]
        pnm = tmp_path / f"in_{dt.__name__}.ppm"
        out = tmp_path / f"out_{dt.__name__}.jxl"
        pnm.write_bytes(_write_pnm(img))
        mm = open_image_chunked(str(pnm))
        assert isinstance(mm, np.memmap)
        r = subprocess.run(
            [sys.executable, "-m", "libjxl_tpu.cli.cjxl", str(pnm),
             str(out), "--lossless", "-e", "2", "--streaming_input",
             "--streaming_output", "-q"],
            capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        dec = decode(out.read_bytes())
        assert np.array_equal(dec.squeeze(), img.squeeze())
