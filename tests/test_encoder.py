"""Encoder conformance: our streams must decode bit-exactly in BOTH our
decoder and the reference libjxl decoder (BASELINE config 1 gate)."""

import numpy as np
import pytest

from libjxl_tpu.api.decoder import decode
from libjxl_tpu.api.encoder import EncodeOptions, encode_lossless
from libjxl_tpu.utils.oracle import oracle_available, oracle_decode

needs_oracle = pytest.mark.skipif(not oracle_available(),
                                  reason="libjxl oracle not available")


def _gradient_image(h, w):
    x = np.arange(w)[None, :] + np.arange(h)[:, None] * 2
    return np.stack([x % 256, (x * 3) % 256, (x * 7) % 256],
                    axis=-1).astype(np.uint8)


def _roundtrip(img, **kw):
    data = encode_lossless(img, **kw)
    out = decode(data)
    assert np.array_equal(out.squeeze(), img.squeeze())
    return data


@needs_oracle
def test_encode_oracle_decodes_rgb(rng):
    img = _gradient_image(40, 48)
    data = _roundtrip(img)
    o = oracle_decode(data, num_channels=3)
    assert np.array_equal(o.pixels, img)


@needs_oracle
def test_encode_oracle_decodes_noise(rng):
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    data = _roundtrip(img)
    assert np.array_equal(oracle_decode(data, num_channels=3).pixels, img)


@needs_oracle
def test_encode_oracle_decodes_gray(rng):
    img = (np.arange(48)[None, :] * 3 % 256).astype(np.uint8).repeat(40, 0)
    data = _roundtrip(img)
    assert np.array_equal(
        oracle_decode(data, num_channels=1).pixels.squeeze(), img)


@needs_oracle
def test_encode_oracle_decodes_16bit(rng):
    img = rng.integers(0, 65536, (32, 32, 3)).astype(np.uint16)
    data = _roundtrip(img)
    o = oracle_decode(data, num_channels=3, dtype=np.uint16)
    assert np.array_equal(o.pixels, img)


@needs_oracle
def test_encode_oracle_decodes_multigroup(rng):
    img = np.zeros((300, 520, 3), np.uint8)
    img[:, :, 0] = (np.arange(520) % 256)[None, :]
    img[:, :, 1] = (np.arange(300) % 256)[:, None]
    img[100:200, 100:400, 2] = 200
    data = _roundtrip(img)
    assert np.array_equal(oracle_decode(data, num_channels=3).pixels, img)


@needs_oracle
@pytest.mark.parametrize("h,w", [(1, 1), (7, 3), (33, 17), (257, 100)])
def test_encode_oracle_decodes_odd_sizes(rng, h, w):
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    data = _roundtrip(img)
    assert np.array_equal(oracle_decode(data, num_channels=3).pixels, img)


def test_encode_no_rct_roundtrip(rng):
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    _roundtrip(img, options=EncodeOptions(use_rct=False))


def test_density_sane(rng):
    # A flat image must compress to far below raw size.
    img = np.full((128, 128, 3), 77, np.uint8)
    data = encode_lossless(img)
    assert len(data) < 1000


@needs_oracle
def test_encode_rgba_alpha(rng):
    img = rng.integers(0, 256, (40, 48, 4), dtype=np.uint8)
    data = _roundtrip(img)
    assert np.array_equal(oracle_decode(data, num_channels=4).pixels, img)


@needs_oracle
def test_encode_gray_alpha(rng):
    img = rng.integers(0, 256, (30, 30, 2), dtype=np.uint8)
    data = _roundtrip(img)
    assert np.array_equal(oracle_decode(data, num_channels=2).pixels, img)


def test_lossless_learned_tree_roundtrip():
    """effort>=5: MA tree learning with per-leaf predictors (incl. the
    weighted predictor); denser than the fixed-tree path and decodable by
    both our decoder and libjxl."""
    import numpy as np

    from libjxl_tpu.api.decoder import decode
    from libjxl_tpu.api.encoder import EncodeOptions, encode_lossless
    rng = np.random.default_rng(5)
    img = np.clip(np.cumsum(rng.integers(-3, 4, (96, 112, 3)), axis=1),
                  0, 255).astype(np.uint8)
    fast = encode_lossless(img, EncodeOptions(effort=2))
    dense = encode_lossless(img, EncodeOptions(effort=7))
    assert np.array_equal(decode(dense), img)
    assert len(dense) < len(fast)
    from libjxl_tpu.utils.oracle import oracle_available
    if oracle_available():
        from libjxl_tpu.utils.oracle import oracle_decode
        assert np.array_equal(oracle_decode(dense).pixels[:, :, :3], img)


def test_lossless_prefix_device_roundtrip():
    """Device-side Huffman packing (prefix mode): bitstream is produced
    on the accelerator; both decoders accept it."""
    import numpy as np

    from libjxl_tpu.api.decoder import decode
    from libjxl_tpu.api.encoder import EncodeOptions, encode_lossless
    rng = np.random.default_rng(9)
    img = np.clip(np.cumsum(rng.integers(-3, 4, (300, 420, 3)), axis=1),
                  0, 255).astype(np.uint8)
    opts = EncodeOptions(use_device=True, entropy="prefix-device")
    data = encode_lossless(img, opts)
    assert np.array_equal(decode(data), img)
    from libjxl_tpu.utils.oracle import oracle_available
    if oracle_available():
        from libjxl_tpu.utils.oracle import oracle_decode
        assert np.array_equal(oracle_decode(data).pixels[:, :, :3], img)


def test_lossless_palette_transform():
    """Forward palette (enc_palette.cc behavior): few-color images encode
    via a palette meta channel + index channel, at a large density win;
    both decoders restore exactly."""
    import numpy as np

    from libjxl_tpu.api.decoder import decode
    from libjxl_tpu.api.encoder import EncodeOptions, encode_lossless
    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, (16, 3), np.uint8)
    for h, w in ((100, 150), (300, 500)):
        img = pal[rng.integers(0, 16, (h, w))]
        data = encode_lossless(img, EncodeOptions(effort=5))
        assert np.array_equal(decode(data), img)
        plain = encode_lossless(img, EncodeOptions(effort=5, palette=0))
        assert len(data) < len(plain) // 3
        from libjxl_tpu.utils.oracle import oracle_available
        if oracle_available():
            from libjxl_tpu.utils.oracle import oracle_decode
            assert np.array_equal(
                oracle_decode(data, num_channels=3).pixels, img)


def test_lossless_squeeze_transform():
    """Forward squeeze (enc_transforms FwdSqueeze, default parameters):
    lossless roundtrip through our decoder and the reference, including
    DC-group and shifted AC-group channel placement."""
    import numpy as np

    from libjxl_tpu.api.decoder import decode
    from libjxl_tpu.api.encoder import EncodeOptions, encode_lossless
    rng = np.random.default_rng(12)
    h, w = 300, 400
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([(xx // 3 + yy // 5) % 256, (yy // 2) % 256,
                    ((xx + yy) // 4) % 256], -1).astype(np.uint8)
    img += rng.integers(0, 6, img.shape).astype(np.uint8)
    data = encode_lossless(img, EncodeOptions(effort=5, squeeze=True,
                                              palette=0))
    assert np.array_equal(decode(data), img)
    from libjxl_tpu.utils.oracle import oracle_available
    if oracle_available():
        from libjxl_tpu.utils.oracle import oracle_decode
        assert np.array_equal(oracle_decode(data, num_channels=3).pixels,
                              img)


def test_lossless_lz77_rle():
    """RLE-mode LZ77 encode (enc_ans.cc ApplyLZ77_RLE): chosen
    automatically when it shrinks the stream; the reference decoder
    accepts the length/distance tokens."""
    import numpy as np

    from libjxl_tpu.api.decoder import decode
    from libjxl_tpu.api.encoder import EncodeOptions, encode_lossless
    rng = np.random.default_rng(8)
    h, w = 256, 512
    img = np.zeros((h, w, 3), np.uint8)
    img[:, :w // 2] = rng.integers(0, 256, (h, w // 2, 3))
    img[:, w // 2:] = 128
    data = encode_lossless(img, EncodeOptions(effort=2, palette=0))
    plain = encode_lossless(img, EncodeOptions(effort=2, palette=0,
                                               lz77=False))
    assert len(data) < 0.9 * len(plain)
    assert np.array_equal(decode(data), img)
    from libjxl_tpu.utils.oracle import oracle_available
    if oracle_available():
        from libjxl_tpu.utils.oracle import oracle_decode
        assert np.array_equal(oracle_decode(data, num_channels=3).pixels,
                              img)


def test_encode_animation():
    """Lossless animation encode: REPLACE-blended regular frames with
    durations; our decoder restores every frame, the reference accepts
    the stream (enc_frame.cc animation path)."""
    import numpy as np

    from libjxl_tpu.api.decoder import decode_frames
    from libjxl_tpu.api.encoder import EncodeOptions, encode_animation
    rng = np.random.default_rng(2)
    base = rng.integers(0, 255, (120, 160, 3), np.uint8)
    frames = []
    for i in range(4):
        f = base.copy()
        f[10 * i:10 * i + 30, :, 0] = 255
        frames.append(f)
    data = encode_animation(frames, durations=[2, 2, 2, 4],
                            options=EncodeOptions(effort=2))
    _, displayed = decode_frames(data)
    assert len(displayed) == 4
    assert [d.duration for d in displayed] == [2, 2, 2, 4]
    for i, df in enumerate(displayed):
        px = np.clip(np.round(df.pixels[:, :, :3] * 255), 0,
                     255).astype(np.uint8)
        assert np.array_equal(px, frames[i])
    from libjxl_tpu.utils.oracle import oracle_available
    if oracle_available():
        from libjxl_tpu.utils.oracle import oracle_decode
        assert np.array_equal(oracle_decode(data, num_channels=3).pixels,
                              frames[-1])


def test_lossless_e8_beats_libjxl_on_screenshot(rng):
    """The e8 candidate product (learned tree vs pure-LZ77 Zero
    predictor, palette on) must beat the reference encoder on tiled
    screenshot-like content — the match-or-beat bar from BASELINE.md."""
    from libjxl_tpu.api.decoder import decode
    from libjxl_tpu.api.encoder import EncodeOptions, encode_lossless
    from libjxl_tpu.utils.oracle import (
        oracle_available, oracle_decode, oracle_encode,
    )

    glyphs = [rng.integers(0, 255, (8, 6, 3)).astype(np.uint8)
              for _ in range(8)]
    img = np.concatenate(
        [np.concatenate([glyphs[g] for g in rng.integers(0, 8, 20)],
                        axis=1) for _ in range(12)], axis=0)
    img[40:60] = 230
    data = encode_lossless(img, EncodeOptions(effort=8))
    assert np.array_equal(decode(data), img)
    if oracle_available():
        assert np.array_equal(oracle_decode(data).pixels, img)
        ref = oracle_encode(img, lossless=True, effort=8)
        assert len(data) < len(ref), (len(data), len(ref))


def test_prev_channel_reference_properties(rng):
    """MA trees can split on prev-channel reference properties 16+
    (context_predict.h PrecomputeReferences): strongly channel-
    correlated content gets markedly denser, streams stay conformant
    in both decoders, and the win beats libjxl's own e5."""
    import libjxl_tpu.modular.enc_ma as MA
    from libjxl_tpu.api.decoder import decode
    from libjxl_tpu.api.encoder import EncodeOptions, encode_lossless
    from libjxl_tpu.utils.oracle import (
        oracle_available, oracle_decode, oracle_encode,
    )

    base = rng.integers(0, 200, (120, 160)).astype(np.int32)
    img = np.stack([base, base + rng.integers(0, 3, base.shape),
                    base // 2 + rng.integers(0, 3, base.shape)],
                   -1).clip(0, 255).astype(np.uint8)
    sav = MA.N_REF_CHANNELS
    MA.N_REF_CHANNELS = 0
    no_refs = encode_lossless(img, EncodeOptions(effort=5, palette=0))
    MA.N_REF_CHANNELS = sav
    with_refs = encode_lossless(img, EncodeOptions(effort=5, palette=0))
    assert len(with_refs) < 0.95 * len(no_refs)
    assert np.array_equal(decode(with_refs), img)
    if oracle_available():
        assert np.array_equal(oracle_decode(with_refs).pixels, img)
        ref = oracle_encode(img, lossless=True, effort=5)
        assert len(with_refs) < len(ref)


def test_unified_compress_params(rng):
    """CompressParams (enc_params.h model) resolves to both pipelines:
    distance 0 -> modular lossless roundtrip, distance 1 -> VarDCT."""
    from libjxl_tpu.api.decoder import decode
    from libjxl_tpu.params import CompressParams, compress

    img = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
    data = compress(img, CompressParams(distance=0.0, effort=3))
    assert np.array_equal(decode(data), img)
    data = compress(img, CompressParams(distance=1.5, effort=3))
    dec = decode(data)
    assert dec.shape == img.shape
    p = CompressParams(distance=2.0, effort=5, progressive_dc=1)
    assert p.to_lossy_options().progressive_dc == 1
    assert CompressParams(distance=0).is_lossless()
    assert not CompressParams(distance=1).is_lossless()


def test_modular_lossy_squeeze_quantization(rng):
    """Modular lossy (cjxl -m with -d > 0; enc_modular.cc
    QuantizeChannel): squeeze residuals are rounded to per-level
    multiples — smaller streams with bounded error, still decoding
    bit-identically on any conformant decoder."""
    from libjxl_tpu.api.decoder import decode
    from libjxl_tpu.api.encoder import EncodeOptions, encode_lossless

    yy, xx = np.mgrid[0:160, 0:200]
    img = np.clip(np.stack([120 + 90 * np.sin(xx / 23.0),
                            128 + 60 * np.cos(yy / 31.0),
                            100 + 50 * np.sin((xx + yy) / 17.0)], -1)
                  + rng.normal(0, 5, (160, 200, 3)), 0,
                  255).astype(np.uint8)
    base = encode_lossless(img, EncodeOptions(effort=5))
    sizes = [len(base)]
    prev_err = 0.0
    for d in (1.0, 3.0):
        data = encode_lossless(img, EncodeOptions(effort=5, distance=d))
        out = decode(data)
        err = float(np.abs(out.astype(int) - img.astype(int)).mean())
        assert err > prev_err           # loss grows with distance
        assert err < 2.0 + 4.0 * d      # but stays bounded
        sizes.append(len(data))
        prev_err = err
    assert sizes[2] < sizes[1] < sizes[0]


def test_debug_image_hook_and_logging():
    """Debug-image dump hook (enc_debug_image.cc analog) + leveled
    logging: encoder intermediates are delivered to the callback."""
    import numpy as np

    from libjxl_tpu.utils import debug
    from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (96, 96, 3), dtype=np.uint8)
    with debug.collect_debug_images() as images:
        encode_lossy(img, LossyOptions(distance=1.0, effort=7))
    assert any(k.startswith("quant_heatmap") for k in images)
    assert any(k.startswith("tile_heatmap") for k in images)
    qh = images["quant_heatmap"]
    assert qh.shape == (12, 12)
    # leveled logging smoke
    debug.set_level(1)
    debug.log(1, "visible")
    debug.log(3, "suppressed")
    debug.set_level(0)
