"""Event-driven decoder + object encoder APIs (reference decode.cc /
encode.cc event-loop and frame-queue models)."""

import numpy as np
import pytest

from libjxl_tpu.api.decoder import decode, decode_frames
from libjxl_tpu.api.encoder import EncodeOptions, encode_lossless
from libjxl_tpu.api.encoder_api import Encoder, FrameSettings
from libjxl_tpu.api.events import ALL_EVENTS, DecoderEvent, StreamingDecoder


def _u8(img):
    return np.clip(np.round(img[:, :, :3] * 255), 0, 255).astype(np.uint8)


def test_streaming_decoder_chunked(rng):
    img = rng.integers(0, 255, (150, 200, 3), dtype=np.uint8)
    data = encode_lossless(img, EncodeOptions(effort=2))
    dec = StreamingDecoder()
    seen = []
    for i in range(0, len(data), 64):
        dec.feed(data[i:i + 64])
        for e, p in dec.process():
            seen.append(e)
            if e == DecoderEvent.BASIC_INFO:
                assert (p.xsize, p.ysize) == (200, 150)
            if e == DecoderEvent.FULL_IMAGE:
                assert np.array_equal(_u8(p), img)
    assert seen == [DecoderEvent.BASIC_INFO, DecoderEvent.COLOR_ENCODING,
                    DecoderEvent.FRAME, DecoderEvent.FULL_IMAGE,
                    DecoderEvent.SUCCESS]


def test_streaming_decoder_container_boxes(rng):
    from libjxl_tpu.api.container import wrap_container
    img = rng.integers(0, 255, (40, 50, 3), dtype=np.uint8)
    data = wrap_container(encode_lossless(img, EncodeOptions(effort=2)),
                          extra_boxes=[(b"Exif", b"test-exif")])
    dec = StreamingDecoder()
    dec.feed(data)
    evs = dec.process()
    boxes = [p for e, p in evs if e == DecoderEvent.BOX]
    assert ("Exif", b"test-exif") in boxes
    full = [p for e, p in evs if e == DecoderEvent.FULL_IMAGE]
    assert len(full) == 1 and np.array_equal(_u8(full[0]), img)


def test_streaming_decoder_skip_and_rewind(rng):
    from libjxl_tpu.api.encoder import encode_animation
    frames = [rng.integers(0, 255, (60, 80, 3), dtype=np.uint8)
              for _ in range(3)]
    data = encode_animation(frames, options=EncodeOptions(effort=2))
    dec = StreamingDecoder()
    dec.skip_frames(2)
    dec.feed(data)
    evs = dec.process()
    assert sum(1 for e, _ in evs if e == DecoderEvent.FULL_IMAGE) == 1
    dec.rewind()
    evs = dec.process()
    assert sum(1 for e, _ in evs if e == DecoderEvent.FULL_IMAGE) == 3


def test_encoder_api_single_and_boxes(rng):
    img = rng.integers(0, 255, (100, 140, 3), dtype=np.uint8)
    e = Encoder()
    e.add_frame(img)
    e.add_box("Exif", b"\x00\x00\x00\x00MM\x00*")
    out = e.output()
    assert np.array_equal(decode(out), img)
    from libjxl_tpu.utils.oracle import oracle_available
    if oracle_available():
        from libjxl_tpu.utils.oracle import oracle_decode
        assert np.array_equal(oracle_decode(out, num_channels=3).pixels,
                              img)


def test_encoder_api_lossy(rng):
    yy, xx = np.mgrid[0:80, 0:96]
    img = np.stack([yy % 256, xx % 256, (xx + yy) % 256],
                   -1).astype(np.uint8)
    e = Encoder()
    e.add_frame(img, FrameSettings(lossless=False, distance=1.0))
    out = e.output()
    d = decode(out)
    assert np.sqrt(np.mean((d.astype(float) - img) ** 2)) < 8.0


def test_encoder_api_animation(rng):
    base = rng.integers(0, 255, (60, 70, 3), dtype=np.uint8)
    e = Encoder(have_animation=True)
    for i in range(3):
        f = base.copy()
        f[:, 10 * i:10 * i + 10] = 0
        e.add_frame(f, FrameSettings(duration=2, effort=2))
    out = e.output()
    _, disp = decode_frames(out)
    assert len(disp) == 3


def test_encoder_api_jpeg(rng):
    pytest.importorskip("PIL")
    import io

    from PIL import Image
    from libjxl_tpu.utils.oracle import oracle_available
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=90)
    jb = buf.getvalue()
    e = Encoder()
    e.add_jpeg_frame(jb)
    out = e.output()
    from libjxl_tpu.jpeg.transcode import decode_to_jpeg
    assert decode_to_jpeg(out) == jb
    if oracle_available():
        from libjxl_tpu.utils.oracle import oracle_decode_jpeg
        assert oracle_decode_jpeg(out) == jb


def test_streaming_encode_spec_mode(rng):
    """Spec streaming encode (enc_frame.cc:2045 EncodeFrameStreaming):
    ONE frame, sections laid out DC-group-major with a permuted TOC,
    per-group local trees; both decoders restore the image exactly."""
    from libjxl_tpu.api.encoder import encode_lossless_streaming
    img = rng.integers(0, 255, (700, 500, 3), dtype=np.uint8)
    chunks = list(encode_lossless_streaming(img, EncodeOptions(effort=2)))
    data = b"".join(chunks)
    assert np.array_equal(decode(data), img)
    from libjxl_tpu.utils.oracle import oracle_available
    if oracle_available():
        from libjxl_tpu.utils.oracle import oracle_decode
        assert np.array_equal(oracle_decode(data, num_channels=3).pixels,
                              img)


def test_streaming_encode_multi_dc_group(rng):
    """>2048 rows spans multiple DC groups; the TOC permutation maps the
    DC-group-major file layout back to spec section order."""
    from libjxl_tpu.api.encoder import encode_lossless_streaming
    yy, xx = np.mgrid[0:2200, 0:128]
    img = ((xx * 255 // 128 + yy * 255 // 2200) // 2 +
           rng.integers(0, 4, (2200, 128))).clip(0, 255).astype(np.uint8)
    data = b"".join(encode_lossless_streaming(img,
                                              EncodeOptions(effort=5)))
    assert np.array_equal(np.squeeze(decode(data)), img)
    from libjxl_tpu.utils.oracle import oracle_available
    if oracle_available():
        from libjxl_tpu.utils.oracle import oracle_decode
        ref = oracle_decode(data).pixels
        assert np.array_equal(ref.squeeze(), img)


def test_encoder_stats_bit_accounting():
    """Stats API (include/jxl/stats.h:49-76, enc_aux_out.h layers):
    per-layer bits sum to the stream size, block census and butteraugli
    iterations are reported."""
    import numpy as np

    from libjxl_tpu.api.encoder_api import Encoder, FrameSettings
    from libjxl_tpu.api.stats import EncoderStats

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (64, 96, 3)).astype(np.uint8)

    # lossless: header/toc/tree/global layers add up to the stream
    enc = Encoder(collect_stats=True)
    enc.add_frame(img, FrameSettings(lossless=True, effort=3))
    data = enc.output()
    st = enc.stats.as_dict()
    assert st["num_base_pixels"] == 64 * 96
    assert st["total_bits"] == len(data) * 8
    assert st["modular_global_bits"] > 0 and st["header_bits"] > 0

    # lossy: AC dominates, block census covers all blocks
    enc = Encoder(collect_stats=True)
    enc.add_frame(img, FrameSettings(lossless=False, distance=1.0,
                                     effort=3))
    data = enc.output()
    st = enc.stats.as_dict()
    assert st["total_bits"] == len(data) * 8
    assert st["ac_bits"] > 0 and st["dc_bits"] > 0
    assert sum(st["num_blocks"].values()) == (96 // 8) * (64 // 8)

    # e7: butteraugli iteration count appears; stats merge works
    enc = Encoder(collect_stats=True)
    enc.add_frame(img, FrameSettings(lossless=False, distance=1.0,
                                     effort=7))
    enc.output()
    assert enc.stats.num_butteraugli_iters >= 2
    total = EncoderStats()
    total.merge(enc.stats)
    total.merge(enc.stats)
    assert total.num_butteraugli_iters == 2 * enc.stats.num_butteraugli_iters


def test_pixel_format_matrix(rng):
    """JxlPixelFormat output matrix (decode.h, dec_external_image.cc):
    uint8/uint16/float16/float32 x endianness x channel count x row
    alignment, via ImageDecoder.set_image_out_format."""
    from libjxl_tpu.api.events import PixelFormat

    img = rng.integers(0, 256, (10, 7, 3)).astype(np.uint8)
    data = encode_lossless(img, EncodeOptions(effort=2))
    for dt, np_dt in (("uint8", np.uint8), ("uint16", ">u2"),
                      ("float32", "<f4")):
        dec = StreamingDecoder(ALL_EVENTS)
        endian = {"uint16": "big", "float32": "little"}.get(dt, "native")
        dec.set_image_out_format(PixelFormat(3, dt, endian, align=8))
        dec.feed(data)
        evs = dict(dec.process())
        raw = evs[DecoderEvent.FULL_IMAGE]
        assert isinstance(raw, bytes)
        itemsize = np.dtype(np_dt).itemsize
        stride = -(-7 * 3 * itemsize // 8) * 8
        assert len(raw) == stride * 10
        row0 = np.frombuffer(raw[:7 * 3 * itemsize], np_dt)
        if dt == "uint8":
            assert np.array_equal(row0.reshape(7, 3), img[0])
        elif dt == "uint16":
            assert np.allclose(row0.reshape(7, 3) / 257.0, img[0],
                               atol=0.51)
        else:
            assert np.allclose(row0.reshape(7, 3) * 255.0, img[0],
                               atol=0.51)


def test_parallel_runner_seam(rng):
    """Pluggable parallel runner (parallel_runner.h C ABI model):
    sequential / thread / resizable runners share one interface, and the
    decoder's group fan-out honors set_default_runner."""
    from libjxl_tpu.parallel.runner import (
        ResizableRunner, SequentialRunner, ThreadRunner, default_runner,
        set_default_runner,
    )

    for runner in (SequentialRunner(), ThreadRunner(3)):
        hits = []
        runner.run(17, lambda i, t: hits.append((i, t)))
        assert sorted(i for i, _ in hits) == list(range(17))
    rr = ResizableRunner(2)
    rr.set_num_threads(4)
    assert rr.num_threads == 4
    assert ResizableRunner.suggested_threads(4096, 4096) >= 1
    out = rr.map(lambda x: x * x, range(9))
    assert out == [x * x for x in range(9)]

    # decode goes through the seam: a counting sequential runner sees use
    class Counting(SequentialRunner):
        calls = 0

        def map(self, fn, items):
            Counting.calls += 1
            return super().map(fn, items)

    from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy
    img = rng.integers(0, 256, (600, 600, 3)).astype(np.uint8)
    data = encode_lossy(img, LossyOptions(distance=2.0, effort=3))
    prev = default_runner()
    set_default_runner(Counting())
    try:
        assert decode(data).shape == img.shape
    finally:
        set_default_runner(prev)
    assert Counting.calls >= 1


def test_preview_frame(rng):
    """ImageMetadata.have_preview + a preview frame before the first
    regular frame (dec_frame.cc nonserialized_is_preview): decode()
    returns the MAIN image, the events API emits PREVIEW_IMAGE
    (decode.h JXL_DEC_PREVIEW_IMAGE), and libjxl accepts the stream."""
    img = rng.integers(0, 256, (120, 160, 3)).astype(np.uint8)
    o = EncodeOptions(effort=3)
    o.preview = img[::8, ::8].copy()
    data = encode_lossless(img, o)
    assert np.array_equal(decode(data), img)
    dec = StreamingDecoder()
    dec.feed(data)
    evs = dec.process()
    kinds = [e for e, _ in evs]
    assert DecoderEvent.PREVIEW_IMAGE in kinds
    pv = [p for e, p in evs if e == DecoderEvent.PREVIEW_IMAGE][0]
    assert pv.shape[:2] == (15, 20)
    assert np.array_equal(_u8([p for e, p in evs
                               if e == DecoderEvent.FULL_IMAGE][0]), img)
    from libjxl_tpu.utils.oracle import oracle_available, oracle_decode
    if oracle_available():
        assert np.array_equal(oracle_decode(data).pixels, img)


def test_encoder_api_mixed_lossless_lossy_animation(rng):
    """Mixed per-frame lossless/lossy animation: the container stays
    non-XYB (the reference rejects lossless frames in xyb_encoded
    codestreams, encode.cc:1573-1576); lossy frames ride as lossy
    modular. Lossless frames must roundtrip exactly; the whole stream
    must be oracle-decodable."""
    base = rng.integers(0, 255, (64, 72, 3), dtype=np.uint8)
    frames = []
    e = Encoder(have_animation=True)
    for i in range(3):
        f = base.copy()
        f[:, 16 * i:16 * i + 16] = (40 * i) % 256
        frames.append(f)
        e.add_frame(f, FrameSettings(duration=1, effort=3,
                                     lossless=(i != 1), distance=1.0))
    out = e.output()
    meta, disp = decode_frames(out)
    assert len(disp) == 3
    f0 = np.round(np.asarray(disp[0].pixels) * 255).astype(np.uint8)
    f2 = np.round(np.asarray(disp[2].pixels) * 255).astype(np.uint8)
    assert np.array_equal(np.moveaxis(f0, 0, -1) if f0.shape[0] == 3
                          else f0, frames[0])
    assert np.array_equal(np.moveaxis(f2, 0, -1) if f2.shape[0] == 3
                          else f2, frames[2])
    f1 = np.asarray(disp[1].pixels)
    f1 = np.moveaxis(f1, 0, -1) if f1.shape[0] == 3 else f1
    rmse = np.sqrt(np.mean((f1 * 255 - frames[1]) ** 2))
    assert rmse < 16.0                     # lossy frame: close, not exact
    from libjxl_tpu.utils.oracle import oracle_available
    if oracle_available():
        from libjxl_tpu.utils.oracle import oracle_decode
        ref = oracle_decode(out, num_channels=3)
        assert ref.pixels.shape[:2] == (64, 72)


def test_grayscale_multiframe_compositing(rng):
    """Grayscale animation (modular frames with one color channel) now
    composites through the multi-frame float path (decoder.py gray
    replication) and decodes to one channel."""
    frames = [rng.integers(0, 256, (40, 56, 1), dtype=np.uint8)
              for _ in range(2)]
    from libjxl_tpu.api.encoder import EncodeOptions, encode_animation
    data = encode_animation(frames, [1, 1], EncodeOptions(effort=3),
                            tps=(10, 1))
    out = decode(data)
    assert out.shape == (40, 56, 1)
    assert np.array_equal(out[:, :, 0], frames[1][:, :, 0])
    _, disp = decode_frames(data)
    for i, d in enumerate(disp):
        px = np.asarray(d.pixels)
        got = np.round(px[..., 0] * 255).astype(np.uint8) \
            if px.ndim == 3 and px.shape[-1] >= 1 else px
        assert np.array_equal(got, frames[i][:, :, 0])
    from libjxl_tpu.utils.oracle import oracle_available
    if oracle_available():
        from libjxl_tpu.utils.oracle import oracle_decode
        ref = oracle_decode(data, num_channels=1)
        assert np.array_equal(ref.pixels[:, :, 0], frames[1][:, :, 0])


def test_jxli_frame_index_box():
    """--frame_indexing: the animation container carries a ``jxli``
    frame-index box (encode.cc:668-741, encode_internal.h:40-76) whose
    records point at the codestream offsets of the marked keyframes;
    the stream stays decodable by us and the system decoder."""
    import numpy as np

    from libjxl_tpu.api.container import (
        decode_frame_index_box, extract_codestream, parse_boxes,
    )
    from libjxl_tpu.api.decoder import decode_frames
    from libjxl_tpu.api.encoder import EncodeOptions, encode_animation

    rng = np.random.default_rng(1)
    frames = [rng.integers(0, 256, (64, 80, 3)).astype(np.uint8)
              for _ in range(4)]
    data = encode_animation(frames, [2, 3, 4, 5],
                            EncodeOptions(effort=2), tps=(10, 1),
                            frame_indexing="1011")
    boxes = {b.type: b for b in parse_boxes(data)}
    assert b"jxli" in boxes and b"jxlc" in boxes
    tnum, tden, recs = decode_frame_index_box(boxes[b"jxli"].data)
    assert (tnum, tden) == (10, 1)
    assert len(recs) == 3          # frames 0, 2, 3 ('1011')
    # the first record's offset must point at frame 0 (headers end)
    cs = extract_codestream(data)
    off0 = recs[0][0]
    assert 0 < off0 < len(cs)
    _, decs = decode_frames(data)
    assert len(decs) == 4
    q = np.rint(np.asarray(decs[0].pixels)[:, :, :3] * 255
                ).astype(np.uint8)
    assert np.array_equal(q, frames[0])
    from libjxl_tpu.utils.oracle import oracle_available, oracle_decode
    if oracle_available():
        assert oracle_decode(data).pixels.shape == (64, 80, 3)
