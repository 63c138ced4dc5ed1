"""Truncated/corrupt-input robustness (VERDICT r1 item 7; reference
models: dec_frame.cc:571-735 section status + Flush, decode_test.cc
byte-by-byte feeding, tools/djxl_fuzzer.cc)."""

import numpy as np
import pytest

from libjxl_tpu.core.fields import FormatError


def _stream(kind: str):
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:256, 0:384]
    img = np.stack([
        (xx * 255 // 384 + rng.integers(0, 8, (256, 384))),
        (yy * 255 // 256 + rng.integers(0, 8, (256, 384))),
        ((xx + yy) * 255 // 640 + rng.integers(0, 8, (256, 384))),
    ], -1).clip(0, 255).astype(np.uint8)
    if kind == "vardct":
        from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy
        return img, encode_lossy(img, LossyOptions(distance=1.0, effort=3))
    from libjxl_tpu.api.encoder import EncodeOptions, encode_lossless
    return img, encode_lossless(img, EncodeOptions(effort=2))


def test_flush_renders_partial_vardct():
    """JxlDecoderFlushImage analog: once DC has arrived, every prefix
    produces a picture; quality improves monotonically-ish to the full
    decode as AC groups complete."""
    from libjxl_tpu.api.events import StreamingDecoder

    img, data = _stream("vardct")
    errs = []
    for frac in (0.8, 0.92, 1.0):
        d = StreamingDecoder()
        d.feed(data[:int(len(data) * frac)])
        d.process()
        out = d.flush()
        assert out is not None and out.shape[:2] == img.shape[:2]
        srgb = np.clip(np.round(out[:, :, :3] * 255), 0, 255)
        errs.append(np.abs(srgb - img.astype(float)).mean())
    assert errs[-1] < 4.0            # full decode is close
    assert errs[0] >= errs[-1] - 1e-6  # partial never better than full
    assert errs[0] < 60              # partial shows real content (DC)


def test_flush_before_dc_returns_something_or_none():
    from libjxl_tpu.api.events import StreamingDecoder

    _, data = _stream("vardct")
    for frac in (0.02, 0.1, 0.3):
        d = StreamingDecoder()
        d.feed(data[:int(len(data) * frac)])
        d.process()
        out = d.flush()            # None or an image; never an exception
        assert out is None or out.ndim == 3


def test_byte_by_byte_feed_completes():
    """decode_test.cc-style: feed in odd-sized chunks; every process()
    call must be safe and the image must complete at the end."""
    from libjxl_tpu.api.events import DecoderEvent, StreamingDecoder

    img, data = _stream("vardct")
    d = StreamingDecoder()
    got_success = False
    for i in range(0, len(data), 997):
        d.feed(data[i:i + 997])
        for ev, _ in d.process():
            if ev == DecoderEvent.SUCCESS:
                got_success = True
    assert got_success and len(d.images) == 1


@pytest.mark.parametrize("kind", ["vardct", "lossless"])
def test_truncation_fuzz_never_crashes(kind):
    """Every truncation point either raises FormatError from decode()
    or parses to fewer events — no other exception type, no hang."""
    from libjxl_tpu.api.decoder import decode
    from libjxl_tpu.api.events import StreamingDecoder

    _, data = _stream(kind)
    points = np.linspace(1, len(data) - 1, 23, dtype=int)
    for p in points:
        try:
            decode(data[:p])
        except FormatError:
            pass
        d = StreamingDecoder()
        d.feed(data[:p])
        d.process()
        d.flush()


@pytest.mark.parametrize("kind", ["vardct", "lossless"])
def test_corruption_fuzz_never_crashes(kind):
    """Single-byte corruptions decode or raise FormatError — never
    crash with an internal error (djxl_fuzzer model)."""
    from libjxl_tpu.api.decoder import decode

    _, data = _stream(kind)
    rng = np.random.default_rng(1)
    for _ in range(40):
        pos = int(rng.integers(2, len(data)))
        d = bytearray(data)
        d[pos] ^= int(rng.integers(1, 256))
        try:
            decode(bytes(d))
        except FormatError:
            pass


def test_fuzzer_harness_clean():
    """Standalone fuzz harness (tools/djxl_fuzzer.cc model): truncation,
    corruption, splices and garbage across seed streams produce only
    clean FormatError/ValueError rejections."""
    from libjxl_tpu.cli.fuzz import run_fuzz
    assert run_fuzz(60, seed=7, timeout_s=60) == 0


def test_banded_low_memory_decode(rng):
    """Low-memory banded decode (low_memory_render_pipeline.cc model):
    decode_rows yields the image in group-row bands, bit-identical to
    the whole-frame decode, with the pixel buffer bounded to one band
    (pixel_row0 windowing) instead of the full frame."""
    import libjxl_tpu.vardct.frame_dec as FD
    from libjxl_tpu.api.decoder import decode, decode_rows
    from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy

    yy, xx = np.mgrid[0:700, 0:420]
    img = (np.stack([xx % 256, yy % 256, (xx + yy) % 256], -1)
           + rng.integers(0, 12, (700, 420, 3))
           ).clip(0, 255).astype(np.uint8)
    data = encode_lossy(img, LossyOptions(distance=1.2, effort=3))
    full = decode(data)

    max_rows = []
    orig = FD.VarDCTFrameDecoder.decode_ac_group

    def spy(self, *a, **k):
        if self.pixels is not None:
            max_rows.append(self.pixels.shape[1])
        return orig(self, *a, **k)

    FD.VarDCTFrameDecoder.decode_ac_group = spy
    try:
        bands = list(decode_rows(data))
    finally:
        FD.VarDCTFrameDecoder.decode_ac_group = orig
    got = np.concatenate([b for _, b in bands], axis=0)
    assert np.array_equal(got, full)
    assert bands[0][0] == 0 and len(bands) == 3
    assert max(max_rows) <= 256          # never the full 700-row frame


def test_banded_modular_decode(rng):
    """Banded low-memory decode covers modular lossless streams too:
    group rows decode independently, global RCTs invert per band, and
    the result is bit-exact vs the whole-frame decode."""
    from libjxl_tpu.api.decoder import decode, decode_rows
    from libjxl_tpu.api.encoder import EncodeOptions, encode_lossless

    yy, xx = np.mgrid[0:700, 0:420]
    img = (np.stack([xx % 256, yy % 256, (xx + yy) % 256], -1)
           + rng.integers(0, 12, (700, 420, 3))
           ).clip(0, 255).astype(np.uint8)
    d = encode_lossless(img, EncodeOptions(effort=5, palette=0))
    bands = list(decode_rows(d))
    assert len(bands) == 3 and bands[1][0] == 256
    got = np.concatenate([b for _, b in bands], axis=0)
    assert np.array_equal(got, img)
    assert np.array_equal(got, decode(d))


def test_banded_modular_palette_decode(rng):
    """Banded decode extends to palette streams: the zero-predictor
    palette (nb_deltas == 0) is a per-pixel lookup, so the index
    channel decodes band-locally and the palette meta channel comes
    from the global stream (dec_modular.cc global channel split)."""
    import libjxl_tpu.api.decoder as D
    from libjxl_tpu.api.decoder import decode, decode_rows
    from libjxl_tpu.api.encoder import EncodeOptions, encode_lossless

    pal = rng.integers(0, 256, (23, 3)).astype(np.uint8)
    idx = rng.integers(0, 23, (600, 300))
    img = pal[idx]
    d = encode_lossless(img, EncodeOptions(effort=7))

    plan = []
    orig = D._modular_banded_plan

    def spy(meta, fs):
        plan.append(orig(meta, fs))
        return plan[-1]

    D._modular_banded_plan = spy
    try:
        bands = list(decode_rows(d))
    finally:
        D._modular_banded_plan = orig
    assert plan and plan[-1] is not None     # banded path, not fallback
    got = np.concatenate([b for _, b in bands], axis=0)
    assert np.array_equal(got, img)
    assert np.array_equal(got, decode(d))


def test_banded_matches_whole_frame_with_xla_filters(rng):
    """With the XLA filter path forced on, whole-frame decode applies
    the filters in the same band windows as decode_rows
    (filters_jax.restore_banded), keeping both modes bit-identical."""
    from libjxl_tpu.api.decoder import decode, decode_rows
    from libjxl_tpu.config import config
    from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy

    yy, xx = np.mgrid[0:700, 0:420]
    img = (np.stack([xx % 256, yy % 256, (xx + yy) % 256], -1)
           + rng.integers(0, 12, (700, 420, 3))
           ).clip(0, 255).astype(np.uint8)
    import libjxl_tpu.config as C

    data = encode_lossy(img, LossyOptions(distance=1.2, effort=3))
    assert config.device_filters is None     # auto mode
    orig = C.device_filters_enabled
    C.device_filters_enabled = lambda n=None: True   # as if >= 4 MP
    try:
        full = decode(data)
        got = np.concatenate([b for _, b in decode_rows(data)], axis=0)
    finally:
        C.device_filters_enabled = orig
    assert np.array_equal(got, full)


def test_banded_decode_feature_streams():
    """decode_rows with noise/splines/patches streams: the band-windowed
    feature renderers (noise halo regen, spline window clip, patch rect
    clip) must reproduce the whole-frame decode exactly."""
    import numpy as np
    from libjxl_tpu.api.decoder import decode, decode_rows
    from libjxl_tpu.render.splines import QuantizedSpline, Splines
    from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy

    def banded_eq(data):
        full = decode(data)
        parts = {y0: b for y0, b in decode_rows(data)}
        banded = np.concatenate([parts[k] for k in sorted(parts)], axis=0)
        return np.array_equal(full, banded)

    rng = np.random.default_rng(6)
    h, w = 600, 192
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([140 + 70 * np.sin(xx / 50), 130 + 60 * np.cos(yy / 40),
                    120 + 50 * np.sin((xx + yy) / 70)], -1)
    img = (img + rng.normal(0, 5, img.shape)).clip(0, 255).astype(np.uint8)

    o = LossyOptions(distance=1.5, effort=5)
    o.noise = np.full(8, 0.3)
    assert banded_eq(encode_lossy(img, o))

    flat = np.full((600, 192, 3), 140, np.uint8)
    color = np.zeros((3, 32), np.int64)
    color[1, 0] = 60
    sigma = np.zeros(32, np.int64)
    sigma[0] = 8
    sp = Splines(0, [QuantizedSpline([(30, 500), (-10, 25), (5, -15)],
                                     color, sigma)], [(50.0, 40.0)])
    o = LossyOptions(distance=1.0, effort=3)
    o.splines = sp
    assert banded_eq(encode_lossy(flat, o))

    simg = np.full((520, 192, 3), 250, np.uint8)
    glyph = rng.integers(0, 120, (7, 5, 3), np.uint8)
    for k in range(40):
        y, x = 13 * (k % 30) + 4, 40 * (k // 30) + 12
        simg[y:y + 7, x:x + 5] = glyph
    data = encode_lossy(simg, LossyOptions(distance=2.0, effort=7))
    from libjxl_tpu.api.codestream import parse_codestream
    from libjxl_tpu.api.container import extract_codestream
    from libjxl_tpu.core.frame_header import FrameFlags
    _, frames = parse_codestream(extract_codestream(data))
    assert frames[-1].header.flags & FrameFlags.PATCHES
    assert banded_eq(data)


def test_hostile_size_no_alloc_bomb():
    """Fault-injection analog of the reference's failing-allocator tests
    (test_memory_manager.cc): header mutations that claim hostile
    dimensions must raise FormatError, never MemoryError — verified in
    a subprocess with the address space capped at 2 GB."""
    import subprocess
    import sys

    code = r'''
import jax; jax.config.update("jax_platforms", "cpu")
import itertools, resource
import numpy as np
from libjxl_tpu.api.encoder import EncodeOptions, encode_lossless
from libjxl_tpu.api.decoder import decode
from libjxl_tpu.core.fields import FormatError
img = np.zeros((8, 8, 3), np.uint8)
data = bytearray(encode_lossless(img, EncodeOptions(effort=1)))
resource.setrlimit(resource.RLIMIT_AS, (2 << 30, 2 << 30))
for i, v in itertools.product(range(2, 10), (0x01, 0x7f, 0xff)):
    bad = bytearray(data); bad[i] ^= v
    try:
        decode(bytes(bad))
    except FormatError:
        pass
print("CLEAN")
'''
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       timeout=240, cwd=__import__("os").path.dirname(
                           __import__("os").path.dirname(
                               __import__("os").path.abspath(__file__))))
    assert b"CLEAN" in r.stdout, (r.stdout, r.stderr[-800:])
