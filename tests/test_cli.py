"""CLI tool smoke tests (cjxl_tpu / djxl_tpu / jxlinfo_tpu)."""

import numpy as np
import pytest

from libjxl_tpu.cli.cjxl import main as cjxl_main
from libjxl_tpu.cli.djxl import main as djxl_main
from libjxl_tpu.cli.jxlinfo import main as jxlinfo_main
from libjxl_tpu.extras.io import load_image, save_image


@pytest.fixture
def png(tmp_path, rng):
    img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    path = tmp_path / "in.png"
    save_image(str(path), img)
    return path, img


def test_cjxl_djxl_lossless_roundtrip(tmp_path, png):
    path, img = png
    jxl = tmp_path / "out.jxl"
    out = tmp_path / "out.png"
    assert cjxl_main([str(path), str(jxl), "--lossless", "-q"]) == 0
    assert djxl_main([str(jxl), str(out), "-q"]) == 0
    assert np.array_equal(load_image(str(out)), img)


def test_cjxl_lossy_and_info(tmp_path, png, capsys):
    path, img = png
    jxl = tmp_path / "out.jxl"
    assert cjxl_main([str(path), str(jxl), "-d", "1.0", "-q"]) == 0
    assert jxlinfo_main([str(jxl)]) == 0
    out = capsys.readouterr().out
    assert "VarDCT" in out and "64x48" in out


def test_pnm_roundtrip(tmp_path, rng):
    img = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    p = tmp_path / "x.ppm"
    save_image(str(p), img)
    assert np.array_equal(load_image(str(p)), img)


def test_jxltran_pack_extract_strip(tmp_path):
    """jxltran (tools/jxltran.cc): pack/extract/strip round-trip without
    touching the payload."""
    import numpy as np

    from libjxl_tpu.api.container import is_container, wrap_container
    from libjxl_tpu.api.decoder import decode
    from libjxl_tpu.api.encoder import EncodeOptions, encode_lossless
    from libjxl_tpu.cli.jxltran import main as jxltran

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (32, 48, 3)).astype(np.uint8)
    cs = encode_lossless(img, EncodeOptions(effort=2))
    raw = tmp_path / "raw.jxl"
    raw.write_bytes(cs)
    packed = tmp_path / "packed.jxl"
    assert jxltran([str(raw), str(packed), "--pack"]) == 0
    assert is_container(packed.read_bytes())
    assert np.array_equal(decode(packed.read_bytes()), img)
    back = tmp_path / "back.jxl"
    assert jxltran([str(packed), str(back), "--extract"]) == 0
    assert back.read_bytes() == cs
    # strip drops metadata boxes but keeps the image decodable
    boxed = tmp_path / "boxed.jxl"
    boxed.write_bytes(wrap_container(
        cs, extra_boxes=[(b"Exif", b"\x00\x00\x00\x00MM\x00*")]))
    stripped = tmp_path / "stripped.jxl"
    assert jxltran([str(boxed), str(stripped), "--strip"]) == 0
    sdata = stripped.read_bytes()
    assert b"Exif" not in sdata
    assert np.array_equal(decode(sdata), img)


def test_benchmark_xl_harness(tmp_path, rng):
    """benchmark_xl-class harness (tools/benchmark/benchmark_xl.cc,
    doc/benchmarking.md:56-77 columns) over two configs."""
    from PIL import Image

    from libjxl_tpu.cli.benchmark_xl import _load, run_benchmark

    img = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
    p = tmp_path / "a.png"
    Image.fromarray(img).save(p)
    rows = run_benchmark([_load(str(p))], ["jxl:d0:e2", "jxl:d1.0:e3"],
                         out=open("/dev/null", "w"))
    assert len(rows) == 2
    lossless, lossy = rows
    assert lossless["max_norm"] < 1e-4 and lossless["psnr"] > 90
    assert lossy["bpp"] < lossless["bpp"]
    for k in ("bpp", "enc_mpps", "dec_mpps", "ssimulacra2", "pnorm",
              "qabpp"):
        assert np.isfinite(rows[0][k]) and np.isfinite(rows[1][k])


def test_chunked_frame_adapter(rng):
    """JxlEncoderChunkedFrameAdapter (encode.cc:2534): callback-supplied
    frames encode through the streaming path and roundtrip exactly."""
    from libjxl_tpu.api.decoder import decode
    from libjxl_tpu.api.encoder_api import Encoder, FrameSettings

    img = rng.integers(0, 256, (300, 200, 3)).astype(np.uint8)

    def get_chunk(x0, y0, w, h):
        return img[y0:y0 + h, x0:x0 + w]

    enc = Encoder()
    enc.add_chunked_frame(200, 300, get_chunk,
                          FrameSettings(lossless=True, effort=2))
    data = enc.output()
    assert np.array_equal(decode(data), img)
