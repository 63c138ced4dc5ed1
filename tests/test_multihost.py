"""Multi-host (DCN) encode: two jax.distributed processes shard the
streaming DC-group schedule (enc_frame.cc:2045-2160) and the gathered
stream is byte-identical to the single-process encode."""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dcn_encode_byte_identical(tmp_path):
    from libjxl_tpu.api.decoder import decode
    from libjxl_tpu.api.encoder import (
        EncodeOptions, encode_lossless_streaming,
    )

    rng = np.random.default_rng(11)
    img = np.clip(np.cumsum(rng.integers(-2, 3, (2048 + 300, 320, 3)),
                            axis=1), 0, 255).astype(np.uint8)
    opts = EncodeOptions(effort=2, group_size_shift=0)
    single = b"".join(encode_lossless_streaming(img, opts))

    port = _free_port()
    out_path = tmp_path / "mh.jxl"
    worker = os.path.join(os.path.dirname(__file__),
                          "_multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "PYTHONPATH")}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(p), "2", str(out_path)],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for p in range(2)]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o.decode(errors="replace")[-2000:]
    multi = out_path.read_bytes()
    assert multi == single
    assert np.array_equal(decode(multi), img)


def test_two_process_dcn_vardct_encode_byte_identical(tmp_path):
    """Multi-host VarDCT (VERDICT r4 next #6): the DC-group-band
    streaming schedule with per-band AC histogram sets
    (enc_frame.cc:2045, :2074) sharded over a REAL 2-process
    jax.distributed cluster is byte-identical to the single-process
    streaming encode, and the stream decodes (ours + system libjxl)."""
    from libjxl_tpu.api.decoder import decode
    from libjxl_tpu.vardct.frame_enc import (
        LossyOptions, encode_lossy_streaming,
    )

    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:2048 + 300, 0:320]
    img = (np.stack([xx % 256, yy % 256, (xx + yy) % 256], -1)
           + rng.integers(0, 16, (2348, 320, 3))
           ).clip(0, 255).astype(np.uint8)
    single = encode_lossy_streaming(img, LossyOptions(distance=1.0,
                                                      effort=3))

    port = _free_port()
    out_path = tmp_path / "mh_vardct.jxl"
    worker = os.path.join(os.path.dirname(__file__),
                          "_multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "PYTHONPATH")}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(p), "2", str(out_path),
         "vardct"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for p in range(2)]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o.decode(errors="replace")[-2000:]
    multi = out_path.read_bytes()
    assert multi == single
    dec = decode(multi)
    assert dec.shape == img.shape
    from libjxl_tpu.utils.oracle import oracle_available, oracle_decode
    if oracle_available():
        ref = oracle_decode(multi).pixels
        assert np.abs(ref.astype(int) - dec.astype(int)).max() <= 1


def test_two_process_dcn_decode_bit_identical(tmp_path):
    """Multi-host sharded DECODE (VERDICT r4 missing #2): contiguous
    group-row windows per process with halo-exact banded filtering
    (api/decoder.decode_rows gy_range), pixels gathered over DCN —
    bit-identical to the single-process decode."""
    from libjxl_tpu.api.decoder import decode
    from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy

    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:1200, 0:320]
    img = (np.stack([xx % 256, yy % 256, (xx + yy) % 256], -1)
           + rng.integers(0, 16, (1200, 320, 3))
           ).clip(0, 255).astype(np.uint8)
    data = encode_lossy(img, LossyOptions(distance=1.0, effort=5))
    single = decode(data)

    port = _free_port()
    out_path = tmp_path / "mh_dec.npy"
    (tmp_path / "mh_dec.npy.in").write_bytes(data)
    worker = os.path.join(os.path.dirname(__file__),
                          "_multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "PYTHONPATH")}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(p), "2", str(out_path),
         "decode"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for p in range(2)]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o.decode(errors="replace")[-2000:]
    multi = np.load(out_path)
    assert np.array_equal(multi, single)
