"""Subprocess worker for the multi-host (DCN) encode test: one JAX
process in a 2-process Gloo cluster, encoding its share of DC-group
bands (usage: _multihost_worker.py <port> <pid> <nproc> <out_path>
[vardct])."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
port, pid, nproc, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                              int(sys.argv[3]), sys.argv[4])

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                           process_id=pid)

import numpy as np  # noqa: E402

from libjxl_tpu.api.encoder import EncodeOptions  # noqa: E402
from libjxl_tpu.parallel.multihost import (  # noqa: E402
    encode_lossless_multihost,
)

mode = sys.argv[5] if len(sys.argv) > 5 else "lossless"
rng = np.random.default_rng(11)
if mode == "decode":
    # sharded multi-host DECODE: the stream to decode is read from
    # out_path + ".in"; the gathered pixels land in out_path as .npy
    from libjxl_tpu.parallel.multihost import decode_multihost
    data = open(out_path + ".in", "rb").read()
    out = decode_multihost(data)
    if pid == 0:
        np.save(out_path, out)
    print(f"proc {pid} done", flush=True)
    sys.exit(0)
if mode == "vardct":
    from libjxl_tpu.parallel.multihost import (
        encode_lossy_multihost,
    )
    from libjxl_tpu.vardct.frame_enc import LossyOptions
    yy, xx = np.mgrid[0:2048 + 300, 0:320]
    img = (np.stack([xx % 256, yy % 256, (xx + yy) % 256], -1)
           + rng.integers(0, 16, (2348, 320, 3))
           ).clip(0, 255).astype(np.uint8)
    out = encode_lossy_multihost(img, LossyOptions(distance=1.0,
                                                   effort=3))
else:
    img = np.clip(np.cumsum(rng.integers(-2, 3, (2048 + 300, 320, 3)),
                            axis=1), 0, 255).astype(np.uint8)
    opts = EncodeOptions(effort=2, group_size_shift=0)
    out = encode_lossless_multihost(img, opts)
if pid == 0:
    with open(out_path, "wb") as f:
        f.write(out)
print(f"proc {pid} done", flush=True)
