"""Global runtime configuration for libjxl_tpu.

Mirrors the reference's layered flag system (enc_params.h /
JxlDecoder setters) for knobs that cut across the whole pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class RuntimeConfig:
    # Run decode-side restoration filters (gaborish/EPF) as one XLA
    # program instead of host numpy. Pays a per-shape compile on first
    # use; wins on repeated shapes and on the TPU render path.
    device_filters: bool = False
    # Shard the group axis of device encode passes over all visible
    # devices (jax.sharding mesh; groups are THE parallel axis of JPEG
    # XL, SURVEY.md 2.2). Histograms become cross-shard reductions; the
    # emitted bitstream is identical to the single-device one.
    shard_encode: bool = False
    # Use the Pallas tile kernels for the EPF/gaborish stencils inside
    # restore_device (models/pallas_filters.py): one HBM read+write per
    # pass vs XLA's per-shifted-view temporaries.
    pallas_filters: bool = False


config = RuntimeConfig()
