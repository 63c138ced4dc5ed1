"""Flagship TPU pipeline: Modular lossless encode, group-parallel.

The device computes everything pixel-shaped — RCT, prediction residuals,
hybrid-uint tokenization, per-group histograms — in one fused XLA program
over a ``(groups, channels, gd, gd)`` layout; the host only runs the
sequential rANS emission and byte assembly (SURVEY.md §7 design stance).

Multi-chip: shard the leading group axis with ``NamedSharding`` (see
``libjxl_tpu.parallel.mesh``); histograms reduce with a psum when a global
(shared-histogram) code is wanted.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from libjxl_tpu.ops.modular_ops import (
    fwd_ycocg, gradient_residuals, hybrid_uint_tokenize, image_to_groups,
    pack_signed, token_histogram,
)


@functools.partial(jax.jit, static_argnames=("use_rct",))
def encode_groups_device(groups: jnp.ndarray, mask: jnp.ndarray,
                         use_rct: bool = True):
    """Device side of lossless encode.

    groups: (G, C, gd, gd) int32; mask: (G, 1, gd, gd) bool.
    Returns (tokens, nbits, bits, histogram):
      tokens/nbits/bits: (G, C, gd, gd) int32/uint32 residual codes
      histogram: (256,) int32 global token histogram (masked).
    """
    if use_rct and groups.shape[1] >= 3:
        rgb = groups[:, :3]
        rest = groups[:, 3:]
        groups = jnp.concatenate([fwd_ycocg(rgb), rest], axis=1)
    res = gradient_residuals(groups)
    packed = pack_signed(res)
    token, nbits, bits = hybrid_uint_tokenize(packed)
    hist = token_histogram(token, jnp.broadcast_to(mask, token.shape))
    return token, nbits, bits, hist


def encode_image_device(img: np.ndarray, group_dim: int = 256,
                        use_rct: bool = True):
    """Host wrapper: (H, W, C) -> per-group token arrays + histogram."""
    arr = jnp.asarray(np.moveaxis(img.astype(np.int32), -1, 0))
    groups, mask = image_to_groups(arr, group_dim)
    token, nbits, bits, hist = encode_groups_device(groups, mask,
                                                    use_rct=use_rct)
    return (np.asarray(token), np.asarray(nbits), np.asarray(bits),
            np.asarray(mask), np.asarray(hist))
