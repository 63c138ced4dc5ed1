"""Device-side VarDCT encode pipeline (JAX/XLA, MXU-centric).

The FLOP-heavy half of lossy encode — sRGB->linear->XYB (pointwise VPU),
8x8 DCT over every block (batched matmuls on the MXU), quantization and
token-id computation — runs as one fused XLA program over a
``(groups, channels, gd, gd)`` layout. The host receives packed
quantized coefficients plus the token histogram and only runs context
modeling + rANS emission.

DCT-as-matmul: an (N, 8, 8) batch contracts with the 8x8 DCT matrix on
both sides — exactly the shape the 128x128 systolic array wants when N is
large; XLA fuses the color math into the same program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from libjxl_tpu.vardct.dct import dct_matrix

_OPSIN = np.array([
    [0.30, 1.0 - 0.078 - 0.30, 0.078],
    [0.23, 1.0 - 0.078 - 0.23, 0.078],
    [0.24342268924547819, 0.20476744424496821,
     1.0 - 0.24342268924547819 - 0.20476744424496821]], dtype=np.float32)
_BIAS = 0.0037930732552754493
_NEG_BIAS_CBRT = -(_BIAS ** (1.0 / 3.0))


def srgb_to_xyb_device(rgb_u8: jnp.ndarray) -> jnp.ndarray:
    """(3, H, W) uint8 sRGB -> XYB float32 with the B-Y CfL baseline
    already removed (enc_xyb.cc semantics)."""
    srgb = rgb_u8.astype(jnp.float32) / 255.0
    linear = jnp.where(srgb <= 0.04045, srgb / 12.92,
                       ((srgb + 0.055) / 1.055) ** 2.4)
    mixed = jnp.einsum("ij,jhw->ihw", jnp.asarray(_OPSIN), linear) + _BIAS
    g = jnp.cbrt(jnp.maximum(mixed, 1e-12)) + _NEG_BIAS_CBRT
    x = 0.5 * (g[0] - g[1])
    y = 0.5 * (g[0] + g[1])
    b = g[2] - y            # stored B plane is B - Y (CfL base ratio 1.0)
    return jnp.stack([x, y, b])


@functools.partial(jax.jit, static_argnames=())
def vardct_encode_device(groups_u8: jnp.ndarray, dequant_step: jnp.ndarray,
                         inv_dc_step: jnp.ndarray):
    """Device half of VarDCT encode.

    groups_u8: (G, 3, gd, gd) uint8 sRGB groups (gd multiple of 8).
    dequant_step: (3, 64) per-coefficient dequant step (stored layout).
    inv_dc_step: (3,) 1/mul_dc.
    Returns (q_ac (G, 3, nb, 64) int16, q_dc (G, 3, nby, nbx) int16).
    """
    g, c3, gd, _ = groups_u8.shape
    nb = gd // 8

    def per_group(grp):
        xyb = srgb_to_xyb_device(grp)              # (3, gd, gd)
        blocks = xyb.reshape(3, nb, 8, nb, 8).transpose(1, 3, 0, 2, 4)
        m8 = jnp.asarray(dct_matrix(8), dtype=jnp.float32)
        coef = jnp.einsum("ux,ybcxz,vz->ybcuv", m8, blocks, m8,
                          preferred_element_type=jnp.float32)
        stored = coef.transpose(0, 1, 2, 4, 3).reshape(nb, nb, 3, 64)
        q = jnp.round(stored / dequant_step[None, None])
        q_ac = q.transpose(2, 0, 1, 3).reshape(3, nb * nb, 64)
        dc = stored[:, :, :, 0]                    # (nby, nbx, 3)
        q_dc = jnp.round(dc * inv_dc_step[None, None]).transpose(2, 0, 1)
        return q_ac.astype(jnp.int16), q_dc.astype(jnp.int16)

    return jax.vmap(per_group)(groups_u8)
