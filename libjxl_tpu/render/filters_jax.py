"""TPU/XLA restoration-filter pipeline: Gaborish + EPF as one jitted
program (the device render path; same math as ``render/filters.py``
via its ``xp`` parameter — reference ``stage_gaborish.cc``,
``stage_epf.cc``).

The loop-filter parameters travel as a pytree of scalars/arrays so one
compiled program serves every stream of a given shape."""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

from libjxl_tpu.render import filters as F


class LfParams(NamedTuple):
    """Traced loop-filter constants (frame_header.h LoopFilter)."""

    gab_x_weight1: object
    gab_x_weight2: object
    gab_y_weight1: object
    gab_y_weight2: object
    gab_b_weight1: object
    gab_b_weight2: object
    epf_quant_mul: object
    epf_sharp_lut: object
    epf_channel_scale: object
    epf_border_sad_mul: object
    epf_pass0_sigma_scale: object
    epf_pass2_sigma_scale: object


def lf_params(lf) -> LfParams:
    import jax.numpy as jnp

    f = jnp.float32
    return LfParams(
        f(lf.gab_x_weight1), f(lf.gab_x_weight2),
        f(lf.gab_y_weight1), f(lf.gab_y_weight2),
        f(lf.gab_b_weight1), f(lf.gab_b_weight2),
        f(lf.epf_quant_mul),
        jnp.asarray(lf.epf_sharp_lut, jnp.float32),
        jnp.asarray(lf.epf_channel_scale, jnp.float32),
        f(lf.epf_border_sad_mul),
        f(lf.epf_pass0_sigma_scale), f(lf.epf_pass2_sigma_scale),
    )


@functools.partial(
    __import__("jax").jit,
    static_argnames=("gab", "epf_iters"))
def _restore(xyb, raw_quant, epf_sharpness, quant_scale, lfp: LfParams,
             gab: bool, epf_iters: int):
    import jax.numpy as jnp

    if gab:
        xyb = F.gaborish(xyb, lfp, xp=jnp)
    if epf_iters > 0:
        inv_sigma = F.compute_sigma(lfp, None, None, raw_quant,
                                    epf_sharpness, quant_scale, xp=jnp)
        if epf_iters >= 3:
            xyb = F.epf_step0(xyb, inv_sigma, lfp, xp=jnp)
        xyb = F.epf_step1(xyb, inv_sigma, lfp, xp=jnp)
        if epf_iters >= 2:
            xyb = F.epf_step2(xyb, inv_sigma, lfp, xp=jnp)
    return xyb


def restore_device(xyb: np.ndarray, lf, raw_quant, epf_sharpness,
                   quant_scale: float) -> np.ndarray:
    """Run gaborish+EPF as one XLA program; returns numpy."""
    import jax.numpy as jnp

    out = _restore(jnp.asarray(xyb, jnp.float32),
                   jnp.asarray(raw_quant), jnp.asarray(epf_sharpness),
                   jnp.float32(quant_scale), lf_params(lf),
                   bool(lf.gab), int(lf.epf_iters))
    return np.asarray(out).astype(xyb.dtype)
