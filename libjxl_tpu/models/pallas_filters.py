"""Pallas TPU kernels for the restoration filters (SURVEY §7's
EPF/Gaborish stencil kernels; reference stages
``render_pipeline/stage_gaborish.cc:31-54`` and ``stage_epf.cc``).

STATUS (round 5, measured on TPU v5e — `bench_pallas.py`,
`profiling/_bench_pallas_r5d.out`): the XLA lowering WINS —
173 MP/s vs 13 MP/s for gab+EPF2 at 2048x2048. The hand-written
stencil pays for element-granular halo windows: every tap slices the
VMEM window at lane-unaligned x-offsets (PX±1..3), which Mosaic
lowers to per-row shift/copy sequences, while XLA's fused pad+shift
graph keeps all adds lane-aligned. `config.pallas_filters` therefore
stays False and the production decode path uses
``render/filters_jax``; this module remains as working (lowering-
clean, output-validated) kernel infrastructure for a future Mosaic
version with cheap unaligned vector loads.

Bit-compatibility: the math mirrors ``render/filters.py`` op for op
(same weights, same clamp/skip semantics); float32 summation order
differs, so outputs may differ in the last ulp — decode paths quantize
to integers afterwards.
"""

from __future__ import annotations

import functools

import numpy as np

try:  # pallas needs a real TPU lowering; guard for CPU test runs
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:  # noqa: BLE001
    _HAVE_PALLAS = False

K_MIN_SIGMA = -3.90524291751269967465540850526098

_PLUS = ((0, -1), (-1, 0), (0, 0), (1, 0), (0, 1))          # (dx, dy)
_NEIGHBORS1 = ((0, -1), (-1, 0), (1, 0), (0, 1))
_NEIGHBORS0 = ((0, -2), (-1, -1), (0, -1), (1, -1), (-2, 0), (-1, 0),
               (1, 0), (2, 0), (-1, 1), (0, 1), (1, 1), (0, 2))

TILE_H = 256
TILE_W = 256
# Mosaic requires the last two block dims divisible by (8, 128) — halo'd
# windows are padded per side to these fixed amounts (>= any stencil
# reach p<=3); only the inner p rows/cols hold mirror content, the rest
# is don't-care fill the kernels never tap
PY = 4
PX = 64


def available() -> bool:
    if not _HAVE_PALLAS:
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # noqa: BLE001
        return False


def _border_mask(th: int, tw: int):
    """(th, tw) bool: rows/cols on an 8-px block border (tile origins
    are multiples of 8, so tile-local coordinates match image ones)."""
    iy = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0) % 8
    ix = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) % 8
    return (iy == 0) | (iy == 7) | (ix == 0) | (ix == 7)


def _gab_kernel(xw_ref, out_ref, *, w0, w1, w2, p):
    th, tw = out_ref.shape[1], out_ref.shape[2]
    x = xw_ref[:]
    for c in range(3):           # per-channel weights as baked scalars
        def sh(dy, dx, c=c):
            return x[c, PY + dy:PY + dy + th, PX + dx:PX + dx + tw]

        out_ref[c] = (
            w0[c] * sh(0, 0) +
            w1[c] * (sh(-1, 0) + sh(1, 0) + sh(0, -1) + sh(0, 1)) +
            w2[c] * (sh(-1, -1) + sh(-1, 1) + sh(1, -1) + sh(1, 1)))


def _epf_kernel(xw_ref, sig_ref, out_ref, *, scales, sm, bsm, plus_sad,
                p, neighbors=_NEIGHBORS1):
    """One EPF pass over a (tile + halo) window (stage_epf.cc EPF1/2)."""
    th, tw = out_ref.shape[1], out_ref.shape[2]
    x = xw_ref[:]

    def sh(dx, dy):
        return x[:, PY + dy:PY + dy + th, PX + dx:PX + dx + tw]

    center = sh(0, 0)
    inv_sigma = sig_ref[:]
    border = _border_mask(th, tw)
    sad_mul = jnp.where(border, jnp.float32(bsm), jnp.float32(sm))
    isig = inv_sigma * sad_mul

    def scaled_absdiff(a, b):
        return (scales[0] * jnp.abs(a[0] - b[0]) +
                scales[1] * jnp.abs(a[1] - b[1]) +
                scales[2] * jnp.abs(a[2] - b[2]))

    wsum = jnp.ones((th, tw), jnp.float32)
    acc = center
    for dx, dy in neighbors:
        if plus_sad:
            sad = jnp.zeros((th, tw), jnp.float32)
            for ox, oy in _PLUS:
                sad = sad + scaled_absdiff(sh(dx + ox, dy + oy),
                                           sh(ox, oy))
        else:
            sad = scaled_absdiff(sh(dx, dy), center)
        weight = jnp.maximum(1.0 + sad * isig, 0.0)
        wsum = wsum + weight
        acc = acc + weight[None] * sh(dx, dy)
    out = acc / wsum
    skip = inv_sigma < K_MIN_SIGMA
    out_ref[:] = jnp.where(skip[None], center, out)


def _tiled_call(kernel, xpad, extra, out_hw, p: int):
    """Grid a stencil kernel over (TILE_H, TILE_W) output tiles; xpad is
    the mirror+tile-padded input, ``extra`` an optional (H, W)-padded
    per-pixel plane windowed without halo."""
    h, w = out_hw
    nty, ntx = pl.cdiv(h, TILE_H), pl.cdiv(w, TILE_W)
    # overlapping (tile + halo) windows: pl.Element dims take ELEMENT
    # offsets in the index map, unlike the default block indexing
    in_specs = [pl.BlockSpec(
        (pl.Element(3), pl.Element(TILE_H + 2 * PY),
         pl.Element(TILE_W + 2 * PX)),
        lambda i, j: (0, i * TILE_H, j * TILE_W),
        memory_space=pltpu.VMEM)]
    args = [xpad]
    if extra is not None:
        in_specs.append(pl.BlockSpec(
            (TILE_H, TILE_W), lambda i, j: (i, j),
            memory_space=pltpu.VMEM))
        args.append(extra)
    out = pl.pallas_call(
        kernel,
        grid=(nty, ntx),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (3, TILE_H, TILE_W), lambda i, j: (0, i, j),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (3, nty * TILE_H, ntx * TILE_W), jnp.float32),
    )(*args)
    return out[:, :h, :w]


def _pad_tiles(x, h, w, p: int):
    """Mirror-pad by the stencil reach p (the only rows/cols whose
    content matters), then place the image origin at (PY, PX) and
    edge-fill out to the tile grid + aligned halo: window (i, j) of
    size (T_H+2*PY, T_W+2*PX) at offset (i*T_H, j*T_W) stays in
    bounds and its taps only ever reach the mirrored p-band."""
    nty, ntx = pl.cdiv(h, TILE_H), pl.cdiv(w, TILE_W)
    ph = nty * TILE_H + 2 * PY
    pw = ntx * TILE_W + 2 * PX
    x = jnp.pad(x, ((0, 0), (p, p), (p, p)), mode="symmetric")
    return jnp.pad(
        x, ((0, 0), (PY - p, ph - (h + 2 * p) - (PY - p)),
            (PX - p, pw - (w + 2 * p) - (PX - p))),
        mode="edge")


def _pad_plane_tiles(s, h, w):
    nty, ntx = pl.cdiv(h, TILE_H), pl.cdiv(w, TILE_W)
    return jnp.pad(s, ((0, nty * TILE_H - h), (0, ntx * TILE_W - w)),
                   mode="edge")


def static_lf_params(lf) -> tuple:
    """Hashable LoopFilter parameters (the kernels bake them in as
    compile-time constants; defaults dominate, so the jit cache stays
    warm)."""
    return (float(lf.gab_x_weight1), float(lf.gab_x_weight2),
            float(lf.gab_y_weight1), float(lf.gab_y_weight2),
            float(lf.gab_b_weight1), float(lf.gab_b_weight2),
            tuple(float(v) for v in lf.epf_channel_scale),
            float(lf.epf_border_sad_mul),
            float(lf.epf_pass2_sigma_scale),
            float(lf.epf_pass0_sigma_scale))


@functools.partial(jax.jit if _HAVE_PALLAS else (lambda f, **k: f),
                   static_argnames=("params", "gab", "epf_iters"))
def restore_pallas(xyb, inv_sigma_pix, params: tuple, gab: bool,
                   epf_iters: int):
    """gaborish + EPF chain with one Pallas stencil kernel per pass.

    xyb: (3, H, W) f32. inv_sigma_pix: (H, W) per-pixel 1/sigma
    (upsampled from the block field). params: static_lf_params(lf).
    All three EPF passes are supported (EPF0 5x5 diamond included)."""
    (gx1, gx2, gy1, gy2, gb1, gb2, scales, bsm_mul, p2s, p0s) = params
    _, h, w = xyb.shape
    x = jnp.asarray(xyb, jnp.float32)
    if gab:
        w1 = np.array([gx1, gy1, gb1])
        w2 = np.array([gx2, gy2, gb2])
        div = 1.0 + 4.0 * (w1 + w2)
        kern = functools.partial(
            _gab_kernel, w0=tuple(1.0 / div), w1=tuple(w1 / div),
            w2=tuple(w2 / div), p=1)
        x = _tiled_call(kern, _pad_tiles(x, h, w, 1), None, (h, w), 1)
    if epf_iters > 0:
        sig = _pad_plane_tiles(jnp.asarray(inv_sigma_pix, jnp.float32),
                               h, w)
        if epf_iters >= 3:
            # EPF0: 5x5 diamond with plus-shaped SADs (stage_epf.cc
            # EPF0Stage); stencil reach 2 + plus offset 1 -> halo 3
            kern = functools.partial(
                _epf_kernel, scales=scales, sm=1.65 * p0s,
                bsm=1.65 * p0s * bsm_mul, plus_sad=True, p=3,
                neighbors=_NEIGHBORS0)
            x = _tiled_call(kern, _pad_tiles(x, h, w, 3), sig, (h, w), 3)
        kern = functools.partial(
            _epf_kernel, scales=scales, sm=1.65, bsm=1.65 * bsm_mul,
            plus_sad=True, p=2)
        x = _tiled_call(kern, _pad_tiles(x, h, w, 2), sig, (h, w), 2)
        if epf_iters >= 2:
            kern = functools.partial(
                _epf_kernel, scales=scales, sm=1.65 * p2s,
                bsm=1.65 * p2s * bsm_mul, plus_sad=False, p=1)
            x = _tiled_call(kern, _pad_tiles(x, h, w, 1), sig, (h, w), 1)
    return x
