"""Restoration filters: Gaborish + EPF as whole-image vectorized ops
(reference ``lib/jxl/render_pipeline/stage_gaborish.cc``,
``stage_epf.cc``, ``lib/jxl/epf.cc``).

These are pure stencils; the numpy forms below translate 1:1 to jnp for
the TPU path (the group-border halo is handled by mirror padding over the
whole frame here; the sharded version exchanges halos instead)."""

from __future__ import annotations

import numpy as np

K_INV_SIGMA_NUM = -1.1715728752538099024
K_MIN_SIGMA = -3.90524291751269967465540850526868


def _mirror_pad(img: np.ndarray, n: int) -> np.ndarray:
    """Mirror padding (without repeating the edge sample twice would be
    'reflect'; JXL uses mirror-with-edge-duplication = 'symmetric')."""
    return np.pad(img, [(0, 0)] * (img.ndim - 2) + [(n, n), (n, n)],
                  mode="symmetric")


def gaborish(xyb: np.ndarray, lf) -> np.ndarray:
    """3x3 smoothing (stage_gaborish.cc:31-54). xyb: (3, H, W)."""
    weights = [
        (1.0, lf.gab_x_weight1, lf.gab_x_weight2),
        (1.0, lf.gab_y_weight1, lf.gab_y_weight2),
        (1.0, lf.gab_b_weight1, lf.gab_b_weight2),
    ]
    out = np.empty_like(xyb)
    for c in range(3):
        w0, w1, w2 = weights[c]
        div = w0 + 4 * (w1 + w2)
        w0, w1, w2 = w0 / div, w1 / div, w2 / div
        p = _mirror_pad(xyb[c], 1)
        out[c] = (w0 * p[1:-1, 1:-1] +
                  w1 * (p[:-2, 1:-1] + p[2:, 1:-1] +
                        p[1:-1, :-2] + p[1:-1, 2:]) +
                  w2 * (p[:-2, :-2] + p[:-2, 2:] +
                        p[2:, :-2] + p[2:, 2:]))
    return out


def compute_sigma(lf, acs_raw: np.ndarray, anchors: np.ndarray,
                  raw_quant: np.ndarray, epf_sharpness: np.ndarray,
                  quant_scale: float) -> np.ndarray:
    """Per-8x8-block 1/sigma (epf.cc:39-110). All inputs in block units.

    acs anchors propagate their quant value over covered blocks; callers
    pass raw_quant already propagated."""
    sigma_quant = lf.epf_quant_mul / (quant_scale * raw_quant *
                                      K_INV_SIGMA_NUM)
    lut = np.asarray(lf.epf_sharp_lut)
    sigma = sigma_quant * lut[epf_sharpness]
    sigma = np.minimum(sigma, -1e-4)
    return 1.0 / sigma


_PLUS = ((0, -1), (-1, 0), (0, 0), (1, 0), (0, 1))  # (dx, dy)
_NEIGHBORS1 = ((0, -1), (-1, 0), (1, 0), (0, 1))


def _shift(img: np.ndarray, dx: int, dy: int, pad: int) -> np.ndarray:
    """View of mirror-padded image shifted by (dx, dy)."""
    h, w = img.shape[-2] - 2 * pad, img.shape[-1] - 2 * pad
    return img[..., pad + dy:pad + dy + h, pad + dx:pad + dx + w]


def epf_step1(xyb: np.ndarray, inv_sigma_block: np.ndarray, lf) -> np.ndarray:
    """EPF pass 1 (3x3-plus kernel, 5x5 support; stage_epf.cc:197-380).

    xyb: (3, H, W); inv_sigma_block: (H/8, W/8) of 1/sigma."""
    c3, h, w = xyb.shape
    pad = 4
    p = _mirror_pad(xyb, pad)
    scales = np.asarray(lf.epf_channel_scale, dtype=np.float64)

    # SAD_d = sum_c scale_c sum_{o in plus} |I(x+d+o) - I(x+o)|
    sads = []
    for dx, dy in _NEIGHBORS1:
        sad = np.zeros((h, w))
        for ox, oy in _PLUS:
            for c in range(3):
                a = _shift(p[c], dx + ox, dy + oy, pad)
                b = _shift(p[c], ox, oy, pad)
                sad += scales[c] * np.abs(a - b)
        sads.append(sad)

    # per-pixel sad multiplier: 1.65, border rows/cols of each 8-block get
    # *epf_border_sad_mul
    sm = 1.65
    bsm = sm * lf.epf_border_sad_mul
    xmul = np.full(w, sm)
    xmul[0::8] = bsm
    xmul[7::8] = bsm
    ymul_border = np.zeros(h, dtype=bool)
    ymul_border[0::8] = True
    ymul_border[7::8] = True
    sad_mul = np.where(ymul_border[:, None], bsm, xmul[None, :])

    inv_sigma = np.repeat(np.repeat(inv_sigma_block, 8, 0), 8, 1)[:h, :w]
    skip = inv_sigma < K_MIN_SIGMA
    isig = inv_sigma * sad_mul

    wsum = np.ones((h, w))
    acc = xyb.astype(np.float64).copy()
    for (dx, dy), sad in zip(_NEIGHBORS1, sads):
        weight = np.maximum(1.0 + sad * isig, 0.0)
        wsum += weight
        for c in range(3):
            acc[c] += weight * _shift(p[c], dx, dy, pad)
    out = acc / wsum
    return np.where(skip[None, :, :], xyb, out).astype(xyb.dtype)


def epf_step2(xyb: np.ndarray, inv_sigma_block: np.ndarray, lf) -> np.ndarray:
    """EPF pass 2 (3x3 kernel with single-pixel SADs; stage_epf.cc EPF2)."""
    c3, h, w = xyb.shape
    pad = 2
    p = _mirror_pad(xyb, pad)
    scales = np.asarray(lf.epf_channel_scale, dtype=np.float64)
    sm = lf.epf_pass2_sigma_scale * 1.65
    bsm = sm * lf.epf_border_sad_mul
    xmul = np.full(w, sm)
    xmul[0::8] = bsm
    xmul[7::8] = bsm
    ymul_border = np.zeros(h, dtype=bool)
    ymul_border[0::8] = True
    ymul_border[7::8] = True
    sad_mul = np.where(ymul_border[:, None], bsm, xmul[None, :])
    inv_sigma = np.repeat(np.repeat(inv_sigma_block, 8, 0), 8, 1)[:h, :w]
    skip = inv_sigma < K_MIN_SIGMA
    isig = inv_sigma * sad_mul

    wsum = np.ones((h, w))
    acc = xyb.astype(np.float64).copy()
    for dx, dy in _NEIGHBORS1:
        sad = np.zeros((h, w))
        for c in range(3):
            sad += scales[c] * np.abs(_shift(p[c], dx, dy, pad) -
                                      _shift(p[c], 0, 0, pad))
        weight = np.maximum(1.0 + sad * isig * (1.0 / lf.epf_pass2_zeroflush)
                            * lf.epf_pass2_zeroflush, 0.0)
        wsum += weight
        for c in range(3):
            acc[c] += weight * _shift(p[c], dx, dy, pad)
    out = acc / wsum
    return np.where(skip[None, :, :], xyb, out).astype(xyb.dtype)


_NEIGHBORS0 = ((0, -2), (-1, -1), (0, -1), (1, -1), (-2, 0), (-1, 0),
               (1, 0), (2, 0), (-1, 1), (0, 1), (1, 1), (0, 2))  # (dx, dy)


def epf_step0(xyb: np.ndarray, inv_sigma_block: np.ndarray, lf) -> np.ndarray:
    """EPF pass 0 (5x5 diamond kernel with plus-shaped SADs;
    stage_epf.cc EPF0Stage). Runs before passes 1 and 2 when
    epf_iters == 3."""
    c3, h, w = xyb.shape
    pad = 4
    p = _mirror_pad(xyb, pad)
    scales = np.asarray(lf.epf_channel_scale, dtype=np.float64)

    sads = []
    for dx, dy in _NEIGHBORS0:
        sad = np.zeros((h, w))
        for ox, oy in _PLUS:
            for c in range(3):
                a = _shift(p[c], dx + ox, dy + oy, pad)
                b = _shift(p[c], ox, oy, pad)
                sad += scales[c] * np.abs(a - b)
        sads.append(sad)

    sm = lf.epf_pass0_sigma_scale * 1.65
    bsm = sm * lf.epf_border_sad_mul
    xmul = np.full(w, sm)
    xmul[0::8] = bsm
    xmul[7::8] = bsm
    ymul_border = np.zeros(h, dtype=bool)
    ymul_border[0::8] = True
    ymul_border[7::8] = True
    sad_mul = np.where(ymul_border[:, None], bsm, xmul[None, :])
    inv_sigma = np.repeat(np.repeat(inv_sigma_block, 8, 0), 8, 1)[:h, :w]
    skip = inv_sigma < K_MIN_SIGMA
    isig = inv_sigma * sad_mul

    wsum = np.ones((h, w))
    acc = xyb.astype(np.float64).copy()
    for (dx, dy), sad in zip(_NEIGHBORS0, sads):
        weight = np.maximum(1.0 + sad * isig, 0.0)
        wsum += weight
        for c in range(3):
            acc[c] += weight * _shift(p[c], dx, dy, pad)
    out = acc / wsum
    return np.where(skip[None, :, :], xyb, out).astype(xyb.dtype)


def gaborish_inverse(xyb: np.ndarray) -> np.ndarray:
    """Approximate inverse-gaborish sharpening applied by the encoder when
    the gaborish loop filter is on (enc_gaborish.cc:21-75): Symmetric5
    with the butteraugli-tuned kGaborish weights, normalized."""
    kg = (-0.09495815671340026, -0.041031725066768575,
          0.013710004822696948, 0.006510206083837737,
          -0.0014789063378272242)
    s = 1.0 + 4 * (kg[0] + kg[1] + kg[2] + kg[4] + 2 * kg[3])
    n = 1.0 / s
    # quadrant layout c r R / r d L / R L D (convolve.h WeightsSymmetric5)
    w_c, w_r, w_R = n, n * kg[0], n * kg[2]
    w_d, w_D, w_L = n * kg[1], n * kg[4], n * kg[3]
    out = np.empty_like(xyb)
    for c in range(3):
        p = _mirror_pad(xyb[c], 2)

        def sh(dy, dx):
            h, w = xyb[c].shape
            return p[2 + dy:2 + dy + h, 2 + dx:2 + dx + w]

        out[c] = (w_c * sh(0, 0) +
                  w_r * (sh(0, -1) + sh(0, 1) + sh(-1, 0) + sh(1, 0)) +
                  w_R * (sh(0, -2) + sh(0, 2) + sh(-2, 0) + sh(2, 0)) +
                  w_d * (sh(-1, -1) + sh(-1, 1) + sh(1, -1) + sh(1, 1)) +
                  w_D * (sh(-2, -2) + sh(-2, 2) + sh(2, -2) + sh(2, 2)) +
                  w_L * (sh(-1, -2) + sh(-2, -1) + sh(-2, 1) + sh(-1, 2) +
                         sh(1, -2) + sh(2, -1) + sh(2, 1) + sh(1, 2)))
    return out
