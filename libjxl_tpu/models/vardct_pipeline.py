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


_K_BIASES = (1.0 - 0.05465007330715401, 1.0 - 0.07005449891748593,
             1.0 - 0.049935103337343655, 0.145)
_COLOR_SCALE = 1.0 / 84.0


def _adjust_quant_bias(q, c: int):
    """quantizer-inl.h:35-60 on device: 0->0, ±1->±bias_c, else
    q - bias3/q."""
    absq = jnp.abs(q)
    out = q - _K_BIASES[3] / jnp.where(q == 0, 1.0, q)
    out = jnp.where(absq < 0.5, 0.0, out)
    return jnp.where((absq > 0.5) & (absq < 1.5),
                     jnp.sign(q) * _K_BIASES[c], out)


def _frame_body(pixels_u8, qac, inv_qac, table, thres_y, thres_xb,
                mul_dc, h: int, w: int, yb: int, xb: int,
                x_qm_mul: float):
    """Shared per-(row-band) VarDCT encode math: sRGB->XYB, MXU-batched
    8x8 DCT, dead-zone quantization with Y roundtrip, per-64x64-tile
    chroma-from-luma least squares, DC quantization (enc_xyb.cc,
    enc_group.cc:329-520, enc_chroma_from_luma.cc). Everything is
    block/tile-local, so the same body runs whole-frame (single device)
    or per row shard under shard_map with NO collectives.

    Returns (q_ac (yb, xb, 3, 64) i32, q_dc (yb, xb, 3) i32,
    ytox (ty, tx) i32, ytob (ty, tx) i32)."""
    hp = jax.lax.Precision.HIGHEST
    srgb = jnp.moveaxis(pixels_u8.astype(jnp.float32), -1, 0) / 255.0
    linear = jnp.where(srgb <= 0.04045, srgb / 12.92,
                       ((srgb + 0.055) / 1.055) ** 2.4)
    mixed = jnp.einsum("ij,jhw->ihw",
                       jnp.asarray(_OPSIN, jnp.float32), linear,
                       precision=hp) + _BIAS
    g = jnp.cbrt(jnp.maximum(mixed, 1e-12)) + _NEG_BIAS_CBRT
    xyb = jnp.stack([0.5 * (g[0] - g[1]), 0.5 * (g[0] + g[1]), g[2]])
    xyb = jnp.pad(xyb, ((0, 0), (0, yb * 8 - h), (0, xb * 8 - w)),
                  mode="edge")
    blocks = xyb.reshape(3, yb, 8, xb, 8).transpose(1, 3, 0, 2, 4)
    m8 = jnp.asarray(dct_matrix(8), jnp.float32)
    coef = jnp.einsum("ux,ybcxz,vz->ybcuv", m8, blocks, m8, precision=hp)
    stored = coef.transpose(0, 1, 2, 4, 3).reshape(yb, xb, 3, 64)

    inv_table = 1.0 / table                              # (3, 64)

    def quantize(c, coefs, qm_mul, thres):
        val = coefs * (inv_table[c][None, None] *
                       (qac[:, :, None] * qm_mul))
        return jnp.where(jnp.abs(val) >= thres[None, None],
                         jnp.round(val), 0.0)

    q_y = quantize(1, stored[:, :, 1], 1.0, thres_y)
    y_rt = _adjust_quant_bias(q_y, 1) * \
        (table[1][None, None] * inv_qac[:, :, None])

    # ---- CfL per-64x64-tile least squares (zero-pad tiles: zeros do
    # not move the dot products) ------------------------------------
    ty_n = -(-yb // 8)
    tx_n = -(-xb // 8)
    pad_y, pad_x = ty_n * 8 - yb, tx_n * 8 - xb
    def tiled(a):                                        # (yb, xb, 63)
        a = jnp.pad(a, ((0, pad_y), (0, pad_x), (0, 0)))
        return a.reshape(ty_n, 8, tx_n, 8, 63)
    yt = tiled(y_rt[:, :, 1:])
    xt = tiled(stored[:, :, 0, 1:])
    bt = tiled(stored[:, :, 2, 1:])
    denom = jnp.einsum("tyxzk,tyxzk->tx", yt, yt, precision=hp)
    dx = jnp.einsum("tyxzk,tyxzk->tx", xt, yt, precision=hp)
    db = jnp.einsum("tyxzk,tyxzk->tx", bt, yt, precision=hp)
    safe = jnp.maximum(denom, 1e-9)
    ytox = jnp.where(denom < 1e-9, 0.0,
                     jnp.clip(jnp.round(dx / safe / _COLOR_SCALE),
                              -128, 127))
    ytob = jnp.where(denom < 1e-9, 0.0,
                     jnp.clip(jnp.round((db / safe - 1.0) / _COLOR_SCALE),
                              -128, 127))
    fx_full = jnp.repeat(jnp.repeat(ytox, 8, 0), 8, 1)[:yb, :xb] * \
        _COLOR_SCALE
    fb_full = 1.0 + jnp.repeat(jnp.repeat(ytob, 8, 0), 8, 1)[:yb, :xb] * \
        _COLOR_SCALE
    x_res = stored[:, :, 0] - fx_full[:, :, None] * y_rt
    b_res = stored[:, :, 2] - fb_full[:, :, None] * y_rt
    q_x = quantize(0, x_res, x_qm_mul, thres_xb)
    q_b = quantize(2, b_res, 1.0, thres_xb)
    q_ac = jnp.stack([q_x, q_y, q_b], axis=2)
    # DC slot never feeds the AC tokenizer (order[1:]); zero it so the
    # int8 link format below almost never escapes
    q_ac = q_ac * (jnp.arange(64) != 0)
    q_ac = jnp.clip(q_ac, -32768, 32767).astype(jnp.int32)
    # ---- DC (decoder adds cfl_dc_factor 1.0 * dequantized Y to B) --
    q_dc_y = jnp.round(stored[:, :, 1, 0] / mul_dc[1])
    dcy_deq = q_dc_y * mul_dc[1]
    q_dc_x = jnp.round(stored[:, :, 0, 0] / mul_dc[0])
    q_dc_b = jnp.round((stored[:, :, 2, 0] - dcy_deq) / mul_dc[2])
    q_dc = jnp.stack([q_dc_x, q_dc_y, q_dc_b], -1).astype(jnp.int32)
    return q_ac, q_dc, ytox.astype(jnp.int32), ytob.astype(jnp.int32)


def _frame_full(pixels_u8, qac, inv_qac, table, thres_y, thres_xb,
                mul_dc, h: int, w: int, yb: int, xb: int,
                x_qm_mul: float):
    """_frame_body + single-payload packing (shared by the one-image
    and batched entry points)."""
    q_ac, q_dc, ytox, ytob = _frame_body(
        pixels_u8, qac, inv_qac, table, thres_y, thres_xb, mul_dc,
        h, w, yb, xb, x_qm_mul)

    # single d2h payload: every fetch over the link pays ~25-45 ms
    # fixed latency, so ship ONE uint8 buffer, not seven arrays
    def as_bytes(a):
        a32 = a.astype(jnp.int32).reshape(-1)
        return jax.lax.bitcast_convert_type(a32, jnp.uint8).reshape(-1)

    # link format: per-(block, channel) nonzero COUNTS (u8) + one u16
    # per nonzero (in-block position << 10 | zigzag value) — the flat
    # index is recoverable from the counts, so this is ~2.5x less wire
    # than (i32 idx, i16 val) pairs. Values outside [-512, 511] (or a
    # count overflowing the cap) flip the dense fallback, which stays
    # in HBM unless needed
    flat = q_ac.reshape(-1)
    nzmask = flat != 0
    cap = _nnz_cap(yb, xb)
    nz_idx = jnp.nonzero(nzmask, size=cap, fill_value=-1)[0]
    nz_val = jnp.where(nz_idx >= 0, flat[jnp.maximum(nz_idx, 0)], 0)
    zig = jnp.where(nz_val >= 0, nz_val * 2, -nz_val * 2 - 1)
    n_nz = jnp.sum(nzmask).astype(jnp.int32)
    overflow = (jnp.max(zig) > 1023) | (n_nz > cap)
    n_signal = jnp.where(overflow, jnp.int32(cap + 1), n_nz)
    u16 = (((nz_idx & 63) << 10) |
           jnp.minimum(zig, 1023)).astype(jnp.uint16)
    counts = jnp.sum(nzmask.reshape(-1, 64), axis=1).astype(jnp.uint8)
    packed = jnp.concatenate([
        as_bytes(n_signal.reshape(1)), as_bytes(q_dc),
        as_bytes(ytox), as_bytes(ytob), counts,
        jax.lax.bitcast_convert_type(u16, jnp.uint8).reshape(-1)])
    dense16 = jnp.clip(q_ac, -32768, 32767).reshape(-1).astype(jnp.int16)
    return packed, dense16


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "yb", "xb", "x_qm_mul"))
def encode_lossy_frame_device(pixels_u8, qac, inv_qac, table, thres_y,
                              thres_xb, mul_dc, h: int, w: int, yb: int,
                              xb: int, x_qm_mul: float):
    """Full e<=4 VarDCT encode compute as ONE fused XLA program
    (see _frame_body). The host receives only the small integer
    outputs (quantized AC/DC and the CfL maps) packed into a single
    sparse payload, and runs context modeling + entropy coding.

    pixels_u8: (h, w, 3) uint8 sRGB.  qac/inv_qac: (yb, xb) f32 AC
    quant/dequant steps. table: (3, 64) dequant weights (stored
    layout); thres_*: (64,) dead-zone thresholds. mul_dc: (3,) DC
    steps."""
    return _frame_full(pixels_u8, qac, inv_qac, table, thres_y,
                       thres_xb, mul_dc, h, w, yb, xb, x_qm_mul)


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "yb", "xb", "x_qm_mul"))
def encode_lossy_frame_device_batch(pixels_u8_b, qac, inv_qac, table,
                                    thres_y, thres_xb, mul_dc, h: int,
                                    w: int, yb: int, xb: int,
                                    x_qm_mul: float):
    """Batched e<=4 VarDCT encode: ONE dispatch + ONE payload fetch for
    a whole same-shape image batch (serving path). Per-image dispatch
    costs ~60 ms of relay round-trips on the dev link; vmapping the
    fused program amortizes that to one h2d + one d2h per batch.

    pixels_u8_b: (B, h, w, 3) uint8. qac/inv_qac are shared across the
    batch (the e<=4 quant field is constant). Returns
    (packed (B, L) u8, dense16 (B, N) i16)."""
    def one(px):
        return _frame_full(px, qac, inv_qac, table, thres_y, thres_xb,
                           mul_dc, h, w, yb, xb, x_qm_mul)
    return jax.vmap(one)(pixels_u8_b)


def encode_lossy_frame_device_sharded(pixels: np.ndarray,
                                      qac: np.ndarray,
                                      inv_qac: np.ndarray,
                                      table, thres_y, thres_xb, mul_dc,
                                      h: int, w: int, yb: int, xb: int,
                                      x_qm_mul: float, mesh=None,
                                      hlo_out: list | None = None):
    """Multi-chip VarDCT encode: the SAME _frame_body math shard_mapped
    over row bands of a device mesh (the production analog of the
    reference's per-group RunOnPool loop, enc_frame.cc:1232).

    Every step is block/tile-local, so bands need zero collectives;
    bands are 64-pixel (one CfL tile row) aligned, and the outputs are
    bit-identical to the single-device program. Returns numpy
    (q_ac (yb, xb, 3, 64) i32, q_dc (yb, xb, 3) i32, ytox, ytob)."""
    import jax
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    if mesh is None:
        mesh = Mesh(np.array(jax.devices()), ("rows",))
    n = int(mesh.devices.size)
    axis = mesh.axis_names[0]

    # pad: real image -> block grid (edge, same as the fused program),
    # then BLACK to a whole number of 64px bands per shard — XYB(black)
    # is exactly 0 (opsin bias construction), so padded blocks add
    # zeros to the CfL tile dot products, matching the single-device
    # program's zero-padded partial tiles bit for bit
    band = 64 * n
    hp_ = ((yb * 8 + band - 1) // band) * band
    yb_p = hp_ // 8
    px = np.pad(pixels[:, :, :3],
                ((0, yb * 8 - h), (0, xb * 8 - w), (0, 0)), mode="edge")
    px = np.pad(px, ((0, hp_ - yb * 8), (0, 0), (0, 0)))
    qac_p = np.ones((yb_p, xb), np.float32)
    qac_p[:yb, :] = qac
    iq_p = np.ones((yb_p, xb), np.float32)
    iq_p[:yb, :] = inv_qac
    ys = hp_ // n
    ybs = yb_p // n

    def body(px_s, qac_s, iq_s, table, thres_y, thres_xb, mul_dc):
        return _frame_body(px_s, qac_s, iq_s, table, thres_y, thres_xb,
                           mul_dc, ys, xb * 8, ybs, xb, x_qm_mul)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None), P(axis, None),
                  P(None, None), P(None), P(None), P(None)),
        out_specs=(P(axis, None, None, None), P(axis, None, None),
                   P(axis, None), P(axis, None)))
    jfn = jax.jit(fn)
    jargs = (jnp.asarray(px), jnp.asarray(qac_p), jnp.asarray(iq_p),
             jnp.asarray(table, jnp.float32), jnp.asarray(thres_y),
             jnp.asarray(thres_xb), jnp.asarray(mul_dc, jnp.float32))
    if hlo_out is not None:
        # collective audit: the band schedule is block/tile-local by
        # construction — expose the compiled HLO so callers can verify
        # zero cross-device collectives (the structural basis of the
        # >=85% multi-host scaling claim)
        hlo_out.append(jfn.lower(*jargs).compile().as_text())
    q_ac, q_dc, ytox, ytob = jfn(*jargs)
    ty_n, tx_n = -(-yb // 8), -(-xb // 8)
    return (np.asarray(q_ac)[:yb], np.asarray(q_dc)[:yb],
            np.asarray(ytox)[:ty_n, :tx_n],
            np.asarray(ytob)[:ty_n, :tx_n])


def _nnz_cap(yb: int, xb: int) -> int:
    """Sparse-payload capacity: ~3 nonzero AC coefficients per block
    covers normal-distance content with slack (measured ~1/block at
    d1.0); overflow falls back to fetching the dense int16 plane."""
    return max(16384, yb * xb * 3)


def unpack_lossy_outputs(packed, dense16, yb: int, xb: int, ty_n: int,
                         tx_n: int):
    """Split the single-payload device result into
    (q_ac (yb, xb, 3, 64) i32, q_dc (yb, xb, 3) i32, ytox, ytob).
    ``dense16`` (a device array) is only fetched when the sparse run
    overflowed its capacity."""
    buf = np.asarray(packed)
    nq = yb * xb * 3 * 64
    nbc = yb * xb * 3
    cap = _nnz_cap(yb, xb)
    off = 0
    n_nz = int(buf[off:off + 4].view(np.int32)[0])
    off += 4
    q_dc = buf[off:off + 4 * nbc].view(np.int32) \
        .reshape(yb, xb, 3).copy()
    off += 4 * nbc
    ytox = buf[off:off + 4 * ty_n * tx_n].view(np.int32) \
        .reshape(ty_n, tx_n).copy()
    off += 4 * ty_n * tx_n
    ytob = buf[off:off + 4 * ty_n * tx_n].view(np.int32) \
        .reshape(ty_n, tx_n).copy()
    off += 4 * ty_n * tx_n
    if n_nz > cap:     # value or capacity overflow: dense fallback
        q = np.asarray(dense16).astype(np.int32)
    else:
        counts = buf[off:off + nbc].astype(np.int64)
        off += nbc
        u16 = buf[off:off + 2 * cap].view(np.uint16)[:n_nz] \
            .astype(np.int64)
        blockch = np.repeat(np.arange(nbc, dtype=np.int64), counts)
        zig = u16 & 1023
        val = np.where(zig & 1, -((zig + 1) >> 1), zig >> 1)
        q = np.zeros(nq, np.int32)
        q[blockch * 64 + (u16 >> 10)] = val
    return q.reshape(yb, xb, 3, 64), q_dc, ytox, ytob


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
