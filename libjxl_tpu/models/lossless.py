"""Flagship TPU pipeline: Modular lossless encode, group-parallel.

The device computes everything pixel-shaped — RCT, prediction residuals,
zigzag packing, token histograms — in one fused XLA program over a
``(groups, channels, gd, gd)`` layout; the host only runs hybrid-uint
bit-splitting (vectorized numpy), the sequential rANS emission and byte
assembly (SURVEY.md §7 design stance).

Transfer discipline: the host->device payload is the raw uint8/uint16
pixels; the device->host payload is one packed-residual plane (uint16 for
8-bit inputs) plus a 256-entry histogram — ~2 bytes/pixel each way, which
matters when the chip is reached over a narrow link.

Multi-chip: shard the leading group axis with ``NamedSharding`` (see
``libjxl_tpu.parallel.mesh``); the histogram is the cross-shard psum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from libjxl_tpu.ops.modular_ops import (
    fwd_ycocg, gradient_residuals, image_to_groups, pack_signed,
    token_histogram,
)


@functools.partial(jax.jit, static_argnames=("gx", "use_rct", "out16",
                                             "emit_planes"))
def encode_groups_device(groups: jnp.ndarray, h, w, gx: int = 1,
                         use_rct: bool = True, out16: bool = True,
                         emit_planes: bool = True):
    """Device side of lossless encode.

    groups: (G, C, gd, gd) integer (any int dtype); ``h``/``w`` are the
    true image extents (the valid-pixel mask is built on device — no
    boolean upload), ``gx`` the group-grid width. Returns
    (payload, packed_wide): one concatenated uint8 d2h payload (clamped
    residual planes + per-group max + histogram — hosts reach this chip
    over a ~50 MB/s, ~25 ms/transfer tunnel, so both bytes and transfer
    count matter) and the full-width residuals (fetched per group only
    when the group max says uint8 clipped).
    """
    groups = groups.astype(jnp.int32)
    ng, _, gd, _ = groups.shape
    row0 = (jnp.arange(ng) // gx) * gd
    col0 = (jnp.arange(ng) % gx) * gd
    ymask = row0[:, None] + jnp.arange(gd)[None, :] < h     # (G, gd)
    xmask = col0[:, None] + jnp.arange(gd)[None, :] < w
    mask = ymask[:, None, :, None] & xmask[:, None, None, :]
    if use_rct and groups.shape[1] >= 3:
        rgb = groups[:, :3]
        rest = groups[:, 3:]
        groups = jnp.concatenate([fwd_ycocg(rgb), rest], axis=1)
    res = gradient_residuals(groups)
    packed = pack_signed(res)
    # token id is a pure function of the packed value; histogram it here so
    # the host never needs a second pass (and so multi-chip runs reduce it
    # with a psum over the sharded group axis).
    token = _token_id(packed)
    hist = token_histogram(token, jnp.broadcast_to(mask, token.shape))
    wide = packed.astype(jnp.uint16) if out16 else packed
    packed8 = jnp.minimum(packed, 255).astype(jnp.uint8)
    gmax = jnp.max(jnp.where(jnp.broadcast_to(mask, packed.shape), packed,
                             0), axis=(1, 2, 3))
    # single d2h payload: residual planes + per-group max + histogram —
    # the host link has ~25ms fixed latency per transfer, so one fetch
    # beats three (SURVEY.md §7 transfer discipline)
    parts = [gmax.astype(jnp.uint32).view(jnp.uint8).reshape(-1),
             hist.astype(jnp.uint32).view(jnp.uint8).reshape(-1)]
    if emit_planes:
        parts.insert(0, packed8.reshape(-1))
    payload = jnp.concatenate(parts)
    return payload, wide


def _token_id(packed: jnp.ndarray, split_exponent: int = 4,
              msb_in_token: int = 2, lsb_in_token: int = 0) -> jnp.ndarray:
    from libjxl_tpu.ops.modular_ops import floor_log2
    split_token = 1 << split_exponent
    small = packed < split_token
    n = floor_log2(jnp.maximum(packed, 1))
    mant = packed - (jnp.uint32(1) << n.astype(jnp.uint32))
    tok_big = (split_token +
               ((n - split_exponent) << (msb_in_token + lsb_in_token)) +
               ((mant >> jnp.maximum(n - msb_in_token, 0).astype(jnp.uint32))
                << lsb_in_token).astype(jnp.int32) +
               (mant & ((1 << lsb_in_token) - 1)).astype(jnp.int32))
    return jnp.where(small, packed.astype(jnp.int32), tok_big)


def frame_groups_host(img: np.ndarray, group_dim: int):
    """(H, W, C) -> (G, C, gd, gd) uint8/uint16 groups + bool mask (numpy)."""
    h, w, c = img.shape
    gy = -(-h // group_dim)
    gx = -(-w // group_dim)
    ph, pw = gy * group_dim, gx * group_dim
    imgp = np.pad(img, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    groups = imgp.reshape(gy, group_dim, gx, group_dim, c)
    groups = groups.transpose(0, 2, 4, 1, 3).reshape(
        gy * gx, c, group_dim, group_dim)
    yy = np.arange(ph).reshape(gy, group_dim)
    xx = np.arange(pw).reshape(gx, group_dim)
    # (gy, gx, gd, gd) then flatten group axes
    mask = (yy[:, None, :, None] < h) & (xx[None, :, None, :] < w)
    mask = mask.reshape(gy * gx, 1, group_dim, group_dim)
    return np.ascontiguousarray(groups), mask


def encode_image_device(img: np.ndarray, group_dim: int = 256,
                        use_rct: bool = True):
    """Host wrapper: (H, W, C) -> per-group packed residuals + histogram.

    Returns (packed list of per-group (C, gd, gd) arrays, mask, hist).
    Each group is uint8 when its residuals fit, else the wide dtype; only
    the narrow planes travel over the host link."""
    dev = encode_image_device_dispatch(img, group_dim, use_rct)
    return encode_image_device_collect(dev)


def encode_image_device_dispatch(img: np.ndarray, group_dim: int = 256,
                                 use_rct: bool = True):
    """Async half: enqueue device compute + d2h; returns a handle.

    Use with ``encode_image_device_collect`` to pipeline several images
    (transfers overlap the host entropy coding of earlier images)."""
    groups, mask = frame_groups_host(img, group_dim)
    out16 = img.dtype == np.uint8
    h, w = img.shape[:2]
    gx = -(-w // group_dim)
    payload, wide = encode_groups_device(
        jnp.asarray(groups), h, w, gx=gx, use_rct=use_rct, out16=out16)
    payload.copy_to_host_async()
    return payload, wide, mask, groups.shape


def encode_image_device_collect(dev):
    """Blocking half: fetch the payload and split it."""
    payload, wide, mask, gshape = dev
    ng, nch, gd, _ = gshape
    buf = np.asarray(payload)
    psize = ng * nch * gd * gd
    packed8 = buf[:psize].reshape(ng, nch, gd, gd)
    gmax = buf[psize:psize + 4 * ng].view(np.uint32)
    hist = buf[psize + 4 * ng:].view(np.uint32).astype(np.int64)
    out = []
    for g in range(ng):
        if gmax[g] >= 255:
            out.append(np.asarray(wide[g]))   # rare wide fetch
        else:
            out.append(packed8[g])
    return out, mask, hist


@functools.partial(jax.jit, static_argnames=("gx", "cap_words"))
def prefix_pack_device(wide, h, w, code_bits, code_len, gx: int = 1,
                       cap_words: int = 1 << 20):
    """Second-pass device kernel: entropy-code the residual planes into
    ONE continuous LSB-first bitstream on the TPU.

    ``wide``: (G, C, gd, gd) packed residuals (pass-1 output, stays on
    device); ``code_bits``/``code_len``: canonical prefix code LUTs
    (LSB-first code bits, lengths) built on host from the pass-1
    histogram. Each token is emitted as two entries (huffman code, raw
    mantissa bits); bit positions come from an exclusive cumsum and the
    words from two disjoint segment-sums — no sequential packing loop,
    so the MXU/VPU stays busy and the d2h payload is the *compressed*
    stream (~2 bits/px instead of 16).

    Returns (words uint16[cap_words], group_bit_totals int32[G]).
    """
    g, c, gd, _ = wide.shape
    v = wide.astype(jnp.uint32)
    # validity mask from image extents (same layout as encode_groups_device)
    row0 = (jnp.arange(g) // gx) * gd
    col0 = (jnp.arange(g) % gx) * gd
    ymask = row0[:, None] + jnp.arange(gd)[None, :] < h
    xmask = col0[:, None] + jnp.arange(gd)[None, :] < w
    valid = (ymask[:, None, :, None] & xmask[:, None, None, :])
    valid = jnp.broadcast_to(valid, v.shape)

    token = _token_id(v)
    n = jnp.maximum(_floor_log2_u32(jnp.maximum(v, 1)), 2)
    nbits = jnp.where(v < 16, 0, n - 2).astype(jnp.uint32)
    raw = jnp.where(v < 16, 0, v & ((jnp.uint32(1) << nbits) - 1))

    clen = code_len[token].astype(jnp.uint32)
    cbits = code_bits[token].astype(jnp.uint32)
    # two emissions per token: huffman code then raw bits (LSB-first)
    lens = jnp.stack([jnp.where(valid, clen, 0),
                      jnp.where(valid, nbits, 0)], axis=-1).reshape(-1)
    vals = jnp.stack([jnp.where(valid, cbits, 0),
                      jnp.where(valid, raw, 0)], axis=-1).reshape(-1)
    pos = jnp.cumsum(lens) - lens                 # exclusive, group-major
    word = (pos >> 4).astype(jnp.int32)
    off = (pos & 15).astype(jnp.uint32)
    shifted = vals << off                          # < 2^31
    lo = shifted & jnp.uint32(0xFFFF)
    hi = shifted >> 16
    words = jax.ops.segment_sum(lo, word, num_segments=cap_words,
                                indices_are_sorted=True)
    words = words + jax.ops.segment_sum(hi, word + 1,
                                        num_segments=cap_words,
                                        indices_are_sorted=True)
    per_group = jnp.sum(lens.reshape(g, -1), axis=1).astype(jnp.int32)
    return words.astype(jnp.uint16), per_group


def _floor_log2_u32(v):
    n = jnp.zeros_like(v, dtype=jnp.int32)
    x = v
    for s in (16, 8, 4, 2, 1):
        m = x >= (jnp.uint32(1) << s)
        n = jnp.where(m, n + s, n)
        x = jnp.where(m, x >> jnp.uint32(s), x)
    return n
