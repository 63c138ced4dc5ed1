"""Pallas TPU kernel: prefix-pack chunks of hybrid-uint tokens.

The XLA formulation of WriteTokens (enc_ans.cc:1237 analog) pays for a
T-step lax.scan whose (chunks, words) carry round-trips HBM every step
(~53 ms / 25M tokens measured) plus a 25x-slow tiny-table gather. This
kernel keeps the whole token->bits pipeline in VMEM:

  residual value -> token id -> (prefix bits, length) via a 96-entry
  compare-accumulate against an SMEM-prefetched table -> raw mantissa
  bits -> cumsum of bit lengths -> insertion of each token's (lo, hi)
  word contributions into a per-chunk word buffer.

Layout: tokens run along SUBLANES — arrays are (T, CB) with the chunk
axis on lanes — so the insertion fori_loop can dynamic-slice one token
row per step (sublane dynamic slicing is the cheap direction on TPU; an
unrolled lane-sliced loop also blows Mosaic's scoped-VMEM stack, ~58 MB
of dead SSA copies). The word buffer is (NWP, CB) for the same reason.

One grid step packs ``CB`` chunks of ``T`` tokens; the only HBM traffic
is the token block in and the packed words + per-chunk bit counts out.

Validity is carried in-band: invalid (out-of-image) positions hold the
uint32 sentinel and emit zero-length tokens. Sentinels cannot collide
with real residuals (8-bit images pack to < 2^12, 16-bit to < 2^19).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 128      # tokens per chunk (PACK_T)
NWP = 128    # padded word-buffer size; real max is 124 (128 * 31 / 32)
CB = 256     # chunks packed per grid step (lane axis)
ALPHABET = 96


def _floor_log2_i32(v):
    # signed-int formulation: Mosaic lacks unsigned vector max/compare
    n = jnp.zeros_like(v, dtype=jnp.int32)
    x = v
    for s in (16, 8, 4, 2, 1):
        m = x >= (1 << s)
        n = jnp.where(m, n + s, n)
        x = jnp.where(m, x >> s, x)
    return n


def _pack_kernel(lut_ref, v_ref, buf_ref, cb_ref, wt_ref, lo_ref, hi_ref):
    """lut_ref: SMEM (ALPHABET,) int32, (len << 16) | prefix_bits.
    v_ref: (T, CB) uint32 sentinel-carrying residuals (tokens along
    sublanes). buf_ref: (NWP, CB) uint32 packed words (chunk-local,
    word-aligned). cb_ref: (1, CB) int32 exact bit count per chunk."""
    vu = v_ref[:]
    invalid = vu == jnp.uint32(0xFFFFFFFF)
    # all real residuals fit int32 comfortably (< 2^19); int32 math
    # avoids the unsigned vector compares Mosaic can't lower
    v = jnp.where(invalid, 0, vu).astype(jnp.int32)

    # hybrid-uint (4, 2, 0) token id + raw mantissa (dec_ans.h model)
    small = v < 16
    ln = _floor_log2_i32(jnp.maximum(v, 1))
    mant = v - (1 << ln)
    tok_big = 16 + ((ln - 4) << 2) + (mant >> jnp.maximum(ln - 2, 0))
    token = jnp.where(small, v, tok_big)
    nbits = jnp.where(small, 0, ln - 2)
    raw = jnp.where(small, 0, v & ((1 << nbits) - 1)).astype(jnp.uint32)

    # prefix code lookup: tiny-table gathers serialize on TPU; a linear
    # compare-accumulate over the 96-symbol alphabet stays on the VPU
    def lut_body(i, acc):
        return jnp.where(token == i, lut_ref[i], acc)

    comb_lut = jax.lax.fori_loop(0, ALPHABET, lut_body,
                                 jnp.zeros_like(token))
    clen = comb_lut >> 16
    cbits = (comb_lut & 0xFFFF).astype(jnp.uint32)

    comb = jnp.where(invalid, jnp.uint32(0),
                     cbits | (raw << clen.astype(jnp.uint32)))
    lens = jnp.where(invalid, 0, clen + nbits)

    # exclusive cumsum of bit lengths along the token (sublane) axis
    sub = jax.lax.broadcasted_iota(jnp.int32, (T, CB), 0)
    inc = lens
    s = 1
    while s < T:
        inc = inc + jnp.where(sub >= s, pltpu.roll(inc, s, axis=0), 0)
        s *= 2
    off = inc - lens
    cb_ref[:] = inc[T - 1:T, :]

    b = (off & 31).astype(jnp.uint32)
    wt_ref[:] = off >> 5
    lo_ref[:] = comb << b
    hi_ref[:] = jnp.where(b == 0, jnp.uint32(0),
                          comb >> ((jnp.uint32(32) - b) & 31))

    wsub = jax.lax.broadcasted_iota(jnp.int32, (NWP, CB), 0)
    buf_ref[:] = jnp.zeros((NWP, CB), jnp.uint32)

    def insert(t, _):
        # dynamic_slice lowers only on refs, hence the scratch buffers
        wtc = wt_ref[pl.ds(t, 1), :]
        lot = lo_ref[pl.ds(t, 1), :]
        hit = hi_ref[pl.ds(t, 1), :]
        buf_ref[:] = buf_ref[:] \
            | jnp.where(wsub == wtc, lot, 0) \
            | jnp.where(wsub == wtc + 1, hit, 0)
        return 0

    jax.lax.fori_loop(0, T, insert, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pack_chunks_tpu(v2d: jnp.ndarray, lut_comb: jnp.ndarray,
                    interpret: bool = False):
    """Pack (Cn, T) sentinel-carrying uint32 residuals into per-chunk
    word buffers. Returns (buf (Cn, NWP) uint32, chunk_bits (Cn,)
    int32). ``lut_comb``: (ALPHABET,) int32, (code_len << 16) |
    code_bits. Cn must be a CB multiple (caller pads with sentinel
    rows); the layout transposes live in XLA around the kernel."""
    cn = v2d.shape[0]
    assert cn % CB == 0 and v2d.shape[1] == T
    grid = (cn // CB,)
    bufT, cb = pl.pallas_call(
        _pack_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((T, CB), lambda i, lut: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((NWP, CB), lambda i, lut: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, CB), lambda i, lut: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((T, CB), jnp.int32),
                pltpu.VMEM((T, CB), jnp.uint32),
                pltpu.VMEM((T, CB), jnp.uint32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((NWP, cn), jnp.uint32),
            jax.ShapeDtypeStruct((1, cn), jnp.int32),
        ],
        interpret=interpret,
    )(lut_comb, v2d.astype(jnp.uint32).T)
    return bufT.T, cb[0]
