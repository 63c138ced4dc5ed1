"""VarDCT lossy encoder: XYB + 8x8 DCT + uniform adaptive-free quantization
(the reference's e1-e3 feature point; ``lib/jxl/enc_frame.cc``,
``enc_group.cc``). Pixel-parallel math is numpy here and jnp on the
device path; bitstream assembly is host-side.

Encodes: DC global (quantizer/ctx/cfl defaults), per-DC-group VarDCT DC +
AC metadata modular streams, AC global (default matrices + histograms),
per-group AC token streams. Our decoder and libjxl both accept the
output."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from libjxl_tpu.core.fields import FieldWriter, write_u32
from libjxl_tpu.core.frame_header import (
    ColorTransform, FrameEncoding, FrameHeader,
)
from libjxl_tpu.core.geometry import FrameDimensions, cdiv
from libjxl_tpu.core.headers import (
    BitDepth, ColorEncoding, CustomTransformData, ImageMetadata, SizeHeader,
    pack_signed, write_bundle, write_signature,
)
from libjxl_tpu.core.toc import write_toc
from libjxl_tpu.entropy.ans import (
    build_entropy_codes, tokens_to_array, write_entropy_codes, write_tokens,
)
from libjxl_tpu.modular.codec import GroupHeader, modular_encode
from libjxl_tpu.modular.image import Channel, ModularImage
from libjxl_tpu.modular.predict import PREDICTOR_GRADIENT, PREDICTOR_ZERO
from libjxl_tpu.modular.tree import TreeNode
from libjxl_tpu.utils.bits import BitWriter
from libjxl_tpu.vardct.ac_context import BlockCtxMap, zero_density_context
from libjxl_tpu.vardct.ac_strategy import natural_order
from libjxl_tpu.vardct.coeff_order import K_ORDER_ENC
from libjxl_tpu.vardct.dct import coeffs_rc_to_stored, dct2d
from libjxl_tpu.vardct.frame_dec import K_GLOBAL_SCALE_DENOM, Quantizer, \
    _GLOBAL_SCALE_DIST, _QUANT_DC_DIST
from libjxl_tpu.vardct.quant_weights import DequantMatrices
from libjxl_tpu.color.xyb import linear_to_xyb, srgb_to_linear


@dataclass
class LossyOptions:
    distance: float = 1.0
    effort: int = 3
    use_device: bool = False     # JAX/TPU path for color+DCT+quantize


def encode_lossy(pixels: np.ndarray, options: LossyOptions | None = None
                 ) -> bytes:
    """Encode (h, w, 3) uint8 sRGB to a VarDCT JXL codestream."""
    options = options or LossyOptions()
    if pixels.ndim != 3 or pixels.shape[2] < 3:
        raise ValueError("lossy encoder expects RGB input")
    h, w, _ = pixels.shape
    d = max(options.distance, 0.01)

    # ---- color transform -------------------------------------------------
    srgb = pixels[:, :, :3].astype(np.float64) / 255.0
    linear = srgb_to_linear(srgb)
    xyb = linear_to_xyb(np.moveaxis(linear, -1, 0))
    # The decoder's CfL restore adds base_correlation_b (default 1.0) * Y
    # to B (chroma_from_luma.h:109), so the stored B plane is B - Y.
    xyb[2] -= xyb[1]

    fd = FrameDimensions(w, h, 256)
    xb, yb = fd.xsize_blocks, fd.ysize_blocks
    # pad to block grid (edge replicate)
    xyb_p = np.pad(xyb, ((0, 0), (0, yb * 8 - h), (0, xb * 8 - w)),
                   mode="edge")

    # ---- quantization ----------------------------------------------------
    q_mul = 0.84 / d                 # AC quantization multiplier
    qf = 64
    global_scale = int(np.clip(round(K_GLOBAL_SCALE_DENOM * q_mul / qf),
                               1, (1 << 16) - 1))
    quant_dc_int = int(np.clip(round(1.2 / d * K_GLOBAL_SCALE_DENOM /
                                     global_scale), 1, (1 << 16) - 1))
    quantizer = Quantizer(global_scale, quant_dc_int)
    matrices = DequantMatrices()
    bctx = BlockCtxMap()

    inv_gs = quantizer.inv_global_scale
    scaled_dequant = inv_gs / qf
    table = matrices.tables[0].reshape(3, 64).astype(np.float64)  # DCT8
    x_dm = (1 / 1.25) ** (3 - 2.0)   # x_qm_scale = 3 default
    b_dm = 1.0                       # b_qm_scale = 2
    dm = np.array([x_dm, 1.0, b_dm])[:, None]
    dequant_step = table * scaled_dequant * dm  # (3, 64)

    # ---- DCT + quantize all blocks --------------------------------------
    mul_dc = quantizer.mul_dc(matrices.dc_quant)
    if options.use_device:
        # fused XLA program: sRGB->XYB + batched MXU DCT + quantize
        import jax.numpy as jnp
        from libjxl_tpu.models.vardct_pipeline import vardct_encode_device
        ph, pw = yb * 8, xb * 8
        rgb_p = np.pad(np.moveaxis(pixels[:, :, :3], -1, 0),
                       ((0, 0), (0, ph - h), (0, pw - w)), mode="edge")
        q_ac_d, q_dc_d = vardct_encode_device(
            jnp.asarray(rgb_p[None]),
            jnp.asarray(dequant_step, dtype=jnp.float32),
            jnp.asarray(1.0 / np.array(mul_dc), dtype=jnp.float32))
        q_ac = np.asarray(q_ac_d[0]).astype(np.int32)
        q_ac = q_ac.transpose(1, 0, 2).reshape(yb, xb, 3, 64)
        q_dc = np.asarray(q_dc_d[0]).astype(np.int32).transpose(1, 2, 0)
    else:
        blocks = xyb_p.reshape(3, yb, 8, xb, 8).transpose(1, 3, 0, 2, 4)
        from libjxl_tpu.vardct.dct import dct_matrix
        m8 = dct_matrix(8)
        coef = np.einsum("ux,ybcxz,vz->ybcuv", m8, blocks, m8)
        stored = coef.transpose(0, 1, 2, 4, 3).reshape(yb, xb, 3, 64)
        q_ac = np.round(stored / dequant_step[None, None]).astype(np.int32)
        dc_float = stored[:, :, :, 0]                   # (yb, xb, 3)
        q_dc = np.round(dc_float /
                        np.array(mul_dc)[None, None]).astype(np.int32)

    # ---- AC tokens -------------------------------------------------------
    order = natural_order(0)
    group_tokens = [[] for _ in range(fd.num_groups)]
    gdb = fd.group_dim // 8
    for gy in range(fd.ysize_groups):
        for gx in range(fd.xsize_groups):
            g = gy * fd.xsize_groups + gx
            toks = group_tokens[g]
            by0, bx0 = gy * gdb, gx * gdb
            gh = min(gdb, yb - by0)
            gw = min(gdb, xb - bx0)
            # nzeros prediction state is per-group (GroupDecCache)
            nzeros_img = np.zeros((3, gh, gw), dtype=np.int32)
            for by in range(gh):
                for bx in range(gw):
                    y, x = by0 + by, bx0 + bx
                    for c in (1, 0, 2):
                        _tokenize_block(
                            toks, q_ac[y, x, c], order, nzeros_img[c], bx,
                            by, bctx, qf, c)

    codes = build_entropy_codes(
        [tokens_to_array(t) if t else np.zeros((0, 2), np.int64)
         for t in group_tokens],
        num_contexts=bctx.num_ac_contexts(), allow_clustering=True,
        histo_shift=11, max_clusters=24)

    # ---- headers ---------------------------------------------------------
    bw = BitWriter()
    write_signature(bw)
    size = SizeHeader()
    size.set(w, h)
    write_bundle(bw, size)
    meta = ImageMetadata(xyb_encoded=True,
                         bit_depth=BitDepth(bits_per_sample=8),
                         color_encoding=ColorEncoding.srgb(gray=False))
    write_bundle(bw, meta)
    ctd = CustomTransformData()
    ctd.xyb_encoded = True
    write_bundle(bw, ctd)
    bw.zero_pad_to_byte()

    fh = FrameHeader(encoding=FrameEncoding.VARDCT,
                     color_transform=ColorTransform.XYB)
    fh.loop_filter.gab = False
    fh.loop_filter.epf_iters = 0
    meta.nonserialized_xsize = w
    meta.nonserialized_ysize = h
    fh.visit(FieldWriter(bw), meta)

    # ---- sections --------------------------------------------------------
    def dc_global(sw: BitWriter) -> None:
        sw.write(1, 1)                       # DequantMatrices::DecodeDC def.
        write_u32(sw, _GLOBAL_SCALE_DIST, global_scale)
        write_u32(sw, _QUANT_DC_DIST, quant_dc_int)
        sw.write(1, 1)                       # BlockCtxMap default
        sw.write(1, 1)                       # CfL DC default
        # modular global: no global tree; global image has no channels ->
        # nothing is written (ModularDecode early-returns on empty image)
        sw.write(1, 0)                       # has_global_tree = false

    def dc_group(sw: BitWriter, g: int) -> None:
        gx = g % fd.xsize_dc_groups
        gy = g // fd.xsize_dc_groups
        x0, y0 = gx * fd.group_dim, gy * fd.group_dim   # in blocks
        bwd = min(fd.group_dim, xb - x0)
        bhd = min(fd.group_dim, yb - y0)
        sw.write(2, 0)                       # extra_precision = 0
        img = ModularImage(bwd, bhd, 32)
        for src_c in (1, 0, 2):              # stream order [Y, X, B]
            img.channel.append(Channel(
                q_dc[y0:y0 + bhd, x0:x0 + bwd, src_c].copy()))
        modular_encode(sw, img, group_id=1 + g,
                       tree=[TreeNode(-1, 0, 0, 0, PREDICTOR_GRADIENT, 0, 1)])
        # Modular DC group: no channels -> nothing.
        # AC metadata:
        upper = bwd * bhd
        count = upper                        # one acs entry per block (DCT8)
        sw.write((upper - 1).bit_length() if upper > 1 else 0, count - 1)
        cw = (bwd + 7) >> 3
        chh = (bhd + 7) >> 3
        am = ModularImage(bwd, bhd, 32)
        am.channel.append(Channel(np.zeros((chh, cw), np.int32), 3, 3))
        am.channel.append(Channel(np.zeros((chh, cw), np.int32), 3, 3))
        acs_qf = np.zeros((2, count), np.int32)
        acs_qf[0, :] = 0                     # DCT8 strategy
        acs_qf[1, :] = qf - 1                # raw qf - 1
        am.channel.append(Channel(acs_qf))
        am.channel.append(Channel(np.zeros((bhd, bwd), np.int32)))
        modular_encode(sw, am, group_id=1 + 2 * fd.num_dc_groups + g,
                       tree=[TreeNode(-1, 0, 0, 0, PREDICTOR_ZERO, 0, 1)])

    def ac_global(sw: BitWriter) -> None:
        sw.write(1, 1)                       # dequant matrices all default
        nbits = max((fd.num_groups - 1).bit_length(), 0)
        if nbits:
            sw.write(nbits, 0)               # num_histograms - 1 = 0
        write_u32(sw, K_ORDER_ENC, 0)        # used_orders = 0 (natural)
        write_entropy_codes(sw, codes)

    def ac_group(sw: BitWriter, g: int) -> None:
        # histogram selector: 0 bits (num_histograms == 1)
        arr = tokens_to_array(group_tokens[g]) if group_tokens[g] else \
            np.zeros((0, 2), np.int64)
        write_tokens(sw, arr, codes)

    def section(*parts) -> bytes:
        sw = BitWriter()
        for fn in parts:
            fn(sw)
        sw.zero_pad_to_byte()
        return sw.to_bytes()

    single = fd.num_groups == 1
    if single:
        # one section: DCGlobal | DCGroup | ACGlobal | ACGroup, continuous
        # bits, padded only at the very end (enc_frame.cc:1489-1492).
        sections = [section(dc_global, lambda sw: dc_group(sw, 0),
                            ac_global, lambda sw: ac_group(sw, 0))]
    else:
        sections = [section(dc_global)]
        for g in range(fd.num_dc_groups):
            sections.append(section(lambda sw, g=g: dc_group(sw, g)))
        sections.append(section(ac_global))
        for g in range(fd.num_groups):
            sections.append(section(lambda sw, g=g: ac_group(sw, g)))

    write_toc(bw, [len(s) for s in sections])
    out = bytearray(bw.to_bytes())
    for s in sections:
        out.extend(s)
    return bytes(out)


def _tokenize_block(toks, qcoef, order, nz, bx, by, bctx: BlockCtxMap,
                    qf: int, c: int) -> None:
    """Mirror of DecodeACVarBlock for DCT8 (enc_entropy_coder.cc:153)."""
    vals = qcoef[order[1:]]
    nzeros = int(np.count_nonzero(vals))
    if bx == 0:
        predicted = nz[by - 1, bx] if by > 0 else 32
    elif by == 0:
        predicted = nz[by, bx - 1]
    else:
        predicted = (nz[by - 1, bx] + nz[by, bx - 1] + 1) // 2
    nz[by, bx] = nzeros
    block_ctx = bctx.context(0, qf, 0, c)
    toks.append((bctx.nonzero_context(int(predicted), block_ctx), nzeros))
    if nzeros == 0:
        return
    histo_offset = bctx.zero_density_offset(block_ctx)
    prev = 0 if nzeros > 4 else 1
    left = nzeros
    for k in range(1, 64):
        v = int(vals[k - 1])
        ctx = histo_offset + zero_density_context(left, k, 1, 0, prev)
        toks.append((ctx, pack_signed(v)))
        prev = 1 if v else 0
        left -= prev
        if left == 0:
            break
