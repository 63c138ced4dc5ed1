"""High-level decoder: codestream -> pixels.

Round-1 scope: full Modular (lossless/integer) frames; VarDCT arrives with
the render pipeline. Mirrors the section flow of ``lib/jxl/dec_frame.cc``.
"""

from __future__ import annotations

import numpy as np

from libjxl_tpu.api.codestream import (
    CodecMetadata, parse_codestream, read_codec_metadata,
)
from libjxl_tpu.core.fields import FormatError, read_f16
from libjxl_tpu.core.frame_header import (
    ColorTransform, FrameEncoding, FrameFlags,
)
from libjxl_tpu.core.geometry import FrameDimensions
from libjxl_tpu.core.toc import ac_group_index
from libjxl_tpu.modular.frame import (
    ModularFrameDecoder, get_downsampling_bracket, stream_id_modular_ac,
    stream_id_modular_dc,
)
from libjxl_tpu.utils.bits import BitReader


def _decode_dequant_dc(r: BitReader) -> tuple:
    """DequantMatrices::DecodeDC (quant_weights.cc:513-528)."""
    all_default = r.read(1) == 1
    dc_quant = [1.0 / 4096, 1.0 / 512, 1.0 / 256]  # kDCQuant defaults
    if not all_default:
        dc_quant = [read_f16(r) / 128.0 for _ in range(3)]
    return dc_quant


def decode_modular_frame(meta: CodecMetadata, frame) -> np.ndarray:
    """Decode one modular frame's sections into channel data."""
    fh = frame.header
    fd = frame.dims
    if fh.flags & (FrameFlags.PATCHES | FrameFlags.SPLINES |
                   FrameFlags.NOISE):
        raise FormatError("image features not yet supported in decoder")
    dec = ModularFrameDecoder(fh, meta.m, fd)

    single = len(frame.sections) == 1
    if single:
        r = BitReader(frame.sections[0])
        _decode_dequant_dc(r)
        dec.decode_global_info(r)
        x0, y0, w, h = 0, 0, fd.xsize, fd.ysize
        dec.decode_group(r, (0, 0, fd.dc_group_dim, fd.dc_group_dim), 3,
                         1000, stream_id_modular_dc(fd, 0))
        for pass_idx in range(fh.passes.num_passes):
            mins, maxs = get_downsampling_bracket(fh.passes, pass_idx)
            dec.decode_group(r, (0, 0, fd.group_dim, fd.group_dim), mins,
                             maxs, stream_id_modular_ac(fd, 0, pass_idx))
    else:
        r = BitReader(frame.sections[0])
        _decode_dequant_dc(r)
        dec.decode_global_info(r)
        for g in range(fd.num_dc_groups):
            r = BitReader(frame.sections[1 + g])
            gx = g % fd.xsize_dc_groups
            gy = g // fd.xsize_dc_groups
            dec.decode_group(
                r, (gx * fd.dc_group_dim, gy * fd.dc_group_dim,
                    fd.dc_group_dim, fd.dc_group_dim), 3, 1000,
                stream_id_modular_dc(fd, g))
        # AC global section: nothing for modular frames.
        for pass_idx in range(fh.passes.num_passes):
            mins, maxs = get_downsampling_bracket(fh.passes, pass_idx)
            for g in range(fd.num_groups):
                sec = ac_group_index(pass_idx, g, fd.num_groups,
                                     fd.num_dc_groups)
                r = BitReader(frame.sections[sec])
                gx = g % fd.xsize_groups
                gy = g // fd.xsize_groups
                dec.decode_group(
                    r, (gx * fd.group_dim, gy * fd.group_dim, fd.group_dim,
                        fd.group_dim), mins, maxs,
                    stream_id_modular_ac(fd, g, pass_idx))
    fi = dec.finalize()
    return fi


def decode_vardct_frame(meta: CodecMetadata, frame) -> np.ndarray:
    """Decode one VarDCT frame to a float XYB image, then apply the
    restoration filters and frame upsampling; returns (3, H, W) XYB
    (pre-color-transform). Stage order per dec_cache.cc:142-217:
    gaborish -> EPF -> upsampling."""
    from libjxl_tpu.vardct.frame_dec import VarDCTFrameDecoder
    from libjxl_tpu.render.filters import compute_sigma, epf_step1, \
        epf_step2, gaborish

    fh = frame.header
    fd = frame.dims
    dec = VarDCTFrameDecoder(fh, meta.m, fd)
    single = len(frame.sections) == 1
    if single:
        r = BitReader(frame.sections[0])
        dec.decode_dc_global(r)
        dec.decode_dc_group(r, 0)
        dec.finalize_dc()
        dec.decode_ac_global(r)
        dec.decode_ac_group([r], 0, fh.passes.num_passes)
    else:
        r = BitReader(frame.sections[0])
        dec.decode_dc_global(r)
        for g in range(fd.num_dc_groups):
            dec.decode_dc_group(BitReader(frame.sections[1 + g]), g)
        dec.finalize_dc()
        dec.decode_ac_global(BitReader(
            frame.sections[1 + fd.num_dc_groups]))
        for g in range(fd.num_groups):
            readers = [BitReader(frame.sections[ac_group_index(
                p, g, fd.num_groups, fd.num_dc_groups)])
                for p in range(fh.passes.num_passes)]
            dec.decode_ac_group(readers, g, fh.passes.num_passes)

    xyb = dec.pixels[:, :fd.ysize, :fd.xsize]
    lf = fh.loop_filter
    if lf.gab:
        xyb = gaborish(xyb, lf)
    if lf.epf_iters > 0:
        inv_sigma = compute_sigma(lf, dec.acs_raw, dec.acs_anchor,
                                  dec.raw_quant, dec.epf_sharpness,
                                  dec.quantizer.scale)
        if lf.epf_iters >= 3:
            raise FormatError("EPF0 pass not yet implemented")
        xyb = epf_step1(xyb, inv_sigma, lf)
        if lf.epf_iters >= 2:
            xyb = epf_step2(xyb, inv_sigma, lf)
    if fh.flags & FrameFlags.SPLINES:
        from libjxl_tpu.render.splines import render_splines
        xyb = render_splines(xyb, dec.splines,
                             dec.cmap.ytox_ratio(0), dec.cmap.ytob_ratio(0))
    if fh.upsampling > 1:
        from libjxl_tpu.render.upsample import upsample_image
        shift = fh.upsampling.bit_length() - 1
        xyb = upsample_image(xyb, shift, meta.transform_data)
    if fh.flags & FrameFlags.NOISE:
        from libjxl_tpu.render.noise import add_noise
        xyb = add_noise(xyb[:, :meta.ysize, :meta.xsize], dec.noise_lut,
                        fh.group_dim,
                        base_correlation_x=dec.cmap.base_correlation_x,
                        base_correlation_b=dec.cmap.base_correlation_b)
    return xyb


def decode(data: bytes) -> np.ndarray:
    """Decode a JXL codestream to an (h, w, c) numpy array.

    Integer output at the metadata bit depth (uint8/uint16)."""
    from libjxl_tpu.api.container import extract_codestream
    meta, frames = parse_codestream(extract_codestream(data))
    frame = frames[-1]
    fh = frame.header
    if fh.encoding != FrameEncoding.MODULAR:
        from libjxl_tpu.color.xyb import linear_to_srgb, xyb_to_linear
        xyb = decode_vardct_frame(meta, frame)
        xyb = xyb[:, :meta.ysize, :meta.xsize]
        intensity = meta.m.tone_mapping.intensity_target
        linear = xyb_to_linear(xyb, intensity_target=intensity)
        srgb = linear_to_srgb(linear)
        out = np.moveaxis(srgb, 0, -1)
        bits = meta.m.bit_depth.bits_per_sample
        maxv = (1 << bits) - 1 if bits <= 16 else 255
        out = np.clip(np.round(out * maxv), 0, maxv)
        return out.astype(np.uint8 if bits <= 8 else np.uint16)
    if fh.color_transform == ColorTransform.XYB:
        raise FormatError("XYB modular (lossy) not yet supported")
    fi = decode_modular_frame(meta, frame)
    nb = len(fi.channel)
    planes = [ch.plane for ch in fi.channel]
    if fh.color_transform == ColorTransform.YCBCR:
        raise FormatError("YCbCr output not yet supported")
    out = np.stack(planes, axis=-1)
    bits = meta.m.bit_depth.bits_per_sample
    if bits <= 8:
        out = np.clip(out, 0, 255).astype(np.uint8)
    elif bits <= 16:
        out = np.clip(out, 0, 65535).astype(np.uint16)
    return out
