"""Synthetic LUT-class ICC profile builder for tests: an mft2 (lut16)
RGB profile with XYZ PCS whose A2B0 CLUT encodes sRGB->XYZ(D50) and
whose B2A0 CLUT encodes the inverse. Exercises the same parsing +
interpolation surface as camera/printer profiles (ICC v2 10.9
lut16Type layout)."""

import struct

import numpy as np


def _srgb_to_linear(v):
    return np.where(v <= 0.04045, v / 12.92,
                    ((v + 0.055) / 1.055) ** 2.4)


def _linear_to_srgb(v):
    v = np.clip(v, 0.0, 1.0)
    return np.where(v <= 0.0031308, v * 12.92,
                    1.055 * v ** (1 / 2.4) - 0.055)


# sRGB (D65) -> XYZ(D50) with Bradford adaptation (lcms sRGB profile)
M_SRGB_D50 = np.array([
    [0.4360747, 0.3850649, 0.1430804],
    [0.2225045, 0.7168786, 0.0606169],
    [0.0139322, 0.0971045, 0.7141733]])


def _tag(typ: bytes, body: bytes) -> bytes:
    return typ + b"\0\0\0\0" + body


def _mft2(n_in, n_out, grid, in_tables, clut, out_tables) -> bytes:
    mat = np.eye(3)
    body = struct.pack(">BBBB", n_in, n_out, grid, 0)
    for v in mat.reshape(-1):
        body += struct.pack(">i", int(round(v * 65536)))
    body += struct.pack(">HH", in_tables.shape[1], out_tables.shape[1])
    enc = np.clip(np.rint(in_tables * 65535), 0, 65535).astype(">u2")
    body += enc.tobytes()
    body += np.clip(np.rint(clut * 65535), 0, 65535).astype(
        ">u2").tobytes()
    body += np.clip(np.rint(out_tables * 65535), 0, 65535).astype(
        ">u2").tobytes()
    return _tag(b"mft2", body)


def build_lut_profile(grid: int = 17) -> bytes:
    """RGB mft2 profile: device = sRGB-encoded, PCS = XYZ(D50)."""
    ramp = np.linspace(0, 1, 256)[None, :].repeat(3, 0)

    g = np.linspace(0, 1, grid)
    r, gg, b = np.meshgrid(g, g, g, indexing="ij")
    rgb = np.stack([r, gg, b]).reshape(3, -1)
    xyz = M_SRGB_D50 @ _srgb_to_linear(rgb)
    a2b_clut = np.clip(xyz * (32768.0 / 65535.0), 0, 1
                       ).T.reshape(grid, grid, grid, 3)

    ge = np.linspace(0, 1, grid) * (65535.0 / 32768.0)
    x, y, z = np.meshgrid(ge, ge, ge, indexing="ij")
    lin = np.linalg.inv(M_SRGB_D50) @ np.stack([x, y, z]).reshape(3, -1)
    b2a_clut = _linear_to_srgb(lin).T.reshape(grid, grid, grid, 3)

    a2b = _mft2(3, 3, grid, ramp, a2b_clut.reshape(-1, 3), ramp)
    b2a = _mft2(3, 3, grid, ramp, b2a_clut.reshape(-1, 3), ramp)
    wtpt = _tag(b"XYZ ", b"".join(
        struct.pack(">i", int(round(v * 65536)))
        for v in (0.9642, 1.0, 0.8249)))
    desc = _tag(b"desc", struct.pack(">I", 8) + b"lut-rgb\0" + b"\0" * 78)
    cprt = _tag(b"text", b"none\0\0\0\0")

    tags = [(b"desc", desc), (b"wtpt", wtpt), (b"cprt", cprt),
            (b"A2B0", a2b), (b"B2A0", b2a)]
    table = b""
    bodies = b""
    off = 132 + 12 * len(tags)
    for sig, body in tags:
        pad = (-len(body)) % 4
        table += struct.pack(">4sII", sig, off, len(body))
        bodies += body + b"\0" * pad
        off += len(body) + pad
    header = bytearray(128)
    struct.pack_into(">I", header, 0, off)              # profile size
    header[4:8] = b"none"                               # CMM
    struct.pack_into(">I", header, 8, 0x02400000)       # version 2.4
    header[12:16] = b"prtr"                             # class
    header[16:20] = b"RGB "                             # data space
    header[20:24] = b"XYZ "                             # PCS
    header[36:40] = b"acsp"
    struct.pack_into(">I", header, 64, 0)               # intent
    struct.pack_into(">3i", header, 68,                 # illuminant D50
                     int(0.9642 * 65536), 65536, int(0.8249 * 65536))
    return bytes(header) + struct.pack(">I", len(tags)) + table + bodies


def _curv_ident() -> bytes:
    return b"curv" + b"\0\0\0\0" + struct.pack(">I", 0)


def _mab_tag(typ: bytes, n_in: int, n_out: int, grid: int,
             clut: np.ndarray, matrix=None) -> bytes:
    """v4 lutAToB/lutBToA with identity A/B curves, optional matrix,
    16-bit CLUT (ICC v4 10.12/10.13 layout)."""
    curve = _curv_ident()
    pad = (-len(curve)) % 4
    curve_el = curve + b"\0" * pad
    head = bytearray(32)
    head[0:4] = typ
    head[8] = n_in
    head[9] = n_out
    body = bytearray()
    off0 = 32

    def put(data: bytes) -> int:
        nonlocal body
        pos = off0 + len(body)
        body += data + b"\0" * ((-len(data)) % 4)
        return pos

    n_b = 3
    off_b = put(curve_el * n_b)
    off_mat = 0
    if matrix is not None:
        m, o = matrix
        vals = list(m.reshape(-1)) + list(o)
        off_mat = put(b"".join(struct.pack(">i", int(round(v * 65536)))
                               for v in vals))
    off_m = put(curve_el * 3)
    clut_hdr = bytes([grid] * n_in + [0] * (16 - n_in)) + \
        bytes([2, 0, 0, 0])
    clut_body = np.clip(np.rint(clut.reshape(-1) * 65535), 0,
                        65535).astype(">u2").tobytes()
    off_clut = put(clut_hdr + clut_body)
    n_a = n_in if typ == b"mAB " else n_out
    off_a = put(curve_el * n_a)
    struct.pack_into(">IIIII", head, 12, off_b, off_mat, off_m,
                     off_clut, off_a)
    return bytes(head) + bytes(body)


def build_mab_profile(grid: int = 17) -> bytes:
    """v4 RGB profile with mAB/mBA pipelines (same transform as
    build_lut_profile, in the v4 tag layout)."""
    g = np.linspace(0, 1, grid)
    r, gg, b = np.meshgrid(g, g, g, indexing="ij")
    rgb = np.stack([r, gg, b]).reshape(3, -1)
    xyz = M_SRGB_D50 @ _srgb_to_linear(rgb)
    a2b_clut = np.clip(xyz * (32768.0 / 65535.0), 0, 1
                       ).T.reshape(grid, grid, grid, 3)
    ge = np.linspace(0, 1, grid) * (65535.0 / 32768.0)
    x, y, z = np.meshgrid(ge, ge, ge, indexing="ij")
    lin = np.linalg.inv(M_SRGB_D50) @ np.stack([x, y, z]).reshape(3, -1)
    b2a_clut = _linear_to_srgb(lin).T.reshape(grid, grid, grid, 3)

    a2b = _mab_tag(b"mAB ", 3, 3, grid, a2b_clut)
    b2a = _mab_tag(b"mBA ", 3, 3, grid, b2a_clut)
    wtpt = _tag(b"XYZ ", b"".join(
        struct.pack(">i", int(round(v * 65536)))
        for v in (0.9642, 1.0, 0.8249)))
    desc = _tag(b"mluc", struct.pack(">IIHH", 1, 12, 0x656E, 0x5553) +
                struct.pack(">II", 14, 28) + "lut-rgb".encode("utf-16-be"))
    tags = [(b"desc", desc), (b"wtpt", wtpt),
            (b"A2B0", a2b), (b"B2A0", b2a)]
    table = b""
    bodies = b""
    off = 132 + 12 * len(tags)
    for sig, body in tags:
        pad = (-len(body)) % 4
        table += struct.pack(">4sII", sig, off, len(body))
        bodies += body + b"\0" * pad
        off += len(body) + pad
    header = bytearray(128)
    struct.pack_into(">I", header, 0, off)
    header[4:8] = b"none"
    struct.pack_into(">I", header, 8, 0x04300000)
    header[12:16] = b"prtr"
    header[16:20] = b"RGB "
    header[20:24] = b"XYZ "
    header[36:40] = b"acsp"
    struct.pack_into(">3i", header, 68,
                     int(0.9642 * 65536), 65536, int(0.8249 * 65536))
    return bytes(header) + struct.pack(">I", len(tags)) + table + bodies
