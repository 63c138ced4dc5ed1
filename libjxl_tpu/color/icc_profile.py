"""ICC profile color management for matrix/TRC display profiles
(reference surface: ``lib/jxl/cms/jxl_cms.cc`` through skcms/lcms;
this image has neither, so the common profile class — v2/v4 RGB or
gray profiles built from rXYZ/gXYZ/bXYZ columns + curv/para tone
curves — is implemented directly. LUT-based (A2B/B2A) profiles are
out of scope and raise ValueError so callers can fall back loudly.)

The pipeline: signal --TRC--> linear profile RGB --matrix--> XYZ(D50)
--Bradford--> XYZ(D65) --matrix--> linear sRGB, and its inverse.
"""

from __future__ import annotations

import struct

import numpy as np

_D50 = (0.34567, 0.35850)
_D65 = (0.3127, 0.3290)


def _s15f16(b: bytes, off: int) -> float:
    v, = struct.unpack_from(">i", b, off)
    return v / 65536.0


def parse_icc(icc: bytes) -> dict:
    """Parse a matrix/TRC ICC profile: returns {'gray': bool,
    'matrix': (3,3) profile-RGB -> XYZ(D50), 'trc': [3 curve specs]}.
    Raises ValueError for LUT-based or malformed profiles."""
    if len(icc) < 132 or icc[36:40] != b"acsp":
        raise ValueError("not an ICC profile")
    space = icc[16:20]
    if space not in (b"RGB ", b"GRAY"):
        raise ValueError(f"unsupported ICC color space {space!r}")
    ntags, = struct.unpack_from(">I", icc, 128)
    if len(icc) < 132 + 12 * ntags:
        raise ValueError("truncated ICC tag table")
    tags = {}
    for i in range(ntags):
        sig, off, size = struct.unpack_from(">4sII", icc, 132 + 12 * i)
        if off + size > len(icc):
            raise ValueError("ICC tag out of bounds")
        tags[sig] = icc[off:off + size]

    def read_xyz(raw: bytes):
        if raw[:4] != b"XYZ ":
            raise ValueError("bad XYZ tag")
        return [_s15f16(raw, 8), _s15f16(raw, 12), _s15f16(raw, 16)]

    def read_curve(raw: bytes):
        typ = raw[:4]
        if typ == b"curv":
            n, = struct.unpack_from(">I", raw, 8)
            if n == 0:
                return ("gamma", 1.0)
            if n == 1:
                g, = struct.unpack_from(">H", raw, 12)
                return ("gamma", g / 256.0)
            lut = np.frombuffer(raw[12:12 + 2 * n],
                                ">u2").astype(np.float64) / 65535.0
            return ("lut", lut)
        if typ == b"para":
            ft, = struct.unpack_from(">H", raw, 8)
            npar = {0: 1, 1: 3, 2: 4, 3: 5, 4: 7}.get(ft)
            if npar is None:
                raise ValueError("unknown parametric curve type")
            pars = [_s15f16(raw, 12 + 4 * i) for i in range(npar)]
            return ("para", ft, pars)
        raise ValueError(f"unsupported curve type {typ!r}")

    if space == b"GRAY":
        if b"kTRC" not in tags:
            raise ValueError("gray ICC without kTRC")
        trc = [read_curve(tags[b"kTRC"])] * 3
        # gray maps straight to the white point's XYZ
        wx, wy = _D50
        wxyz = np.array([wx / wy, 1.0, (1 - wx - wy) / wy])
        matrix = np.column_stack([wxyz / 3, wxyz / 3, wxyz / 3])
        return {"gray": True, "matrix": matrix, "trc": trc}
    need = (b"rXYZ", b"gXYZ", b"bXYZ", b"rTRC", b"gTRC", b"bTRC")
    if any(t not in tags for t in need):
        raise ValueError("LUT-based ICC profile (no matrix/TRC tags)")
    matrix = np.column_stack([read_xyz(tags[b"rXYZ"]),
                              read_xyz(tags[b"gXYZ"]),
                              read_xyz(tags[b"bXYZ"])])
    trc = [read_curve(tags[t]) for t in (b"rTRC", b"gTRC", b"bTRC")]
    return {"gray": False, "matrix": matrix, "trc": trc}


def _curve_forward(x: np.ndarray, spec) -> np.ndarray:
    """device signal -> linear (the TRC direction stored in profiles)."""
    x = np.clip(x, 0.0, 1.0)
    if spec[0] == "gamma":
        return x ** spec[1]
    if spec[0] == "lut":
        lut = spec[1]
        return np.interp(x, np.linspace(0, 1, len(lut)), lut)
    _, ft, p = spec
    if ft == 0:
        return x ** p[0]
    # types 1-4 generalize Y = (a X + b)^g above a threshold
    if ft == 1:
        g, a, b = p
        d = -b / a
        return np.where(x >= d, (a * x + b) ** g, 0.0)
    if ft == 2:
        g, a, b, c = p
        d = -b / a
        return np.where(x >= d, (a * x + b) ** g + c, c)
    if ft == 3:
        g, a, b, c, d = p
        return np.where(x >= d, (a * x + b) ** g, c * x)
    g, a, b, c, d, e, f = p
    return np.where(x >= d, (a * x + b) ** g + e, c * x + f)


def _curve_inverse(y: np.ndarray, spec) -> np.ndarray:
    """linear -> device signal."""
    y = np.clip(y, 0.0, 1.0)
    if spec[0] == "gamma":
        return y ** (1.0 / max(spec[1], 1e-6))
    if spec[0] == "lut":
        lut = np.maximum.accumulate(spec[1])     # enforce monotonic
        xs = np.linspace(0, 1, len(lut))
        return np.interp(y, lut, xs)
    _, ft, p = spec
    if ft == 0:
        return y ** (1.0 / max(p[0], 1e-6))
    if ft == 3:
        g, a, b, c, d = p
        lin_max = c * d
        return np.where(y >= lin_max,
                        (np.maximum(y, 1e-12) ** (1.0 / g) - b) / a,
                        y / max(c, 1e-12))
    # fall back to numeric inversion via a dense LUT for types 1/2/4
    xs = np.linspace(0, 1, 4096)
    ys = np.maximum.accumulate(_curve_forward(xs, spec))
    return np.interp(y, ys, xs)


def _xyz_matrix_to_srgb() -> np.ndarray:
    from libjxl_tpu.color.cms import adapt_matrix, rgb_to_xyz_matrix
    from libjxl_tpu.core.headers import ColorEncoding
    srgb = ColorEncoding.srgb()
    m_srgb = rgb_to_xyz_matrix(srgb)            # sRGB -> XYZ(D65)
    adapt = adapt_matrix(_D50, _D65)            # XYZ D50 -> D65
    return np.linalg.inv(m_srgb) @ adapt


def icc_to_linear_srgb(planes: np.ndarray, icc: bytes) -> np.ndarray:
    """(3, h, w) device signal under the ICC profile -> linear sRGB."""
    prof = parse_icc(icc)
    lin = np.stack([_curve_forward(planes[c], prof["trc"][c])
                    for c in range(3)])
    m = _xyz_matrix_to_srgb() @ prof["matrix"]
    return np.einsum("ij,jhw->ihw", m, lin)


def linear_srgb_to_icc(planes: np.ndarray, icc: bytes) -> np.ndarray:
    """linear sRGB -> (3, h, w) device signal under the ICC profile."""
    prof = parse_icc(icc)
    if prof["gray"]:
        raise ValueError("cannot target a gray ICC profile with RGB")
    m = np.linalg.inv(_xyz_matrix_to_srgb() @ prof["matrix"])
    lin = np.einsum("ij,jhw->ihw", m, planes)
    return np.stack([_curve_inverse(lin[c], prof["trc"][c])
                     for c in range(3)])
