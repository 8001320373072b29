"""ctypes bindings for the native host bit machinery (native/fvc_native.cpp).

Transparently builds the shared library on first use (g++, ~1s) and falls
back to the pure-Python paths when a toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_HERE, "native")
_SO = os.path.join(_NATIVE_DIR, "libfvc_native.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) <
                os.path.getmtime(os.path.join(_NATIVE_DIR, "fvc_native.cpp"))):
            subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.cavlc_decode_plane.restype = ctypes.c_int64
        lib.cavlc_decode_plane.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
        lib.cavlc_encode_plane.restype = ctypes.c_int64
        lib.cavlc_encode_plane.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32)]
        lib.cabac_encode_plane.restype = ctypes.c_int64
        lib.cabac_encode_plane.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8)]
        lib.cabac_decode_plane.restype = ctypes.c_int64
        lib.cabac_decode_plane.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8)]
        lib.resolve_intra_modes.restype = None
        lib.resolve_intra_modes.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _u8(a):
    return np.ascontiguousarray(a, dtype=np.uint8).ctypes.data_as(
        ctypes.POINTER(ctypes.c_uint8))


def _i32(a):
    return np.ascontiguousarray(a, dtype=np.int32).ctypes.data_as(
        ctypes.POINTER(ctypes.c_int32))


_tables = None


def _get_tables():
    global _tables
    if _tables is None:
        from . import cavlc as C
        _tables = (
            np.ascontiguousarray(C.COEFF_TOKEN_LEN, np.uint8),
            np.ascontiguousarray(C.COEFF_TOKEN_CODE, np.int32),
            np.ascontiguousarray(C.TOTAL_ZEROS_LEN, np.uint8),
            np.ascontiguousarray(C.TOTAL_ZEROS_CODE, np.int32),
            np.ascontiguousarray(C.RUN_BEFORE_LEN, np.uint8),
            np.ascontiguousarray(C.RUN_BEFORE_CODE, np.int32),
        )
    return _tables


def cavlc_decode_plane(data: bytes, nbits: int, bitpos: int, cy: int, cx: int):
    """Returns (zz [cy*cx,16] int64, new_bitpos) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    tl, tc, zl, zc, rl, rc = _get_tables()
    zz = np.zeros((cy * cx, 16), np.int32)
    scratch = np.zeros(cy * cx, np.int32)
    newpos = lib.cavlc_decode_plane(
        data, nbits, bitpos, cy, cx, _u8(tl), _i32(tc), _u8(zl), _i32(zc),
        _u8(rl), _i32(rc), zz.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        scratch.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if newpos < 0:
        raise ValueError("native CAVLC decode error")
    return zz.astype(np.int64), int(newpos)


_cabac_tables = None


def _get_cabac_tables():
    global _cabac_tables
    if _cabac_tables is None:
        from . import cabac_eng as C
        _cabac_tables = (
            np.ascontiguousarray(C.RLPS_64x4, np.uint8),
            np.ascontiguousarray(C.NEXT_MPS, np.uint8),
            np.ascontiguousarray(C.NEXT_LPS, np.uint8),
        )
    return _cabac_tables


def cavlc_encode_plane(zz: np.ndarray, cy: int, cx: int):
    """Returns (codes, lens) int64 arrays (zero-len entries included; the
    caller masks), or None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    tl, tc, zl, zc, rl, rc = _get_tables()
    zz32 = np.ascontiguousarray(zz, np.int32)
    n = cy * cx
    codes = np.zeros(n * 36, np.int64)
    lens = np.zeros(n * 36, np.int64)
    scratch = np.zeros(n, np.int32)
    lib.cavlc_encode_plane(
        zz32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cy, cx,
        _u8(tl), _i32(tc), _u8(zl), _i32(zc), _u8(rl), _i32(rc),
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        scratch.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return codes, lens


def cabac_encode_plane(zz: np.ndarray, cy: int, cx: int):
    """Returns encoded bytes, or None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    rlps, nmps, nlps = _get_cabac_tables()
    zz32 = np.ascontiguousarray(np.asarray(zz).reshape(-1), np.int32)
    cap = max(4096, zz32.size * 8)
    out = np.zeros(cap, np.uint8)
    scratch = np.zeros(cy * cx, np.uint8)
    n = lib.cabac_encode_plane(
        zz32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cy, cx,
        _u8(rlps), _u8(nmps), _u8(nlps),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
        scratch.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if n < 0:
        raise ValueError("native CABAC encode overflow")
    return out[:n].tobytes()


def cabac_decode_plane(data: bytes, cy: int, cx: int):
    """Returns zz [cy*cx,16] int64, or None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    rlps, nmps, nlps = _get_cabac_tables()
    zz = np.zeros(cy * cx * 16, np.int32)
    scratch = np.zeros(cy * cx, np.uint8)
    rc = lib.cabac_decode_plane(
        data, len(data), cy, cx, _u8(rlps), _u8(nmps), _u8(nlps),
        zz.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        scratch.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc < 0:
        raise ValueError("native CABAC decode error")
    return zz.reshape(cy * cx, 16).astype(np.int64)


def resolve_intra_modes(flags: np.ndarray, rem: np.ndarray, cy: int, cx: int):
    lib = _load()
    if lib is None:
        return None
    modes = np.zeros(cy * cx, np.int32)
    flags8 = np.ascontiguousarray(flags.reshape(-1), np.uint8)
    rem8 = np.ascontiguousarray(rem, np.uint8)
    lib.resolve_intra_modes(
        flags8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        rem8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cy, cx, modes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return modes.reshape(cy, cx).astype(np.int64)
