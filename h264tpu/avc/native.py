"""ctypes bindings for the native AVC host stages (native/avc_native.cpp).

Two speed-of-light host paths for the TPU encoder pipeline, with the
Python twins (``avc/pack.py``, ``avc/deblock.py``) kept as the tested
reference implementations and automatic fallbacks:

* ``pack_slice`` — CAVLC slice RBSP packing of the device symbol arrays
* ``deblock_frame`` — spec 8.7 in-loop filter in MB-raster order

All VLC/filter tables are passed in from the Python single source of
truth (``entropy/cavlc.py``, ``avc/tables.py``, ``ops/deblock.py``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from ..entropy.cavlc import (COEFF_TOKEN_LEN, COEFF_TOKEN_CODE,
                             TOTAL_ZEROS_LEN, TOTAL_ZEROS_CODE,
                             RUN_BEFORE_LEN, RUN_BEFORE_CODE, INC_VLC)
from ..ops.deblock import ALPHA_TABLE, BETA_TABLE, CLIP_TAB
from . import tables as TBL
from .params import AVCParams, write_slice_header, SLICE_I, SLICE_P
from ..entropy.bitio import BitWriter

_HERE = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_HERE, "native")
_SO = os.path.join(_NATIVE_DIR, "libavc_native.so")

_lib = None
_tried = False

_I32P = ctypes.POINTER(ctypes.c_int32)
_U8P = ctypes.POINTER(ctypes.c_uint8)


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        src = os.path.join(_NATIVE_DIR, "avc_native.cpp")
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(src)):
            subprocess.run(["make", "-C", _NATIVE_DIR, "-s",
                            "libavc_native.so"],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.avc_pack_slice.restype = ctypes.c_int64
        lib.avc_pack_slice.argtypes = (
            [ctypes.c_int32] * 6 + [_U8P, ctypes.c_int64]
            + [_I32P] * 13 + [ctypes.c_int32]
            + [_I32P, _U8P, ctypes.c_int64])
        lib.avc_deblock_frame.restype = ctypes.c_int64
        lib.avc_deblock_frame.argtypes = (
            [_I32P] * 3 + [ctypes.c_int32] * 2
            + [_I32P, _U8P, _U8P, _I32P, _I32P, _I32P, _I32P, _I32P]
            + [ctypes.c_int32] * 3 + [_I32P] * 3)
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _i32(a):
    return np.ascontiguousarray(a, np.int32)


_TABLES = None


def _tables_buffer():
    """Table bundle; layout must match avc_native.cpp load_tabs."""
    global _TABLES
    if _TABLES is None:
        _TABLES = np.concatenate([
            _i32(COEFF_TOKEN_LEN).ravel(), _i32(COEFF_TOKEN_CODE).ravel(),
            _i32(TOTAL_ZEROS_LEN).ravel(), _i32(TOTAL_ZEROS_CODE).ravel(),
            _i32(RUN_BEFORE_LEN).ravel(), _i32(RUN_BEFORE_CODE).ravel(),
            _i32(TBL.CHROMA_DC_TOKEN_LEN).ravel(),
            _i32(TBL.CHROMA_DC_TOKEN_CODE).ravel(),
            _i32(TBL.CHROMA_DC_TZ_LEN).ravel(),
            _i32(TBL.CHROMA_DC_TZ_CODE).ravel(),
            _i32(TBL.CBP_TO_CODENUM_INTRA).ravel(),
            _i32(TBL.CBP_TO_CODENUM_INTER).ravel(),
            _i32(INC_VLC).ravel(),
            _i32(np.asarray(TBL.BLOCK_SCAN)[:, 0]).ravel(),
            _i32(np.asarray(TBL.BLOCK_SCAN)[:, 1]).ravel(),
        ])
    return _TABLES


def _ptr(a):
    return a.ctypes.data_as(_I32P)


def pack_slice(sym, p: AVCParams, slice_type: int, qp: int, frame_num: int,
               idr: bool, idr_pic_id: int, num_ref: int,
               row0: int = 0, n_rows: int = None, wp=None) -> bytes:
    """Native twin of pack.pack_i_slice / pack_p_slice (byte-identical)."""
    lib = _load()
    assert lib is not None
    mb_h, mb_w = p.mb_h, p.mb_w
    n_rows = mb_h - row0 if n_rows is None else n_rows
    hw = BitWriter()
    write_slice_header(hw, p, slice_type, frame_num, idr, qp,
                       idr_pic_id=idr_pic_id, first_mb=row0 * mb_w,
                       num_ref_idx_l0=num_ref if slice_type == SLICE_P else 1,
                       wp=wp)
    hdr = np.frombuffer(hw.to_bytes(), np.uint8)
    hdr_bits = hw.bit_length()

    arrs = [_i32(sym[k]) for k in
            ("win", "ri", "mvd", "i4flags", "i16mode", "i16dc", "cmode",
             "cbp_luma", "cbp_chroma", "zz", "cdc", "cac")]
    t8 = _i32(sym["t8"]) if "t8" in sym else \
        np.zeros(mb_h * mb_w, np.int32)
    cap = 4 * 1024 * 1024 + hdr_bits // 8
    out = np.zeros(cap, np.uint8)
    n = lib.avc_pack_slice(
        slice_type, mb_w, mb_h, row0, n_rows, num_ref,
        hdr.ctypes.data_as(_U8P), hdr_bits,
        *[_ptr(a) for a in arrs], _ptr(t8),
        ctypes.c_int32(1 if p.transform_8x8 else 0),
        _ptr(_tables_buffer()),
        out.ctypes.data_as(_U8P), cap)
    assert n > 0, "avc_pack_slice overflow"
    return out[:n].tobytes()


def deblock_frame(rec_y, rec_u, rec_v, ctx):
    """Native twin of avc.deblock.deblock_frame (bit-exact)."""
    lib = _load()
    assert lib is not None
    y = _i32(rec_y).copy()
    u = _i32(rec_u).copy()
    v = _i32(rec_v).copy()
    mb_qp = _i32(ctx.mb_qp)
    mb_intra = np.ascontiguousarray(ctx.mb_intra, np.uint8)
    t8 = np.ascontiguousarray(ctx.transform8, np.uint8)
    nnz = _i32(ctx.nnz)
    mv = _i32(ctx.mv)
    ref = _i32(ctx.ref)
    two_list = ctx.ref1 is not None
    mv1 = _i32(ctx.mv1) if two_list else mv
    ref1 = _i32(ctx.ref1) if two_list else ref
    r1p = _ptr(ref1) if two_list else ctypes.cast(None, _I32P)
    lib.avc_deblock_frame(
        _ptr(y), _ptr(u), _ptr(v), ctx.mb_w, ctx.mb_h,
        _ptr(mb_qp), mb_intra.ctypes.data_as(_U8P),
        t8.ctypes.data_as(_U8P), _ptr(nnz), _ptr(mv),
        _ptr(ref), _ptr(mv1), r1p,
        ctx.chroma_qp_offset, ctx.alpha_off, ctx.beta_off,
        _ptr(_i32(ALPHA_TABLE)), _ptr(_i32(BETA_TABLE)),
        _ptr(_i32(CLIP_TAB)))
    return y.astype(np.int64), u.astype(np.int64), v.astype(np.int64)
