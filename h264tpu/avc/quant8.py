"""8x8 transform/quant — numpy twins for the host decoder/encoder paths.

Same JM-18.5-exact math as the device kernels in ``quant8_jax.py``
(forward8x8/inverse8x8 butterflies of ``JM/lcommon/src/transform.c:353``,
Q_BITS_8 = 16 quantizer of ``JM/lencod/src/quant8x8_normal.c``, decoder
rounding of ``JM/ldecod/src/transform8x8.c:81`` itrans8x8), operating on
``[..., 8, 8]`` numpy arrays.
"""

from __future__ import annotations

import numpy as np

from .tables8 import QUANT_COEF8, DEQUANT_COEF8
from .quant8_jax import ZIGZAG8_FLAT, Q_BITS_8, OFFSET8_INTRA, OFFSET8_INTER

_MF8 = np.asarray(QUANT_COEF8, np.int64)
_V8 = np.asarray(DEQUANT_COEF8, np.int64)
_ZZ8 = np.asarray(ZIGZAG8_FLAT, np.int64)
_ZZ8_INV = np.argsort(_ZZ8)


def _fwd_1d(p):
    p = np.moveaxis(p, -1, 0)
    a0, a1, a2, a3 = p[0] + p[7], p[1] + p[6], p[2] + p[5], p[3] + p[4]
    b0, b1, b2, b3 = a0 + a3, a1 + a2, a0 - a3, a1 - a2
    a0, a1, a2, a3 = p[0] - p[7], p[1] - p[6], p[2] - p[5], p[3] - p[4]
    b4 = a1 + a2 + ((a0 >> 1) + a0)
    b5 = a0 - a3 - ((a2 >> 1) + a2)
    b6 = a0 + a3 - ((a1 >> 1) + a1)
    b7 = a1 - a2 + ((a3 >> 1) + a3)
    out = np.stack([b0 + b1, b4 + (b7 >> 2), b2 + (b3 >> 1),
                    b5 + (b6 >> 2), b0 - b1, b6 - (b5 >> 2),
                    (b2 >> 1) - b3, (b4 >> 2) - b7])
    return np.moveaxis(out, 0, -1)


def _inv_1d(p):
    p = np.moveaxis(p, -1, 0)
    a0, a1 = p[0] + p[4], p[0] - p[4]
    a2, a3 = p[6] - (p[2] >> 1), p[2] + (p[6] >> 1)
    b0, b2, b4, b6 = a0 + a3, a1 - a2, a1 + a2, a0 - a3
    a0 = -p[3] + p[5] - p[7] - (p[7] >> 1)
    a1 = p[1] + p[7] - p[3] - (p[3] >> 1)
    a2 = -p[1] + p[7] + p[5] + (p[5] >> 1)
    a3 = p[3] + p[5] + p[1] + (p[1] >> 1)
    b1, b3 = a0 + (a3 >> 2), a1 + (a2 >> 2)
    b5, b7 = a2 - (a1 >> 2), a3 - (a0 >> 2)
    out = np.stack([b0 + b7, b2 - b5, b4 + b3, b6 + b1,
                    b6 - b1, b4 - b3, b2 + b5, b0 - b7])
    return np.moveaxis(out, 0, -1)


def fdct8x8(x):
    x = np.asarray(x, np.int64)
    t = _fwd_1d(x)
    return np.swapaxes(_fwd_1d(np.swapaxes(t, -1, -2)), -1, -2)


def idct8x8(w):
    w = np.asarray(w, np.int64)
    t = _inv_1d(w)
    return np.swapaxes(_inv_1d(np.swapaxes(t, -1, -2)), -1, -2)


def quant8x8(w, qp: int, intra: bool):
    per, rem = qp // 6, qp % 6
    off = (OFFSET8_INTRA if intra else OFFSET8_INTER) << (5 + per)
    lev = (np.abs(w) * _MF8[rem] + off) >> (Q_BITS_8 + per)
    return np.sign(w) * lev


def dequant8x8(lev, qp: int):
    per, rem = qp // 6, qp % 6
    v = (np.asarray(lev, np.int64) * (_V8[rem] << 4)) << per
    return (v + 32) >> 6


def reconstruct8(pred, iwt):
    return np.clip(pred + ((iwt + 32) >> 6), 0, 255)


def zigzag8(levels):
    return np.asarray(levels).reshape(*levels.shape[:-2], 64)[..., _ZZ8]


def unzigzag8(zz):
    return np.asarray(zz)[..., _ZZ8_INV].reshape(*zz.shape[:-1], 8, 8)
