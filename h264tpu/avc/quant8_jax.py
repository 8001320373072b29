"""8x8 integer transform + quantization (High-profile core, on device).

JM-18.5-exact math for the 8x8 path, batched over ``[..., 8, 8]``
blocks: the forward/inverse butterflies of
``JM/lcommon/src/transform.c:353`` forward8x8 / ``:451`` inverse8x8, the
Q_BITS_8 = 16 quantizer of ``JM/lencod/src/quant8x8_normal.c`` with the
Rec. H.264 LevelScale8x8 tables (``avc/tables8.py``), and the decoder's
``(x + 32) >> 6`` reconstruction rounding (``JM/ldecod/src/
transform8x8.c`` itrans8x8).  Round-5 groundwork for the High-profile
transform-size-8x8 coding path; the butterflies are golden-tested
against the reference C compiled directly (tests/test_transform8.py).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .tables8 import QUANT_COEF8, DEQUANT_COEF8

Q_BITS_8 = 16
OFFSET8_INTRA = 682          # Q11, same defaults as the 4x4 lists
OFFSET8_INTER = 342

_MF8 = jnp.asarray(np.asarray(QUANT_COEF8, np.int64))
_V8 = jnp.asarray(np.asarray(DEQUANT_COEF8, np.int64))


def _fwd_1d(p):
    """One forward8x8 butterfly along the last axis (p: [..., 8])."""
    p0, p1, p2, p3 = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    p4, p5, p6, p7 = p[..., 4], p[..., 5], p[..., 6], p[..., 7]
    a0 = p0 + p7
    a1 = p1 + p6
    a2 = p2 + p5
    a3 = p3 + p4
    b0 = a0 + a3
    b1 = a1 + a2
    b2 = a0 - a3
    b3 = a1 - a2
    a0 = p0 - p7
    a1 = p1 - p6
    a2 = p2 - p5
    a3 = p3 - p4
    b4 = a1 + a2 + ((a0 >> 1) + a0)
    b5 = a0 - a3 - ((a2 >> 1) + a2)
    b6 = a0 + a3 - ((a1 >> 1) + a1)
    b7 = a1 - a2 + ((a3 >> 1) + a3)
    return jnp.stack([b0 + b1, b4 + (b7 >> 2), b2 + (b3 >> 1),
                      b5 + (b6 >> 2), b0 - b1, b6 - (b5 >> 2),
                      (b2 >> 1) - b3, (b4 >> 2) - b7], axis=-1)


def _inv_1d(p):
    """One inverse8x8 butterfly along the last axis."""
    p0, p1, p2, p3 = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    p4, p5, p6, p7 = p[..., 4], p[..., 5], p[..., 6], p[..., 7]
    a0 = p0 + p4
    a1 = p0 - p4
    a2 = p6 - (p2 >> 1)
    a3 = p2 + (p6 >> 1)
    b0 = a0 + a3
    b2 = a1 - a2
    b4 = a1 + a2
    b6 = a0 - a3
    a0 = -p3 + p5 - p7 - (p7 >> 1)
    a1 = p1 + p7 - p3 - (p3 >> 1)
    a2 = -p1 + p7 + p5 + (p5 >> 1)
    a3 = p3 + p5 + p1 + (p1 >> 1)
    b1 = a0 + (a3 >> 2)
    b3 = a1 + (a2 >> 2)
    b5 = a2 - (a1 >> 2)
    b7 = a3 - (a0 >> 2)
    return jnp.stack([b0 + b7, b2 - b5, b4 + b3, b6 + b1,
                      b6 - b1, b4 - b3, b2 + b5, b0 - b7], axis=-1)


def fdct8x8(x):
    """forward8x8 of [..., 8, 8] residual blocks (rows then columns)."""
    x = jnp.asarray(x, jnp.int32)
    t = _fwd_1d(x)                               # horizontal
    t = jnp.swapaxes(_fwd_1d(jnp.swapaxes(t, -1, -2)), -1, -2)
    return t


def idct8x8(w):
    """inverse8x8 of [..., 8, 8] dequantized coefficients (no final
    rounding — see :func:`reconstruct8`)."""
    w = jnp.asarray(w, jnp.int32)
    t = _inv_1d(w)                               # horizontal
    t = jnp.swapaxes(_inv_1d(jnp.swapaxes(t, -1, -2)), -1, -2)
    return t


def quant8x8(w, qp, intra: bool, offsets=None, mf=None):
    """quant_8x8_normal: level = (|w|*MF8 + off<<(qbits-11)) >> qbits,
    qbits = 16 + qp//6.  ``offsets``: optional adaptive-rounding [8,8]
    state in Q11 (JVT-N011 8x8 twin).  ``mf``: optional weighted
    [6, 8, 8] LevelScale8x8 ((quant_coef8 << 4) // qmatrix)."""
    qp = jnp.asarray(qp, jnp.int32)
    per, rem = qp // 6, qp % 6
    if offsets is None:
        off = jnp.int32(OFFSET8_INTRA if intra else OFFSET8_INTER)
    else:
        off = offsets.astype(jnp.int32)
    off = off << (5 + per)                       # Q11 -> qbits scale
    mfr = _MF8[rem] if mf is None else mf[rem]
    lev = (jnp.abs(w) * mfr + off) >> (Q_BITS_8 + per)
    return jnp.sign(w) * lev


def dequant8x8(lev, qp, ils=None):
    """rshift_rnd_sf((level * (V8 << 4)) << per, 6); weighted ``ils``
    [6, 8, 8] = dequant_coef8 * qmatrix (== V8 << 4 at qmatrix 16)."""
    qp = jnp.asarray(qp, jnp.int32)
    per, rem = qp // 6, qp % 6
    v8 = (_V8[rem] << 4) if ils is None else ils[rem]
    v = (lev * v8) << per
    return (v + 32) >> 6


def reconstruct8(pred, iwt):
    """Decoder rounding: clip(pred + (inverse + 32) >> 6)."""
    return jnp.clip(pred + ((iwt + 32) >> 6), 0, 255)


# 8x8 zig-zag scan (spec Table 8-8 / JM SNGL_SCAN8x8), generated
def _zigzag8():
    order = sorted(((y, x) for y in range(8) for x in range(8)),
                   key=lambda p: (p[0] + p[1],
                                  p[1] if (p[0] + p[1]) % 2 == 0 else p[0]))
    return np.array([y * 8 + x for (y, x) in order], np.int64)


ZIGZAG8_FLAT = _zigzag8()
_ZZ8 = jnp.asarray(ZIGZAG8_FLAT)


def zigzag8(levels):
    return levels.reshape(*levels.shape[:-2], 64)[..., _ZZ8]
