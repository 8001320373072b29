"""JM-18.5-exact forward/inverse transform + quantization on device (JAX).

jnp twins of :mod:`h264tpu.avc.quant` (the numpy host conformance model),
batched over ``[..., 4, 4]`` blocks with traced QP scalars so rate control
can change QP per frame without recompiling.  Semantics references:
``JM/lencod/src/quant4x4_normal.c:31``, ``quant4x4_normal.c:200`` (DC),
``JM/lcommon/src/transform.c`` hadamard4x4, ``JM/ldecod/src/block.c:353``
itrans_2, ``quantChroma_normal.c`` (chroma DC).

Note these differ from :mod:`h264tpu.ops.transform` (the FVC path), which
replicates JM *8.6* constants (offset /3 for both intra and inter, no level
limit); the conformant path uses the 18.5 offsets 682/342 in Q11 and the
CAVLC level clamp.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops.transform import (CF, QUANT_COEF, DEQUANT_COEF, ZIGZAG_FLAT,
                             ZIGZAG_INV, _QP_SCALE_CR_TAIL, idct4x4,
                             reconstruct)  # noqa: F401  (re-exported)

Q_BITS = 15
OFFSET_INTRA = 682
OFFSET_INTER = 342
CAVLC_LEVEL_LIMIT = 2063

_CF = jnp.asarray(CF)
_H4 = jnp.asarray(np.array([[1, 1, 1, 1], [1, 1, -1, -1],
                            [1, -1, -1, 1], [1, -1, 1, -1]], np.int32))
_MF = jnp.asarray(QUANT_COEF)
_V = jnp.asarray(DEQUANT_COEF)
_ZZ = jnp.asarray(ZIGZAG_FLAT)
_ZZI = jnp.asarray(ZIGZAG_INV)
_CR_TAIL = jnp.asarray(_QP_SCALE_CR_TAIL)


def chroma_qp(qp, offset: int = 0):
    q = jnp.clip(jnp.asarray(qp, jnp.int32) + offset, 0, 51)
    return jnp.where(q < 30, q, _CR_TAIL[jnp.maximum(q - 30, 0)])


def fdct4x4(x):
    return jnp.einsum("ij,...jk,lk->...il", _CF, x.astype(jnp.int32), _CF)


def quant4x4(w, qp, intra, offsets=None, mf=None):
    """intra: static bool.  ``offsets``: optional [4, 4] int32 rounding
    offsets in Q11 (JVT-N011 adaptive rounding state; OffsetBits=11 as
    ``JM/lencod/src/q_offsets.c``); None = the fixed 682/342 defaults
    (``quant4x4_normal.c``).  ``mf``: optional [6, 4, 4] weighted
    LevelScale table ((quant_coef << 4) // qmatrix, JM q_matrix.c) for
    High-profile scaling lists; None = the flat tables."""
    qp = jnp.asarray(qp, jnp.int32)
    per, rem = qp // 6, qp % 6
    if offsets is None:
        off = jnp.int32(OFFSET_INTRA if intra else OFFSET_INTER) << (4 + per)
    else:
        off = offsets.astype(jnp.int32) << (4 + per)
    mf = _MF[rem] if mf is None else mf[rem]
    lev = (jnp.abs(w) * mf + off) >> (Q_BITS + per)
    lev = jnp.minimum(lev, CAVLC_LEVEL_LIMIT)
    return jnp.sign(w) * lev


AR_WEIGHT = 8          # JM AdaptRndWeight default
AR_RANGE = 1024        # 1 << (OffsetBits - 1)


def ar_fadjust(w, lev, qp, mf=None):
    """JVT-N011 per-position rounding adjustment (quant4x4_around.c:96):
    rshift_rnd_sf(W * (scaled - (level << q_bits)), q_bits + 1) where the
    coefficient was quantized to a nonzero level, else 0.

    w / lev: [..., 4, 4] transform coefficients and signed levels;
    returns [..., 4, 4] int32 adjustments (caller sums over blocks and
    adds to the Q11 offset state, clipped to [0, AR_RANGE])."""
    qp = jnp.asarray(qp, jnp.int32)
    per, rem = qp // 6, qp % 6
    qbits = Q_BITS + per
    la = jnp.abs(lev)
    scaled = jnp.abs(w) * (_MF[rem] if mf is None else mf[rem])
    diff = AR_WEIGHT * (scaled - (la << qbits))
    adj = (diff + (jnp.int32(1) << qbits)) >> (qbits + 1)
    return jnp.where((w != 0) & (la != 0), adj, 0)


def dequant4x4(lev, qp, ils=None):
    """Flat: (lev * V) << per.  Weighted (``ils`` [6, 4, 4] =
    dequant_coef * qmatrix): rshift_rnd_sf((lev * ILS) << per, 4) —
    identical at qmatrix == 16."""
    qp = jnp.asarray(qp, jnp.int32)
    per, rem = qp // 6, qp % 6
    if ils is None:
        return (lev * _V[rem]) << per
    return (((lev * ils[rem]) << per) + 8) >> 4


def zigzag(levels):
    return levels.reshape(*levels.shape[:-2], 16)[..., _ZZ]


def unzigzag(zz):
    return zz[..., _ZZI].reshape(*zz.shape[:-1], 4, 4)


def hadamard4x4_fwd(dc):
    t = jnp.einsum("ij,...jk,lk->...il", _H4, dc.astype(jnp.int32), _H4)
    return t >> 1


def quant_dc16(h, qp, mf4=None):
    qp = jnp.asarray(qp, jnp.int32)
    per, rem = qp // 6, qp % 6
    mf = _MF[rem, 0, 0] if mf4 is None else mf4[rem, 0, 0]
    off = jnp.int32(OFFSET_INTRA) << (4 + per)
    lev = (jnp.abs(h) * mf + (off << 1)) >> (Q_BITS + per + 1)
    lev = jnp.minimum(lev, CAVLC_LEVEL_LIMIT)
    return jnp.sign(h) * lev


def dequant_dc16(lev, qp, ils=None):
    qp = jnp.asarray(qp, jnp.int32)
    per, rem = qp // 6, qp % 6
    m6 = jnp.einsum("ij,...jk,lk->...il", _H4, lev.astype(jnp.int32), _H4)
    v16 = _V[rem, 0, 0] * 16 if ils is None else ils[rem, 0, 0]
    return (((m6 * v16) << per) + 32) >> 6


def hadamard2x2_fwd(dc):
    """dc [..., 2, 2] -> [..., 4] coding order."""
    d = dc.astype(jnp.int32)
    a, b, c, e = d[..., 0, 0], d[..., 0, 1], d[..., 1, 0], d[..., 1, 1]
    return jnp.stack([a + b + c + e, a - b + c - e, a + b - c - e,
                      a - b - c + e], axis=-1)


def quant_dc_chroma(h, qpc, intra, mf4=None):
    qpc = jnp.asarray(qpc, jnp.int32)
    per, rem = qpc // 6, qpc % 6
    mf = _MF[rem, 0, 0] if mf4 is None else mf4[rem, 0, 0]
    off = jnp.int32(OFFSET_INTRA if intra else OFFSET_INTER) << (4 + per)
    lev = (jnp.abs(h) * mf + (off << 1)) >> (Q_BITS + per + 1)
    lev = jnp.minimum(lev, CAVLC_LEVEL_LIMIT)
    return jnp.sign(h) * lev


def dequant_dc_chroma(lev, qpc, ils=None):
    """[..., 4] levels -> [..., 2, 2] dequantized DC."""
    qpc = jnp.asarray(qpc, jnp.int32)
    per, rem = qpc // 6, qpc % 6
    l0, l1, l2, l3 = (lev[..., i].astype(jnp.int32) for i in range(4))
    t = jnp.stack([l0 + l1 + l2 + l3, l0 - l1 + l2 - l3,
                   l0 + l1 - l2 - l3, l0 - l1 - l2 + l3], axis=-1)
    v16 = _V[rem, 0, 0] * 16 if ils is None else ils[rem, 0, 0]
    out = ((t * v16) << per) >> 5
    return out.reshape(*lev.shape[:-1], 2, 2)
