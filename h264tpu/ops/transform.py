"""H.264 4x4 integer transform + quantization, batched for TPU.

Bit-exact re-expression of the JM 8.6 kernels used by the reference codec
(``FR/src/block.c:836`` dct_luma, ``:535`` dct_luma_16x16, ``:1065`` dct_chroma,
quant tables at ``FR/src/block.c:60-76``) as shape-``[..., 4, 4]`` batched JAX
ops.  Everything is int32; the butterflies are elementwise adds/shifts (VPU) and
the forward core is a pair of small matmuls.  There is no per-block Python loop
anywhere — callers reshape a frame into ``[N, 4, 4]`` blocks and transform all
of them in one fused XLA computation.

Conventions: blocks are row-major ``x[row, col]``.  The reference stores
``m7[x][y]`` (column-major); the 2-D transform and the quant tables are
symmetric under transpose, so results agree elementwise.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# Forward core matrix Cf (H.264 spec 8.6.2 / JM "horizontal transform" butterflies).
CF = np.array(
    [[1, 1, 1, 1],
     [2, 1, -1, -2],
     [1, -1, -1, 1],
     [1, -2, 2, -1]], dtype=np.int32)

# Quantization multiplier table MF[qp%6][i][j] (FR/src/block.c:60).
QUANT_COEF = np.array([
    [[13107, 8066, 13107, 8066], [8066, 5243, 8066, 5243],
     [13107, 8066, 13107, 8066], [8066, 5243, 8066, 5243]],
    [[11916, 7490, 11916, 7490], [7490, 4660, 7490, 4660],
     [11916, 7490, 11916, 7490], [7490, 4660, 7490, 4660]],
    [[10082, 6554, 10082, 6554], [6554, 4194, 6554, 4194],
     [10082, 6554, 10082, 6554], [6554, 4194, 6554, 4194]],
    [[9362, 5825, 9362, 5825], [5825, 3647, 5825, 3647],
     [9362, 5825, 9362, 5825], [5825, 3647, 5825, 3647]],
    [[8192, 5243, 8192, 5243], [5243, 3355, 5243, 3355],
     [8192, 5243, 8192, 5243], [5243, 3355, 5243, 3355]],
    [[7282, 4559, 7282, 4559], [4559, 2893, 4559, 2893],
     [7282, 4559, 7282, 4559], [4559, 2893, 4559, 2893]],
], dtype=np.int32)

# Dequantization table V[qp%6][i][j] (FR/src/block.c:69).
DEQUANT_COEF = np.array([
    [[10, 13, 10, 13], [13, 16, 13, 16], [10, 13, 10, 13], [13, 16, 13, 16]],
    [[11, 14, 11, 14], [14, 18, 14, 18], [11, 14, 11, 14], [14, 18, 14, 18]],
    [[13, 16, 13, 16], [16, 20, 16, 20], [13, 16, 13, 16], [16, 20, 16, 20]],
    [[14, 18, 14, 18], [18, 23, 18, 23], [14, 18, 14, 18], [18, 23, 18, 23]],
    [[16, 20, 16, 20], [20, 25, 20, 25], [16, 20, 16, 20], [20, 25, 20, 25]],
    [[18, 23, 18, 23], [23, 29, 23, 29], [18, 23, 18, 23], [23, 29, 23, 29]],
], dtype=np.int32)

Q_BITS = 15
DQ_BITS = 6
DQ_ROUND = 1 << (DQ_BITS - 1)

# Zig-zag scan (row, col) order for frame coding (JM SNGL_SCAN, FR/src/block.c).
ZIGZAG_4x4 = np.array(
    [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
     (2, 1), (3, 0), (3, 1), (2, 2), (1, 3), (2, 3), (3, 2), (3, 3)],
    dtype=np.int32)
# flat index (row*4+col) per scan position
ZIGZAG_FLAT = ZIGZAG_4x4[:, 0] * 4 + ZIGZAG_4x4[:, 1]
# inverse: scan position of each flat index
ZIGZAG_INV = np.argsort(ZIGZAG_FLAT).astype(np.int32)


def fdct4x4(x: jnp.ndarray) -> jnp.ndarray:
    """Forward 4x4 integer transform W = Cf @ X @ Cf^T over [..., 4, 4] int32."""
    cf = jnp.asarray(CF)
    return jnp.einsum("ij,...jk,lk->...il", cf, x.astype(jnp.int32), cf)


def quant4x4(w: jnp.ndarray, qp, intra: bool = False) -> jnp.ndarray:
    """Quantize transform coefficients.

    ``level = sign(w) * ((|w| * MF[qp%6] + qp_const) >> q_bits)``.
    The reference codec uses ``qp_const = (1<<q_bits)/3`` for BOTH intra and
    inter (``FR/src/block.c:862-865`` has /3 in both branches); we keep an
    ``intra`` arg for future JM-18.5 parity (which uses /6 for inter) but
    default to the reference behavior.  ``qp`` may be a Python int or a
    traced int32 scalar (rate control changes it per frame without
    recompiling).
    """
    del intra  # reference uses the intra constant unconditionally
    qp = jnp.asarray(qp, jnp.int32)
    qp_per, qp_rem = qp // 6, qp % 6
    q_bits = Q_BITS + qp_per
    qp_const = (jnp.int32(1) << q_bits) // 3
    mf = jnp.asarray(QUANT_COEF)[qp_rem]
    lev = (jnp.abs(w) * mf + qp_const) >> q_bits
    return jnp.sign(w) * lev


def dequant4x4(level: jnp.ndarray, qp) -> jnp.ndarray:
    """Dequantize: ``ilev = level * V[qp%6] << (qp//6)`` (FR/src/block.c:959)."""
    qp = jnp.asarray(qp, jnp.int32)
    qp_per, qp_rem = qp // 6, qp % 6
    v = jnp.asarray(DEQUANT_COEF)[qp_rem]
    return (level * v) << qp_per


def idct4x4(w: jnp.ndarray) -> jnp.ndarray:
    """Inverse 4x4 transform (JM butterflies with >>1), WITHOUT the final
    (x+32)>>6 normalization.  Input/output [..., 4, 4] int32.
    """
    w = w.astype(jnp.int32)

    def stage(m):  # operates on last axis of length 4
        m0, m1, m2, m3 = m[..., 0], m[..., 1], m[..., 2], m[..., 3]
        a = m0 + m2
        b = m0 - m2
        c = (m1 >> 1) - m3
        d = m1 + (m3 >> 1)
        return jnp.stack([a + d, b + c, b - c, a - d], axis=-1)

    # spec 8.5.12.2 order: rows first, then columns.  The truncating >>1
    # stages make the order observable whenever cof values are odd
    # (weighted-dequant streams / qp<6); JM matches only rows-first.
    t = stage(w)                                # transform rows
    t = jnp.swapaxes(stage(jnp.swapaxes(t, -1, -2)), -1, -2)  # columns
    return t


def reconstruct(pred: jnp.ndarray, idct_out: jnp.ndarray) -> jnp.ndarray:
    """clip(pred + (idct_out + 32) >> 6, 0, 255) — final stage of FR dct_luma.

    Exact split of JM's fused ``(m6 + (pred<<6) + 32) >> 6`` since
    ``(a + 64p) >> 6 == (a >> 6) + p`` for two's-complement arithmetic shift.
    """
    r = pred.astype(jnp.int32) + ((idct_out + DQ_ROUND) >> DQ_BITS)
    return jnp.clip(r, 0, 255)


def transform_quant_reconstruct(residual: jnp.ndarray, pred: jnp.ndarray, qp: int,
                                intra: bool = False):
    """Full residual coding path for a batch of 4x4 blocks.

    Returns (levels [...,4,4] in raster order, recon [...,4,4] uint8-range int32).
    This is the TPU equivalent of ``FR/src/block.c:836`` dct_luma run over every
    4x4 block of a frame at once.
    """
    w = fdct4x4(residual)
    lev = quant4x4(w, qp, intra)
    deq = dequant4x4(lev, qp)
    rec = reconstruct(pred, idct4x4(deq))
    return lev, rec


# ---------------------------------------------------------------------------
# Hadamard transforms for DC coefficients
# ---------------------------------------------------------------------------

H4 = np.array(
    [[1, 1, 1, 1],
     [1, 1, -1, -1],
     [1, -1, -1, 1],
     [1, -1, 1, -1]], dtype=np.int32)


def hadamard4x4_fwd(dc: jnp.ndarray) -> jnp.ndarray:
    """Forward 4x4 Hadamard on the 16 luma DC coefficients of an intra-16x16 MB
    with JM's /2 normalization (FR/src/block.c dct_luma_16x16: M6 stage then //2).
    """
    h = jnp.asarray(H4)
    t = jnp.einsum("ij,...jk,lk->...il", h, dc.astype(jnp.int32), h)
    # JM divides by 2 with rounding toward zero after the 2-D butterfly
    return jnp.sign(t) * (jnp.abs(t) >> 1)


def hadamard4x4_inv(dc: jnp.ndarray) -> jnp.ndarray:
    """Inverse 4x4 Hadamard (no normalization; caller applies JM scaling)."""
    h = jnp.asarray(H4)
    return jnp.einsum("ij,...jk,lk->...il", h, dc.astype(jnp.int32), h)


H2 = np.array([[1, 1], [1, -1]], dtype=np.int32)


def hadamard2x2(dc: jnp.ndarray) -> jnp.ndarray:
    """2x2 Hadamard for chroma DC (both directions are identical)."""
    h = jnp.asarray(H2)
    return jnp.einsum("ij,...jk,lk->...il", h, dc.astype(jnp.int32), h)


# ---------------------------------------------------------------------------
# Frame <-> block reshaping helpers
# ---------------------------------------------------------------------------

def frame_to_blocks(plane: jnp.ndarray, bs: int = 4) -> jnp.ndarray:
    """[H, W] -> [H//bs * W//bs, bs, bs] in raster block order."""
    h, w = plane.shape
    x = plane.reshape(h // bs, bs, w // bs, bs)
    return x.transpose(0, 2, 1, 3).reshape(-1, bs, bs)


def blocks_to_frame(blocks: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Inverse of :func:`frame_to_blocks`."""
    bs = blocks.shape[-1]
    x = blocks.reshape(h // bs, w // bs, bs, bs)
    return x.transpose(0, 2, 1, 3).reshape(h, w)


def zigzag_scan(levels: jnp.ndarray) -> jnp.ndarray:
    """[..., 4, 4] raster levels -> [..., 16] in zig-zag scan order."""
    flat = levels.reshape(*levels.shape[:-2], 16)
    return flat[..., jnp.asarray(ZIGZAG_FLAT)]


def zigzag_unscan(scanned: jnp.ndarray) -> jnp.ndarray:
    """[..., 16] zig-zag order -> [..., 4, 4] raster."""
    flat = scanned[..., jnp.asarray(ZIGZAG_INV)]
    return flat.reshape(*scanned.shape[:-1], 4, 4)


# ---------------------------------------------------------------------------
# Coefficient-cost thresholding (JM 8.6 LumaResidualCoding8x8 semantics,
# FR/src/macroblock.c:995-1166: COEFF_COST run table, level>1 => huge cost,
# drop an 8x8 block when its cost <= 4 and a whole MB when total <= 5)
# ---------------------------------------------------------------------------

COEFF_COST = np.array([3, 2, 2, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                      dtype=np.int32)
_LUMA_COEFF_COST_ = 4
_LUMA_MB_COEFF_COST_ = 5
_BIG_COST = np.int32(999999)


def coeff_cost_4x4(zz: jnp.ndarray) -> jnp.ndarray:
    """Cost of each 4x4 block from its zig-zag levels [..., 16] -> [...]."""
    nz = zz != 0
    idx = jnp.arange(16, dtype=jnp.int32)
    # index of the previous nonzero strictly before each position
    marked = jnp.where(nz, idx, jnp.int32(-1))
    prev_incl = jax.lax.cummax(marked, axis=zz.ndim - 1)
    prev_excl = jnp.concatenate(
        [jnp.full((*zz.shape[:-1], 1), -1, jnp.int32), prev_incl[..., :-1]], axis=-1)
    run = idx - prev_excl - 1
    per = jnp.where(jnp.abs(zz) > 1, _BIG_COST,
                    jnp.asarray(COEFF_COST)[jnp.clip(run, 0, 15)])
    return jnp.where(nz, per, 0).sum(axis=-1)


_QP_SCALE_CR_TAIL = np.array(
    [29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37,
     37, 38, 38, 38, 39, 39, 39, 39], dtype=np.int32)


def chroma_qp(qp, offset: int = 0):
    """Chroma QP mapping (H.264 Table 8-15 / JM QP_SCALE_CR).

    Accepts a Python int (returns int) or a traced scalar (returns traced).
    """
    if isinstance(qp, (int, np.integer)):
        q = min(max(qp + offset, 0), 51)
        return int(q if q < 30 else _QP_SCALE_CR_TAIL[q - 30])
    q = jnp.clip(qp + offset, 0, 51)
    return jnp.where(q < 30, q,
                     jnp.asarray(_QP_SCALE_CR_TAIL)[jnp.maximum(q - 30, 0)])


def residual_code_plane(org: jnp.ndarray, pred: jnp.ndarray, qp: int,
                        intra: bool = False, luma_mb_grid: bool = True):
    """Residual-code a whole plane against a prediction (fract or intra).

    The TPU form of ``process_oneframe`` luma coding (FR/src/image.c:852 ->
    LumaResidualCoding_fract -> dct_luma): 4x4 transform+quant of org-pred,
    8x8-level and MB-level coefficient-cost thresholding, reconstruction.

    Returns (levels_zz [H/4*W/4, 16] int32 in raster 4x4-block order,
             recon [H, W] int32).
    When ``luma_mb_grid`` the thresholding uses 8x8 groups within 16x16 MBs;
    for chroma planes we group 8x8 only (the chroma MB of a luma MB).
    """
    H, W = org.shape
    rb = frame_to_blocks(org.astype(jnp.int32) - pred.astype(jnp.int32), 4)
    w = fdct4x4(rb)
    lev = quant4x4(w, qp, intra)
    zz = zigzag_scan(lev)

    cost = coeff_cost_4x4(zz).reshape(H // 4, W // 4)
    # 8x8 groups: sum of the 2x2 cell group
    c8 = cost.reshape(H // 8, 2, W // 8, 2).sum(axis=(1, 3))
    drop8 = c8 <= _LUMA_COEFF_COST_
    kept8 = jnp.where(drop8, 0, c8)
    if luma_mb_grid:
        mb_cost = kept8.reshape(H // 16, 2, W // 16, 2).sum(axis=(1, 3))
        drop_mb = mb_cost <= _LUMA_MB_COEFF_COST_
        drop8 = drop8 | jnp.repeat(jnp.repeat(drop_mb, 2, 0), 2, 1)
    drop4 = jnp.repeat(jnp.repeat(drop8, 2, 0), 2, 1).reshape(-1)

    lev = jnp.where(drop4[:, None, None], 0, lev)
    zz = jnp.where(drop4[:, None], 0, zz)
    deq = dequant4x4(lev, qp)
    pb = frame_to_blocks(pred.astype(jnp.int32), 4)
    rec = reconstruct(pb, idct4x4(deq))
    return zz, blocks_to_frame(rec, H, W)
