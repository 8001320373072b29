"""Golden tests for the 4x4 integer transform/quant pipeline.

The oracle is an independent pure-Python/int implementation of the JM 8.6
algorithm (scalar loops, exact C semantics) — the JAX batched kernels must
match it elementwise.
"""

import numpy as np
import jax.numpy as jnp

from h264tpu.ops import transform as T


# ----------------------------------------------------------------------------
# Scalar oracle (independent re-implementation of FR/src/block.c:836 semantics)
# ----------------------------------------------------------------------------

def oracle_fdct(x):
    """2-D forward transform via explicit butterflies on a 4x4 int array."""
    x = [[int(v) for v in row] for row in x]
    # transform each column (vertical), matching W = Cf @ X @ Cf^T overall
    for j in range(4):
        col = [x[i][j] for i in range(4)]
        m5 = [col[0] + col[3], col[1] + col[2], col[1] - col[2], col[0] - col[3]]
        x[0][j] = m5[0] + m5[1]
        x[2][j] = m5[0] - m5[1]
        x[1][j] = m5[3] * 2 + m5[2]
        x[3][j] = m5[3] - m5[2] * 2
    for i in range(4):
        row = x[i]
        m5 = [row[0] + row[3], row[1] + row[2], row[1] - row[2], row[0] - row[3]]
        x[i][0] = m5[0] + m5[1]
        x[i][2] = m5[0] - m5[1]
        x[i][1] = m5[3] * 2 + m5[2]
        x[i][3] = m5[3] - m5[2] * 2
    return np.array(x, dtype=np.int64)


def oracle_quant(w, qp):
    qp_per, qp_rem = qp // 6, qp % 6
    q_bits = 15 + qp_per
    qp_const = (1 << q_bits) // 3
    out = np.zeros((4, 4), dtype=np.int64)
    for i in range(4):
        for j in range(4):
            lev = (abs(int(w[i][j])) * int(T.QUANT_COEF[qp_rem][i][j]) + qp_const) >> q_bits
            out[i][j] = lev if w[i][j] >= 0 else -lev
    return out


def oracle_dequant(lev, qp):
    qp_per, qp_rem = qp // 6, qp % 6
    out = np.zeros((4, 4), dtype=np.int64)
    for i in range(4):
        for j in range(4):
            ilev = (abs(int(lev[i][j])) * int(T.DEQUANT_COEF[qp_rem][i][j])) << qp_per
            out[i][j] = ilev if lev[i][j] >= 0 else -ilev
    return out


def oracle_idct_recon(w, pred):
    """JM inverse butterflies + fused (x + pred*64 + 32) >> 6 with clip."""
    w = [[int(v) for v in row] for row in w]
    # horizontal (rows)
    for i in range(4):
        m5 = w[i][:]
        m6 = [m5[0] + m5[2], m5[0] - m5[2], (m5[1] >> 1) - m5[3], m5[1] + (m5[3] >> 1)]
        w[i][0] = m6[0] + m6[3]
        w[i][3] = m6[0] - m6[3]
        w[i][1] = m6[1] + m6[2]
        w[i][2] = m6[1] - m6[2]
    out = np.zeros((4, 4), dtype=np.int64)
    for j in range(4):
        m5 = [w[i][j] for i in range(4)]
        m6 = [m5[0] + m5[2], m5[0] - m5[2], (m5[1] >> 1) - m5[3], m5[1] + (m5[3] >> 1)]
        col = [m6[0] + m6[3], m6[1] + m6[2], m6[1] - m6[2], m6[0] - m6[3]]
        for i in range(4):
            v = (col[i] + (int(pred[i][j]) << 6) + 32) >> 6
            out[i][j] = min(255, max(0, v))
    return out


def random_residual_blocks(rng, n):
    """Plausible residual range: org - pred in [-255, 255]."""
    return rng.integers(-255, 256, size=(n, 4, 4)).astype(np.int32)


def test_fdct_matches_oracle(rng):
    blocks = random_residual_blocks(rng, 64)
    got = np.asarray(T.fdct4x4(jnp.asarray(blocks)))
    for b in range(64):
        np.testing.assert_array_equal(got[b], oracle_fdct(blocks[b]))


def test_quant_dequant_matches_oracle(rng):
    blocks = random_residual_blocks(rng, 32)
    w = np.asarray(T.fdct4x4(jnp.asarray(blocks)))
    for qp in (0, 10, 24, 28, 35, 51):
        lev = np.asarray(T.quant4x4(jnp.asarray(w), qp))
        deq = np.asarray(T.dequant4x4(jnp.asarray(lev), qp))
        for b in range(32):
            np.testing.assert_array_equal(lev[b], oracle_quant(w[b], qp))
            np.testing.assert_array_equal(deq[b], oracle_dequant(lev[b], qp))


def test_full_residual_path_matches_oracle(rng):
    n = 48
    pred = rng.integers(0, 256, size=(n, 4, 4)).astype(np.int32)
    org = rng.integers(0, 256, size=(n, 4, 4)).astype(np.int32)
    residual = org - pred
    for qp in (16, 28, 40):
        lev, rec = T.transform_quant_reconstruct(
            jnp.asarray(residual), jnp.asarray(pred), qp)
        lev, rec = np.asarray(lev), np.asarray(rec)
        for b in range(n):
            w = oracle_fdct(residual[b])
            l0 = oracle_quant(w, qp)
            deq = oracle_dequant(l0, qp)
            r0 = oracle_idct_recon(deq, pred[b])
            np.testing.assert_array_equal(lev[b], l0)
            np.testing.assert_array_equal(rec[b], r0)


def test_lossless_at_low_qp():
    """At QP0 small residuals should survive the loop nearly intact."""
    pred = np.full((1, 4, 4), 128, np.int32)
    org = pred + np.arange(16).reshape(1, 4, 4).astype(np.int32) - 8
    lev, rec = T.transform_quant_reconstruct(jnp.asarray(org - pred), jnp.asarray(pred), 0)
    assert np.max(np.abs(np.asarray(rec) - org)) <= 1


def test_blocks_roundtrip(rng):
    plane = rng.integers(0, 256, size=(32, 48)).astype(np.int32)
    b = T.frame_to_blocks(jnp.asarray(plane), 4)
    back = np.asarray(T.blocks_to_frame(b, 32, 48))
    np.testing.assert_array_equal(back, plane)
    # raster order check: first block is top-left 4x4
    np.testing.assert_array_equal(np.asarray(b[0]), plane[:4, :4])
    np.testing.assert_array_equal(np.asarray(b[1]), plane[:4, 4:8])


def test_zigzag_roundtrip(rng):
    lev = rng.integers(-9, 9, size=(5, 4, 4)).astype(np.int32)
    z = T.zigzag_scan(jnp.asarray(lev))
    back = np.asarray(T.zigzag_unscan(z))
    np.testing.assert_array_equal(back, lev)
    # spec order spot-check
    one = np.arange(16).reshape(1, 4, 4)
    z1 = np.asarray(T.zigzag_scan(jnp.asarray(one)))[0]
    np.testing.assert_array_equal(
        z1, [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15])
