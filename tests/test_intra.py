"""Tests for the wavefront 4x4 intra engine."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from h264tpu.ops import intra as I
from h264tpu.ops import transform as T


def test_wavefront_schedule_covers_all():
    by, bx, ok = I.wavefront_schedule(6, 8)
    seen = set()
    for s in range(by.shape[0]):
        for m in range(by.shape[1]):
            if ok[s, m]:
                b = (int(by[s, m]), int(bx[s, m]))
                # dependencies processed earlier
                assert b not in seen
                seen.add(b)
                for dep in [(b[0], b[1] - 1), (b[0] - 1, b[1]),
                            (b[0] - 1, b[1] + 1)]:
                    if 0 <= dep[0] < 6 and 0 <= dep[1] < 8:
                        assert dep in seen or dep == b, (b, dep)
    assert len(seen) == 48


def oracle_pred(mode, A, L):
    """Scalar spec implementation of one 4x4 prediction (available nbrs)."""
    corner, top8, left = int(A[0]), [int(v) for v in A[1:]], [int(v) for v in L]

    def P(i):
        return corner if i == -1 else top8[i]

    def Lp(i):
        return corner if i == -1 else left[i]

    out = np.zeros((4, 4), np.int64)
    for r in range(4):
        for c in range(4):
            if mode == I.VERT:
                v = P(c)
            elif mode == I.HOR:
                v = Lp(r)
            elif mode == I.DC:
                v = (sum(top8[:4]) + sum(left) + 4) >> 3
            elif mode == I.DIAG_DL:
                i = r + c
                v = ((P(6) + 3 * P(7) + 2) >> 2 if i == 6 else
                     (P(i) + 2 * P(i + 1) + P(i + 2) + 2) >> 2)
            elif mode == I.DIAG_DR:
                if c > r:
                    i = c - r
                    v = (P(i - 2) + 2 * P(i - 1) + P(i) + 2) >> 2
                elif c < r:
                    i = r - c
                    v = (Lp(i - 2) + 2 * Lp(i - 1) + Lp(i) + 2) >> 2
                else:
                    v = (P(0) + 2 * corner + Lp(0) + 2) >> 2
            elif mode == I.VERT_R:
                z = 2 * c - r
                i = c - (r >> 1)
                if z >= 0 and z % 2 == 0:
                    v = (P(i - 1) + P(i) + 1) >> 1
                elif z >= 0:
                    v = (P(i - 2) + 2 * P(i - 1) + P(i) + 2) >> 2
                elif z == -1:
                    v = (Lp(0) + 2 * corner + P(0) + 2) >> 2
                else:
                    j = r - 2 * c
                    v = (Lp(j - 1) + 2 * Lp(j - 2) + Lp(j - 3) + 2) >> 2
            elif mode == I.HOR_D:
                z = 2 * r - c
                i = r - (c >> 1)
                if z >= 0 and z % 2 == 0:
                    v = (Lp(i - 1) + Lp(i) + 1) >> 1
                elif z >= 0:
                    v = (Lp(i - 2) + 2 * Lp(i - 1) + Lp(i) + 2) >> 2
                elif z == -1:
                    v = (P(0) + 2 * corner + Lp(0) + 2) >> 2
                else:
                    j = c - 2 * r
                    v = (P(j - 1) + 2 * P(j - 2) + P(j - 3) + 2) >> 2
            elif mode == I.VERT_L:
                i = c + (r >> 1)
                v = ((P(i) + P(i + 1) + 1) >> 1 if r % 2 == 0 else
                     (P(i) + 2 * P(i + 1) + P(i + 2) + 2) >> 2)
            else:  # HOR_U
                z = c + 2 * r
                i = r + (c >> 1)
                if z > 5:
                    v = Lp(3)
                elif z == 5:
                    v = (Lp(2) + 3 * Lp(3) + 2) >> 2
                elif z % 2 == 0:
                    v = (Lp(i) + Lp(i + 1) + 1) >> 1
                else:
                    v = (Lp(i) + 2 * Lp(i + 1) + Lp(i + 2) + 2) >> 2
            out[r, c] = v
    return out


def test_predictions_match_spec_oracle(rng):
    M = 16
    A = jnp.asarray(rng.integers(0, 256, (M, 9)), jnp.int32)
    L = jnp.asarray(rng.integers(0, 256, (M, 4)), jnp.int32)
    t = jnp.ones((M,), bool)
    preds, allowed = I.predict_modes_4x4(A, L, t, t, t)
    preds = np.asarray(preds)
    assert np.asarray(allowed).all()
    for m in range(M):
        for mode in range(9):
            np.testing.assert_array_equal(
                preds[m, mode], oracle_pred(mode, np.asarray(A[m]), np.asarray(L[m])),
                err_msg=f"mode {mode} block {m}")


def test_encode_decode_bit_exact(rng):
    H, W, qp = 48, 64, 28
    org = jnp.asarray(rng.integers(0, 256, (H, W)), jnp.int32)
    modes, zz, rec = jax.jit(functools.partial(I.encode_plane, qp=qp))(org)
    rec2 = jax.jit(functools.partial(I.decode_plane, H=H, W=W, qp=qp))(modes, zz)
    np.testing.assert_array_equal(np.asarray(rec2), np.asarray(rec))


def test_intra_quality(foreman_qcif):
    from h264tpu.utils.yuv import psnr
    y, _, _ = foreman_qcif.read(0)
    org = jnp.asarray(y, jnp.int32)
    for qp, min_psnr in ((28, 36.0), (36, 30.0)):
        _, _, rec = jax.jit(functools.partial(I.encode_plane, qp=qp))(org)
        p = psnr(np.asarray(rec), y)
        assert p > min_psnr, (qp, p)
