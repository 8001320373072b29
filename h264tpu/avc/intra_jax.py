"""Spec-exact H.264 intra prediction on device (JAX, batched).

jnp twins of :mod:`h264tpu.avc.intra_pred` (numpy host model, spec
8.3.1/8.3.3/8.3.4).  The nine 4x4 directional modes are expressed as one
table-driven weighted gather over the 13-sample neighbor vector
``s = [corner, top0..7, left0..3]`` — the (index, weight, round, shift)
tables are built at import time by replaying the spec formulas, so there is
exactly one source of truth for the arithmetic and the batched form is a
single ``(s[..., IDX] * W).sum(-1)`` per mode.

Availability flags are traced booleans (per-MB, inside the encoder scan);
disallowed modes return garbage predictions and must be masked by cost.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# mode numbers (spec 8.3.1.1 / 8.3.3 / 8.3.4) — match avc.intra_pred
VERT, HOR, DC, DIAG_DL, DIAG_DR, VERT_R, HOR_D, VERT_L, HOR_U = range(9)
I16_V, I16_H, I16_DC, I16_PLANE = range(4)
CH_DC, CH_H, CH_V, CH_PLANE = range(4)


def _build_i4_tables():
    """-> IDX [9,16,3] int32, W [9,16,3], RND [9,16], SH [9,16].

    DC (mode 2) rows are zeros (computed separately at runtime)."""
    IDX = np.zeros((9, 16, 3), np.int32)
    W = np.zeros((9, 16, 3), np.int32)
    RND = np.zeros((9, 16), np.int32)
    SH = np.zeros((9, 16), np.int32)

    def P(i):                       # top row sample index in s
        return 0 if i < 0 else 1 + i

    def L(i):                       # left col sample index in s
        return 0 if i < 0 else 9 + i

    def put(m, r, c, terms, rnd, sh):
        k = r * 4 + c
        for j, (idx, w) in enumerate(terms):
            IDX[m, k, j] = idx
            W[m, k, j] = w
        RND[m, k] = rnd
        SH[m, k] = sh

    for r in range(4):
        for c in range(4):
            put(VERT, r, c, [(P(c), 1)], 0, 0)
            put(HOR, r, c, [(L(r), 1)], 0, 0)

            i = r + c
            if i == 6:
                put(DIAG_DL, r, c, [(P(6), 1), (P(7), 3)], 2, 2)
            else:
                put(DIAG_DL, r, c, [(P(i), 1), (P(i + 1), 2), (P(i + 2), 1)],
                    2, 2)

            i2 = c + (r >> 1)
            if r % 2 == 0:
                put(VERT_L, r, c, [(P(i2), 1), (P(i2 + 1), 1)], 1, 1)
            else:
                put(VERT_L, r, c,
                    [(P(i2), 1), (P(i2 + 1), 2), (P(i2 + 2), 1)], 2, 2)

            z = c + 2 * r
            i = r + (c >> 1)
            if z > 5:
                put(HOR_U, r, c, [(L(3), 1)], 0, 0)
            elif z == 5:
                put(HOR_U, r, c, [(L(2), 1), (L(3), 3)], 2, 2)
            elif z % 2 == 0:
                put(HOR_U, r, c, [(L(i), 1), (L(i + 1), 1)], 1, 1)
            else:
                put(HOR_U, r, c, [(L(i), 1), (L(i + 1), 2), (L(i + 2), 1)],
                    2, 2)

            # diagonal down-right
            if c > r:
                i = c - r
                put(DIAG_DR, r, c, [(P(i - 2), 1), (P(i - 1), 2), (P(i), 1)],
                    2, 2)
            elif c < r:
                i = r - c
                put(DIAG_DR, r, c, [(L(i - 2), 1), (L(i - 1), 2), (L(i), 1)],
                    2, 2)
            else:
                put(DIAG_DR, r, c, [(P(0), 1), (0, 2), (L(0), 1)], 2, 2)

            # vertical-right
            z = 2 * c - r
            i = c - (r >> 1)
            if z >= 0 and z % 2 == 0:
                put(VERT_R, r, c, [(P(i - 1), 1), (P(i), 1)], 1, 1)
            elif z >= 0:
                put(VERT_R, r, c, [(P(i - 2), 1), (P(i - 1), 2), (P(i), 1)],
                    2, 2)
            elif z == -1:
                put(VERT_R, r, c, [(L(0), 1), (0, 2), (P(0), 1)], 2, 2)
            else:
                j = r - 2 * c
                put(VERT_R, r, c,
                    [(L(j - 1), 1), (L(j - 2), 2), (L(j - 3), 1)], 2, 2)

            # horizontal-down
            z = 2 * r - c
            i = r - (c >> 1)
            if z >= 0 and z % 2 == 0:
                put(HOR_D, r, c, [(L(i - 1), 1), (L(i), 1)], 1, 1)
            elif z >= 0:
                put(HOR_D, r, c, [(L(i - 2), 1), (L(i - 1), 2), (L(i), 1)],
                    2, 2)
            elif z == -1:
                put(HOR_D, r, c, [(P(0), 1), (0, 2), (L(0), 1)], 2, 2)
            else:
                j = c - 2 * r
                put(HOR_D, r, c,
                    [(P(j - 1), 1), (P(j - 2), 2), (P(j - 3), 1)], 2, 2)
    return IDX, W, RND, SH


_I4_IDX, _I4_W, _I4_RND, _I4_SH = (jnp.asarray(a) for a in _build_i4_tables())


def pred4x4_all(top9, left4, corner, avail_t, avail_l, avail_tr):
    """All 9 predictions for a batch of 4x4 blocks.

    top9 [..., 8], left4 [..., 4], corner [...] int32; avail_* traced bool
    [...].  Returns (preds [..., 9, 4, 4] int32, allowed [..., 9] bool).
    """
    t = top9.astype(jnp.int32)
    # top-right substitution: p[4..7] = p[3] when unavailable
    t = jnp.where(avail_tr[..., None], t,
                  jnp.concatenate([t[..., :4],
                                   jnp.repeat(t[..., 3:4], 4, axis=-1)],
                                  axis=-1))
    l = left4.astype(jnp.int32)
    c = corner.astype(jnp.int32)
    s = jnp.concatenate([c[..., None], t, l], axis=-1)          # [..., 13]

    g = s[..., _I4_IDX]                                          # [...,9,16,3]
    preds = ((g * _I4_W).sum(-1) + _I4_RND) >> _I4_SH            # [..., 9, 16]

    sum_t = t[..., :4].sum(-1)
    sum_l = l.sum(-1)
    dc = jnp.where(avail_t & avail_l, (sum_t + sum_l + 4) >> 3,
                   jnp.where(avail_t, (sum_t + 2) >> 2,
                             jnp.where(avail_l, (sum_l + 2) >> 2, 128)))
    preds = preds.at[..., DC, :].set(dc[..., None])

    al_t = avail_t[..., None]
    al_l = avail_l[..., None]
    tru = jnp.ones_like(al_t, bool)
    allowed = jnp.concatenate([
        al_t, al_l, tru, al_t, al_t & al_l, al_t & al_l, al_t & al_l,
        al_t, al_l], axis=-1)
    return preds.reshape(*preds.shape[:-1], 4, 4), allowed


def pred16x16_all(top16, left16, corner, avail_t, avail_l):
    """top16 [..., 16], left16 [..., 16], corner [...] -> ([..., 4, 16, 16],
    allowed [..., 4])."""
    t = top16.astype(jnp.int32)
    l = left16.astype(jnp.int32)
    c = corner.astype(jnp.int32)
    shp = t.shape[:-1]
    pv = jnp.broadcast_to(t[..., None, :], (*shp, 16, 16))
    ph = jnp.broadcast_to(l[..., :, None], (*shp, 16, 16))
    sum_t, sum_l = t.sum(-1), l.sum(-1)
    dc = jnp.where(avail_t & avail_l, (sum_t + sum_l + 16) >> 5,
                   jnp.where(avail_t, (sum_t + 8) >> 4,
                             jnp.where(avail_l, (sum_l + 8) >> 4, 128)))
    pdc = jnp.broadcast_to(dc[..., None, None], (*shp, 16, 16))
    # plane (spec 8.3.3.4)
    tt = jnp.concatenate([c[..., None], t], axis=-1)     # tt[i] = p[i-1, -1]
    ll = jnp.concatenate([c[..., None], l], axis=-1)
    xw = jnp.arange(1, 9, dtype=jnp.int32)
    h = (xw * (tt[..., 9:17] - jnp.flip(tt[..., 0:8], -1))).sum(-1)
    v = (xw * (ll[..., 9:17] - jnp.flip(ll[..., 0:8], -1))).sum(-1)
    a = 16 * (l[..., 15] + t[..., 15])
    b = (5 * h + 32) >> 6
    cc = (5 * v + 32) >> 6
    yi = jnp.arange(16, dtype=jnp.int32)[:, None]
    xi = jnp.arange(16, dtype=jnp.int32)[None, :]
    pplane = jnp.clip((a[..., None, None] + b[..., None, None] * (xi - 7)
                       + cc[..., None, None] * (yi - 7) + 16) >> 5, 0, 255)
    preds = jnp.stack([pv, ph, pdc, pplane], axis=-3)
    tru = jnp.ones(shp, bool)
    allowed = jnp.stack([avail_t & tru, avail_l & tru, tru,
                         avail_t & avail_l], axis=-1)
    return preds, allowed


def pred_chroma_all(top8, left8, corner, avail_t, avail_l):
    """top8 [..., 8], left8 [..., 8] -> ([..., 4, 8, 8], allowed [..., 4])."""
    t = top8.astype(jnp.int32)
    l = left8.astype(jnp.int32)
    c = corner.astype(jnp.int32)
    shp = t.shape[:-1]

    def dc_all(bx, by):
        st = t[..., bx:bx + 4].sum(-1)
        sl = l[..., by:by + 4].sum(-1)
        return jnp.where(avail_t & avail_l, (st + sl + 4) >> 3,
                         jnp.where(avail_t, (st + 2) >> 2,
                                   jnp.where(avail_l, (sl + 2) >> 2, 128)))

    def dc_single(bx, by, prefer_top):
        st = (t[..., bx:bx + 4].sum(-1) + 2) >> 2
        sl = (l[..., by:by + 4].sum(-1) + 2) >> 2
        if prefer_top:
            return jnp.where(avail_t, st, jnp.where(avail_l, sl, 128))
        return jnp.where(avail_l, sl, jnp.where(avail_t, st, 128))

    pdc = jnp.zeros((*shp, 8, 8), jnp.int32)
    pdc = pdc.at[..., 0:4, 0:4].set(dc_all(0, 0)[..., None, None])
    pdc = pdc.at[..., 0:4, 4:8].set(dc_single(4, 0, True)[..., None, None])
    pdc = pdc.at[..., 4:8, 0:4].set(dc_single(0, 4, False)[..., None, None])
    pdc = pdc.at[..., 4:8, 4:8].set(dc_all(4, 4)[..., None, None])

    ph = jnp.broadcast_to(l[..., :, None], (*shp, 8, 8))
    pv = jnp.broadcast_to(t[..., None, :], (*shp, 8, 8))

    tt = jnp.concatenate([c[..., None], t], axis=-1)
    ll = jnp.concatenate([c[..., None], l], axis=-1)
    xw = jnp.arange(1, 5, dtype=jnp.int32)
    h = (xw * (tt[..., 5:9] - jnp.flip(tt[..., 0:4], -1))).sum(-1)
    v = (xw * (ll[..., 5:9] - jnp.flip(ll[..., 0:4], -1))).sum(-1)
    a = 16 * (l[..., 7] + t[..., 7])
    b = (34 * h + 32) >> 6
    cc = (34 * v + 32) >> 6
    yi = jnp.arange(8, dtype=jnp.int32)[:, None]
    xi = jnp.arange(8, dtype=jnp.int32)[None, :]
    pplane = jnp.clip((a[..., None, None] + b[..., None, None] * (xi - 3)
                       + cc[..., None, None] * (yi - 3) + 16) >> 5, 0, 255)
    preds = jnp.stack([pdc, ph, pv, pplane], axis=-3)
    tru = jnp.ones(shp, bool)
    allowed = jnp.stack([tru, avail_l & tru, avail_t & tru,
                         avail_t & avail_l], axis=-1)
    return preds, allowed
