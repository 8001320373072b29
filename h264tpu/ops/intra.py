"""H.264 intra prediction — wavefront-batched for TPU.

Implements the 9 standard 4x4 intra prediction modes (spec 8.3.1.2.x; the
reference's ``intrapred_luma`` FR/src/block.c:127 and mode decision
``Mode_Decision_for_4x4IntraBlocks`` FR/src/rdopt.c:386) with a TPU-first
schedule: the only true dependency of intra coding is block -> (left, top,
top-right) reconstructed neighbors, so blocks are processed in anti-diagonal
wavefronts ``w = 2*by + bx`` (the classic H.264 wavefront), every block on a
wavefront in parallel inside one ``lax.scan`` step.

Deviation from H.264: block scan order is the plain wavefront over the whole
plane rather than H.264's per-macroblock zig-zag, which strictly enlarges the
set of available neighbors; this is our own (FVC) stream format, and the
decoder applies the identical schedule, reproducing the encoder's
reconstruction bit-exactly.

Mode decision: SAD + lambda penalty for non-most-probable modes (the
non-RDO JM rule; full Lagrangian RDO is the roadmap upgrade).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from . import transform as T

# mode numbering per spec 8.3.1.1
VERT, HOR, DC, DIAG_DL, DIAG_DR, VERT_R, HOR_D, VERT_L, HOR_U = range(9)
INF_COST = jnp.int32(1 << 29)


def wavefront_schedule(cy: int, cx: int):
    """Static schedule arrays for w = 2*by + bx wavefronts.

    Returns (by [S, M], bx [S, M], valid [S, M]) numpy arrays.
    """
    waves: dict = {}
    for by in range(cy):
        for bx in range(cx):
            waves.setdefault(2 * by + bx, []).append((by, bx))
    S = max(waves) + 1
    M = max(len(v) for v in waves.values())
    a_by = np.zeros((S, M), np.int32)
    a_bx = np.zeros((S, M), np.int32)
    a_ok = np.zeros((S, M), bool)
    for w, blocks in waves.items():
        for i, (by, bx) in enumerate(blocks):
            a_by[w, i] = by
            a_bx[w, i] = bx
            a_ok[w, i] = True
    return a_by, a_bx, a_ok


def predict_modes_4x4(A: jnp.ndarray, L: jnp.ndarray, avail_top, avail_left,
                      avail_tr):
    """All 9 4x4 predictions for a batch of blocks (spec 8.3.1.2).

    A: [M, 9] — corner p[-1,-1] then top p[0..7,-1] (top + top-right);
    L: [M, 4] — left p[-1,0..3].  avail_*: [M] bool.
    Returns preds [M, 9, 4, 4] int32, allowed [M, 9] bool.
    """
    M = A.shape[0]
    corner = A[:, 0]
    top8 = A[:, 1:9]
    # unavailable top-right replicates the last top pixel
    top8 = jnp.concatenate(
        [top8[:, :4],
         jnp.where(avail_tr[:, None], top8[:, 4:], top8[:, 3:4])], axis=1)

    def P(i):  # top row, i in -1..7 (-1 = corner)
        return corner if i == -1 else top8[:, i]

    def Lp(i):  # left column, i in -1..3 (-1 = corner)
        return corner if i == -1 else L[:, i]

    def grid(fn):
        return jnp.stack([jnp.stack([jnp.broadcast_to(fn(r, c), (M,))
                                     for c in range(4)], axis=-1)
                          for r in range(4)], axis=-2)

    preds, allowed = [], []
    both = avail_top & avail_left

    preds.append(grid(lambda r, c: P(c)))                       # 0 vertical
    allowed.append(avail_top)
    preds.append(grid(lambda r, c: Lp(r)))                      # 1 horizontal
    allowed.append(avail_left)

    s_t = top8[:, :4].sum(axis=1)
    s_l = L.sum(axis=1)
    dc = jnp.where(both, (s_t + s_l + 4) >> 3,
         jnp.where(avail_top, (s_t + 2) >> 2,
         jnp.where(avail_left, (s_l + 2) >> 2, 128)))
    preds.append(grid(lambda r, c: dc))                         # 2 DC
    allowed.append(jnp.ones((M,), bool))

    def ddl(r, c):                                              # 3 diag down-left
        i = r + c
        if i == 6:
            return (P(6) + 3 * P(7) + 2) >> 2
        return (P(i) + 2 * P(i + 1) + P(i + 2) + 2) >> 2
    preds.append(grid(ddl))
    allowed.append(avail_top)

    def ddr(r, c):                                              # 4 diag down-right
        if c > r:
            i = c - r
            return (P(i - 2) + 2 * P(i - 1) + P(i) + 2) >> 2
        if c < r:
            i = r - c
            return (Lp(i - 2) + 2 * Lp(i - 1) + Lp(i) + 2) >> 2
        return (P(0) + 2 * corner + Lp(0) + 2) >> 2
    preds.append(grid(ddr))
    allowed.append(both)

    def vr(r, c):                                               # 5 vertical-right
        z = 2 * c - r
        i = c - (r >> 1)
        if z >= 0 and z % 2 == 0:
            return (P(i - 1) + P(i) + 1) >> 1
        if z >= 0:
            return (P(i - 2) + 2 * P(i - 1) + P(i) + 2) >> 2
        if z == -1:
            return (Lp(0) + 2 * corner + P(0) + 2) >> 2
        j = r - 2 * c
        return (Lp(j - 1) + 2 * Lp(j - 2) + Lp(j - 3) + 2) >> 2
    preds.append(grid(vr))
    allowed.append(both)

    def hd(r, c):                                               # 6 horizontal-down
        z = 2 * r - c
        i = r - (c >> 1)
        if z >= 0 and z % 2 == 0:
            return (Lp(i - 1) + Lp(i) + 1) >> 1
        if z >= 0:
            return (Lp(i - 2) + 2 * Lp(i - 1) + Lp(i) + 2) >> 2
        if z == -1:
            return (P(0) + 2 * corner + Lp(0) + 2) >> 2
        j = c - 2 * r
        return (P(j - 1) + 2 * P(j - 2) + P(j - 3) + 2) >> 2
    preds.append(grid(hd))
    allowed.append(both)

    def vl(r, c):                                               # 7 vertical-left
        i = c + (r >> 1)
        if r % 2 == 0:
            return (P(i) + P(i + 1) + 1) >> 1
        return (P(i) + 2 * P(i + 1) + P(i + 2) + 2) >> 2
    preds.append(grid(vl))
    allowed.append(avail_top)

    def hu(r, c):                                               # 8 horizontal-up
        z = c + 2 * r
        i = r + (c >> 1)
        if z > 5:
            return Lp(3)
        if z == 5:
            return (Lp(2) + 3 * Lp(3) + 2) >> 2
        if z % 2 == 0:
            return (Lp(i) + Lp(i + 1) + 1) >> 1
        return (Lp(i) + 2 * Lp(i + 1) + Lp(i + 2) + 2) >> 2
    preds.append(grid(hu))
    allowed.append(avail_left)

    return jnp.stack(preds, axis=1), jnp.stack(allowed, axis=1)


def _lambda_penalty(qp):
    """JM-style non-RDO penalty for coding a non-most-probable mode.
    Works for Python ints and traced scalars alike."""
    p = jnp.round(4.0 * 0.85 * jnp.exp2((jnp.asarray(qp, jnp.float32) - 12.0) / 3.0))
    return jnp.maximum(1, p).astype(jnp.int32)


def _wavefront_scan(H, W, qp, org=None, modes_in=None, levels_in=None):
    """Shared encode/decode wavefront scan.

    Encode (org given): picks modes + levels.  Decode (modes_in, levels_in
    given): reconstructs with transmitted data.  Both maintain the running
    reconstruction buffer that predictions read from.
    """
    cy, cx = H // 4, W // 4
    a_by, a_bx, a_ok = wavefront_schedule(cy, cx)
    penalty = _lambda_penalty(qp)
    decode = org is None
    M = a_by.shape[1]

    def step(carry, xs):
        buf, modes, levels = carry
        by, bx, ok = xs
        py, px = by * 4, bx * 4

        def gather(rows, cols):
            fl = jnp.clip(rows, 0, H - 1) * W + jnp.clip(cols, 0, W - 1)
            return jnp.take(buf.reshape(-1), fl)

        A = gather(jnp.broadcast_to((py - 1)[:, None], (M, 9)),
                   px[:, None] + jnp.arange(-1, 8)[None, :])
        L = gather(py[:, None] + jnp.arange(4)[None, :],
                   jnp.broadcast_to((px - 1)[:, None], (M, 4)))

        avail_top = py > 0
        avail_left = px > 0
        avail_tr = (py > 0) & (px + 4 < W)

        preds, allowed = predict_modes_4x4(A, L, avail_top, avail_left, avail_tr)

        if decode:
            mode = jax.vmap(lambda y, x: modes[y, x])(by, bx)
            zz = jax.vmap(lambda y, x: levels[y, x])(by, bx)
            pred = jnp.take_along_axis(preds, mode[:, None, None, None],
                                       axis=1)[:, 0]
            deq = T.dequant4x4(T.zigzag_unscan(zz), qp)
            rec = T.reconstruct(pred, T.idct4x4(deq))
        else:
            org_blocks = jax.vmap(
                lambda y, x: jax.lax.dynamic_slice(org, (y, x), (4, 4)))(py, px)
            sad = jnp.abs(preds - org_blocks[:, None]).sum(axis=(2, 3))
            left_m = jax.vmap(lambda y, x: modes[y, jnp.maximum(x - 1, 0)])(by, bx)
            top_m = jax.vmap(lambda y, x: modes[jnp.maximum(y - 1, 0), x])(by, bx)
            left_m = jnp.where(avail_left, left_m, DC)
            top_m = jnp.where(avail_top, top_m, DC)
            mpm = jnp.minimum(left_m, top_m)
            cost = sad + penalty * (jnp.arange(9)[None, :] != mpm[:, None])
            cost = jnp.where(allowed, cost, INF_COST)
            mode = jnp.argmin(cost, axis=1).astype(jnp.int32)
            pred = jnp.take_along_axis(preds, mode[:, None, None, None],
                                       axis=1)[:, 0]
            lev, rec = T.transform_quant_reconstruct(org_blocks - pred, pred,
                                                     qp, intra=True)
            zz = T.zigzag_scan(lev)
            cy, cx = modes.shape
            # masked lanes target an out-of-range slot and are dropped (a
            # plain .at[by,bx] would make them race against real writes at
            # their placeholder coordinates)
            tgt = jnp.where(ok, by * cx + bx, cy * cx)
            modes = modes.reshape(-1).at[tgt].set(mode, mode="drop").reshape(cy, cx)
            levels = levels.reshape(cy * cx, 16).at[tgt].set(
                zz, mode="drop").reshape(cy, cx, 16)

        # one vectorized scatter of all M blocks; masked lanes write out of
        # range and are dropped
        rr = py[:, None, None] + jnp.arange(4)[None, :, None]
        cc = px[:, None, None] + jnp.arange(4)[None, None, :]
        flat = rr * W + cc
        flat = jnp.where(ok[:, None, None], flat, H * W)
        buf = buf.reshape(-1).at[flat.reshape(-1)].set(
            rec.reshape(-1), mode="drop").reshape(H, W)
        return (buf, modes, levels), None

    buf0 = jnp.full((H, W), 128, jnp.int32)
    if decode:
        modes0 = modes_in.astype(jnp.int32)
        levels0 = levels_in.reshape(cy, cx, 16).astype(jnp.int32)
    else:
        modes0 = jnp.zeros((cy, cx), jnp.int32)
        levels0 = jnp.zeros((cy, cx, 16), jnp.int32)
    (buf, modes, levels), _ = jax.lax.scan(
        step, (buf0, modes0, levels0),
        (jnp.asarray(a_by), jnp.asarray(a_bx), jnp.asarray(a_ok)))
    return modes, levels.reshape(cy * cx, 16), buf


def encode_plane(org: jnp.ndarray, qp: int):
    """Intra-code a plane. Returns (modes [CY,CX], zz [CY*CX,16], recon)."""
    H, W = org.shape
    return _wavefront_scan(H, W, qp, org=org.astype(jnp.int32))


def decode_plane(modes: jnp.ndarray, zz: jnp.ndarray, H: int, W: int, qp: int):
    """Reconstruct a plane from transmitted modes + levels (bit-exact with
    the encoder's reconstruction)."""
    _, _, buf = _wavefront_scan(H, W, qp, modes_in=modes, levels_in=zz)
    return buf
