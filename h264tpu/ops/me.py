"""H.264-style motion estimation + motion compensation, batched for TPU.

The classic inter path of the JM encoders (SURVEY J6: ``mv_search.c``,
``me_fullsearch.c``, ``me_distortion.c``; sub-pel planes ``img_luma.c``;
MC ``mc_prediction.c:902`` get_block_luma): re-expressed as candidate-lattice
evaluation like the fractal engine —

* integer-pel full search evaluates ALL (block, offset) SADs at once via
  shifted-difference images pooled per block (chunked scan over offsets);
* half-pel planes use the standard 6-tap (1,-5,20,20,-5,1)/32 filter,
  quarter-pel values bilinear between neighbors (spec 8.4.2.2.1);
* sub-pel refinement evaluates the 8 half-pel then 8 quarter-pel neighbors
  of the best integer MV (JM's refinement order) for every block in
  parallel;
* MC gathers prediction pixels from the 4x-upsampled plane with per-block
  quarter-pel MVs.

MV cost: lambda-weighted Exp-Golomb length of the MV difference to the
median predictor (JM's non-RDO cost), computed vectorized.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


def sixtap_halfpel(plane: jnp.ndarray):
    """Half-pel interpolation with the H.264 6-tap filter.

    Returns the 4x-upsampled quarter-pel plane [4H, 4W] int32 where sample
    (4y+fy, 4x+fx) is the (fy, fx) quarter-pel value at integer position
    (y, x).  Half-pels are 6-tap (clipped); quarter-pels bilinear-average
    their two nearest half/integer neighbors (spec 8.4.2.2.1 semantics).
    """
    p = plane.astype(jnp.int32)
    H, W = p.shape
    pad = jnp.pad(p, ((2, 3), (2, 3)), mode="edge")

    def tap6(x, axis):
        sl = [jax.lax.slice_in_dim(x, i, x.shape[axis] - 5 + i, axis=axis)
              for i in range(6)]
        return (sl[0] - 5 * sl[1] + 20 * sl[2] + 20 * sl[3] - 5 * sl[4] + sl[5])

    # b: horizontal half-pels at (y, x+1/2); raw (unclipped) for j-position
    b_raw = tap6(pad, 1)[2:2 + H, :]               # [H, W+? ] -> cols at x-1/2..
    b_raw = b_raw[:, 0:W]                          # value between x and x+1
    b = jnp.clip((b_raw + 16) >> 5, 0, 255)
    # h: vertical half-pels at (y+1/2, x)
    h_raw = tap6(pad, 0)[:, 2:2 + W]
    h_raw = h_raw[0:H, :]
    h = jnp.clip((h_raw + 16) >> 5, 0, 255)
    # j: center half-pel from 6-tap over vertical-half raw values
    h_raw_padcols = jnp.pad(h_raw, ((0, 0), (2, 3)), mode="edge")
    j_raw = tap6(h_raw_padcols, 1)[:, 0:W]
    j = jnp.clip((j_raw + 512) >> 10, 0, 255)

    # assemble quarter-pel grid
    up = jnp.zeros((4 * H, 4 * W), jnp.int32)
    G = p
    # integer and half-pel samples
    up = up.at[0::4, 0::4].set(G)
    up = up.at[0::4, 2::4].set(b)
    up = up.at[2::4, 0::4].set(h)
    up = up.at[2::4, 2::4].set(j)

    def avg(x, y):
        return (x + y + 1) >> 1

    shift_r = lambda x: jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    shift_d = lambda x: jnp.concatenate([x[1:, :], x[-1:, :]], axis=0)

    # quarter-pels in the integer rows
    up = up.at[0::4, 1::4].set(avg(G, b))
    up = up.at[0::4, 3::4].set(avg(b, shift_r(G)))
    # quarter-pels in the integer cols
    up = up.at[1::4, 0::4].set(avg(G, h))
    up = up.at[3::4, 0::4].set(avg(h, shift_d(G)))
    # half-pel rows: a-neighbors of h/j
    up = up.at[2::4, 1::4].set(avg(h, j))
    up = up.at[2::4, 3::4].set(avg(j, shift_r(h)))
    up = up.at[1::4, 2::4].set(avg(b, j))
    up = up.at[3::4, 2::4].set(avg(j, shift_d(b)))
    # diagonal quarter-pels average the diagonal half-pel neighbors
    up = up.at[1::4, 1::4].set(avg(b, h))
    up = up.at[1::4, 3::4].set(avg(b, shift_r(h)))
    up = up.at[3::4, 1::4].set(avg(shift_d(b), h))
    up = up.at[3::4, 3::4].set(avg(shift_d(b), shift_r(h)))
    return up


def sixtap_phases(plane: jnp.ndarray):
    """Phase-split quarter-pel interpolation (spec 8.4.2.2.1 semantics).

    Same samples as :func:`sixtap_halfpel` but laid out as
    ``[4, 4, H, W] uint8`` where ``[fy, fx, y, x]`` is the (fy, fx)
    quarter-pel value at integer position (y, x).  The MC gather for a
    quarter-pel MV then reads ONE contiguous [bh, bw] window of the
    (fy, fx) plane — no 4-strided reads over a 16x-inflated int32 grid,
    which is what made subpel refinement HBM-bound at 1080p.
    """
    p = plane.astype(jnp.int32)
    H, W = p.shape
    pad = jnp.pad(p, ((2, 3), (2, 3)), mode="edge")

    def tap6(x, axis):
        sl = [jax.lax.slice_in_dim(x, i, x.shape[axis] - 5 + i, axis=axis)
              for i in range(6)]
        return (sl[0] - 5 * sl[1] + 20 * sl[2] + 20 * sl[3] - 5 * sl[4]
                + sl[5])

    G = p
    b_raw = tap6(pad, 1)[2:2 + H, 0:W]
    b = jnp.clip((b_raw + 16) >> 5, 0, 255)
    h_raw = tap6(pad, 0)[0:H, 2:2 + W]
    h = jnp.clip((h_raw + 16) >> 5, 0, 255)
    h_raw_padcols = jnp.pad(h_raw, ((0, 0), (2, 3)), mode="edge")
    j = jnp.clip((tap6(h_raw_padcols, 1)[:, 0:W] + 512) >> 10, 0, 255)

    def avg(x, y):
        return (x + y + 1) >> 1

    shift_r = lambda x: jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    shift_d = lambda x: jnp.concatenate([x[1:, :], x[-1:, :]], axis=0)

    rows = [
        [G, avg(G, b), b, avg(b, shift_r(G))],
        [avg(G, h), avg(b, h), avg(b, j), avg(b, shift_r(h))],
        [h, avg(h, j), j, avg(j, shift_r(h))],
        [avg(h, shift_d(G)), avg(shift_d(b), h), avg(j, shift_d(b)),
         avg(shift_d(b), shift_r(h))],
    ]
    return jnp.stack([jnp.stack(r) for r in rows]).astype(jnp.uint8)


class MEResult(NamedTuple):
    mv_x: jnp.ndarray   # quarter-pel units, [nby, nbx]
    mv_y: jnp.ndarray
    sad: jnp.ndarray


def _ue_len(v):
    """Bit length of ue(v) for signed-mapped v (vectorized, traced)."""
    k = jnp.where(v > 0, 2 * v - 1, -2 * v)
    n = jnp.int32(2) * (31 - jax.lax.clz((k + 1).astype(jnp.int32))) + 1
    return n


def mv_cost(dx_q, dy_q, px_q, py_q, lam):
    """JM-style lambda * (se-code length of MVD) cost, MVs in 1/4 pel."""
    return lam * (_ue_len(dx_q - px_q) + _ue_len(dy_q - py_q))


def full_search_int(org: jnp.ndarray, ref: jnp.ndarray, bs: int,
                    search_range: int, lam: int = 0, chunk: int = 64):
    """Integer-pel full-search for all bs x bs blocks at once.

    SAD of every (block, offset) via shifted absolute-difference images
    pooled per block, scanned in spiral order with a running best (ties ->
    earliest spiral position, matching JM full search center-bias).
    MV cost uses the zero predictor (single-ref IPPP; the median predictor
    refinement is roadmap).  Returns MEResult with integer MVs in Q-pel.
    """
    H, W = org.shape
    nby, nbx = H // bs, W // bs
    from .fractal import spiral_offsets
    offsets = spiral_offsets(search_range)
    n_off = offsets.shape[0]
    n_pad = (-n_off) % chunk
    offs = np.concatenate([offsets, np.zeros((n_pad, 2), np.int32)])
    ok = np.concatenate([np.ones(n_off, bool), np.zeros(n_pad, bool)])
    steps = offs.shape[0] // chunk
    offs_j = jnp.asarray(offs.reshape(steps, chunk, 2))
    ok_j = jnp.asarray(ok.reshape(steps, chunk))
    spiral_j = jnp.asarray(
        np.arange(offs.shape[0], dtype=np.int32).reshape(steps, chunk))

    o = org.astype(jnp.int32)
    padded = jnp.pad(ref.astype(jnp.int32), search_range, mode="edge")
    sr = search_range

    big = jnp.int32(1 << 29)
    vary0 = (o[0, 0] * 0).astype(jnp.int32)
    carry0 = dict(sad=jnp.full((nby, nbx), big) + vary0,
                  dx=jnp.zeros((nby, nbx), jnp.int32) + vary0,
                  dy=jnp.zeros((nby, nbx), jnp.int32) + vary0,
                  pri=jnp.full((nby, nbx), big) + vary0)

    def step(carry, xs):
        offs_c, ok_c, spiral_c = xs

        def one(off):
            s = jax.lax.dynamic_slice(padded, (sr + off[1], sr + off[0]), (H, W))
            d = jnp.abs(o - s)
            return d.reshape(nby, bs, nbx, bs).sum(axis=(1, 3), dtype=jnp.int32)

        sads = jax.vmap(one)(offs_c)                     # [chunk, nby, nbx]
        cost = sads + mv_cost(4 * offs_c[:, 0, None, None],
                              4 * offs_c[:, 1, None, None], 0, 0, lam)
        cost = jnp.where(ok_c[:, None, None], cost, big)
        best = jnp.min(cost, axis=0)
        pri = jnp.where(cost == best[None], spiral_c[:, None, None], big)
        bp = jnp.min(pri, axis=0)
        sel = jnp.argmin(pri, axis=0)
        cand = dict(sad=best, dx=offs_c[sel, 0], dy=offs_c[sel, 1], pri=bp)
        win = (cand["sad"] < carry["sad"]) | (
            (cand["sad"] == carry["sad"]) & (cand["pri"] < carry["pri"]))
        return {k: jnp.where(win, cand[k], carry[k]) for k in carry}, None

    carry, _ = jax.lax.scan(step, carry0, (offs_j, ok_j, spiral_j))
    return MEResult(mv_x=4 * carry["dx"], mv_y=4 * carry["dy"],
                    sad=carry["sad"])


def subpel_refine(org: jnp.ndarray, up: jnp.ndarray, me: MEResult, bs: int,
                  lam: int = 0):
    """Half- then quarter-pel refinement around the integer best, all blocks
    in parallel (JM sub-pel refinement order)."""
    H, W = org.shape
    nby, nbx = H // bs, W // bs
    o = org.astype(jnp.int32)
    H4, W4 = up.shape

    by = jnp.arange(nby, dtype=jnp.int32)[:, None] * bs
    bx = jnp.arange(nbx, dtype=jnp.int32)[None, :] * bs

    def block_sad(mvx, mvy):
        # gather the bs x bs prediction at quarter-pel MV for each block
        yy = (by[:, :, None, None] + jnp.arange(bs)[None, None, :, None]) * 4 \
            + mvy[:, :, None, None]
        xx = (bx[:, :, None, None] + jnp.arange(bs)[None, None, None, :]) * 4 \
            + mvx[:, :, None, None]
        yy = jnp.clip(yy, 0, H4 - 4)
        xx = jnp.clip(xx, 0, W4 - 4)
        pred = jnp.take(up.reshape(-1), (yy * W4 + xx).reshape(-1)).reshape(
            nby, nbx, bs, bs)
        ob = o.reshape(nby, bs, nbx, bs).transpose(0, 2, 1, 3)
        return jnp.abs(ob - pred).sum(axis=(2, 3)), pred

    def refine(mvx, mvy, best_sad, deltas):
        for (ddx, ddy) in deltas:
            cx, cy = mvx + ddx, mvy + ddy
            sad, _ = block_sad(cx, cy)
            sad = sad + mv_cost(cx, cy, 0, 0, lam)
            better = sad < best_sad
            mvx = jnp.where(better, cx, mvx)
            mvy = jnp.where(better, cy, mvy)
            best_sad = jnp.where(better, sad, best_sad)
        return mvx, mvy, best_sad

    mvx, mvy = me.mv_x, me.mv_y
    base_sad, _ = block_sad(mvx, mvy)
    base_sad = base_sad + mv_cost(mvx, mvy, 0, 0, lam)
    half = [(-2, -2), (0, -2), (2, -2), (-2, 0), (2, 0), (-2, 2), (0, 2), (2, 2)]
    mvx, mvy, sad = refine(mvx, mvy, base_sad, half)
    quarter = [(-1, -1), (0, -1), (1, -1), (-1, 0), (1, 0), (-1, 1), (0, 1), (1, 1)]
    mvx, mvy, sad = refine(mvx, mvy, sad, quarter)
    return MEResult(mv_x=mvx, mv_y=mvy, sad=sad)


def motion_compensate(up: jnp.ndarray, mv_x: jnp.ndarray, mv_y: jnp.ndarray,
                      bs: int, H: int, W: int) -> jnp.ndarray:
    """Build the prediction plane from per-block quarter-pel MVs."""
    nby, nbx = H // bs, W // bs
    H4, W4 = up.shape
    by = jnp.arange(nby, dtype=jnp.int32)[:, None] * bs
    bx = jnp.arange(nbx, dtype=jnp.int32)[None, :] * bs
    yy = (by[:, :, None, None] + jnp.arange(bs)[None, None, :, None]) * 4 \
        + mv_y[:, :, None, None]
    xx = (bx[:, :, None, None] + jnp.arange(bs)[None, None, None, :]) * 4 \
        + mv_x[:, :, None, None]
    yy = jnp.clip(yy, 0, H4 - 4)
    xx = jnp.clip(xx, 0, W4 - 4)
    pred = jnp.take(up.reshape(-1), (yy * W4 + xx).reshape(-1)).reshape(
        nby, nbx, bs, bs)
    return pred.transpose(0, 2, 1, 3).reshape(H, W)


def me_lambda(qp: int) -> int:
    """JM motion-estimation lambda (sqrt of mode lambda), integer-rounded."""
    lam = 0.85 * 2.0 ** ((qp - 12) / 3.0)
    return max(1, int(round(np.sqrt(lam))))
