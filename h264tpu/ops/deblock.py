"""H.264-style in-loop deblocking filter, batched for TPU.

Filter math is the standard H.264 edge filter (normal bS<4 + strong bS=4)
with the spec's ALPHA/BETA/CLIP tables — behavior-parity with the reference
(``FR/src/loopFilter.c:74`` DeblockFrame / ``:329`` EdgeLoop / ``:192``
GetStrength).

Edge-processing order is redefined TPU-first: ALL vertical edges are filtered
in a left-to-right scan (each step filters one 4-px edge column across every
row of the frame in parallel), then all horizontal edges top-to-bottom on the
transposed plane.  H.264/JM interleaves vertical+horizontal per macroblock in
raster order; since the fractal stream is our own format the decoder applies
the identical scan, so encode/decode stay bit-exact.  (The JM-conformant
H.264 path will use an MB-wavefront variant of the same kernels.)
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

ALPHA_TABLE = np.array(
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 4, 4, 5, 6,
     7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28, 32, 36, 40, 45,
     50, 56, 63, 71, 80, 90, 101, 113, 127, 144, 162, 182, 203, 226, 255, 255],
    dtype=np.int32)
BETA_TABLE = np.array(
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 2, 2, 2, 3,
     3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8, 9, 9, 10, 10,
     11, 11, 12, 12, 13, 13, 14, 14, 15, 15, 16, 16, 17, 17, 18, 18],
    dtype=np.int32)
CLIP_TAB = np.array([
    [0, 0, 0, 0, 0], [0, 0, 0, 0, 0], [0, 0, 0, 0, 0], [0, 0, 0, 0, 0],
    [0, 0, 0, 0, 0], [0, 0, 0, 0, 0], [0, 0, 0, 0, 0], [0, 0, 0, 0, 0],
    [0, 0, 0, 0, 0], [0, 0, 0, 0, 0], [0, 0, 0, 0, 0], [0, 0, 0, 0, 0],
    [0, 0, 0, 0, 0], [0, 0, 0, 0, 0], [0, 0, 0, 0, 0], [0, 0, 0, 0, 0],
    [0, 0, 0, 0, 0], [0, 0, 0, 1, 1], [0, 0, 0, 1, 1], [0, 0, 0, 1, 1],
    [0, 0, 0, 1, 1], [0, 0, 1, 1, 1], [0, 0, 1, 1, 1], [0, 1, 1, 1, 1],
    [0, 1, 1, 1, 1], [0, 1, 1, 1, 1], [0, 1, 1, 1, 1], [0, 1, 1, 2, 2],
    [0, 1, 1, 2, 2], [0, 1, 1, 2, 2], [0, 1, 1, 2, 2], [0, 1, 2, 3, 3],
    [0, 1, 2, 3, 3], [0, 2, 2, 3, 3], [0, 2, 2, 4, 4], [0, 2, 3, 4, 4],
    [0, 2, 3, 4, 4], [0, 3, 3, 5, 5], [0, 3, 4, 6, 6], [0, 3, 4, 6, 6],
    [0, 4, 5, 7, 7], [0, 4, 5, 8, 8], [0, 4, 6, 9, 9], [0, 5, 7, 10, 10],
    [0, 6, 8, 11, 11], [0, 6, 8, 13, 13], [0, 7, 10, 14, 14], [0, 8, 11, 16, 16],
    [0, 9, 12, 18, 18], [0, 10, 13, 20, 20], [0, 11, 15, 23, 23], [0, 13, 17, 25, 25],
], dtype=np.int32)


def _filter_edge_lines(p3, p2, p1, p0, q0, q1, q2, q3, bs, qp: int, luma: bool):
    """Filter one edge for a batch of pixel lines.

    p3..q3: [...] int32 pixels across the edge (p side before, q side after).
    bs: per-line boundary strength 0..4.  Returns the 6 possibly-modified
    values (p2', p1', p0', q0', q1', q2').
    """
    qp = jnp.asarray(qp, jnp.int32)
    alpha = jnp.asarray(ALPHA_TABLE)[qp]
    beta = jnp.asarray(BETA_TABLE)[qp]
    tc0_tab = jnp.asarray(CLIP_TAB)[qp]
    tc0 = tc0_tab[jnp.clip(bs, 0, 4)]

    d0 = jnp.abs(p0 - q0)
    filt = (bs > 0) & (d0 < alpha) & (jnp.abs(p1 - p0) < beta) & (jnp.abs(q1 - q0) < beta)

    ap = jnp.abs(p2 - p0) < beta
    aq = jnp.abs(q2 - q0) < beta

    # ---- normal filter (bS < 4) ----
    if luma:
        tc = tc0 + ap.astype(jnp.int32) + aq.astype(jnp.int32)
    else:
        tc = tc0 + 1
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    p0_n = jnp.clip(p0 + delta, 0, 255)
    q0_n = jnp.clip(q0 - delta, 0, 255)
    if luma:
        dp1 = jnp.clip((p2 + ((p0 + q0 + 1) >> 1) - (p1 << 1)) >> 1, -tc0, tc0)
        dq1 = jnp.clip((q2 + ((p0 + q0 + 1) >> 1) - (q1 << 1)) >> 1, -tc0, tc0)
        p1_n = jnp.where(ap, p1 + dp1, p1)
        q1_n = jnp.where(aq, q1 + dq1, q1)
    else:
        p1_n, q1_n = p1, q1

    # ---- strong filter (bS == 4) ----
    small = (d0 < ((alpha >> 2) + 2))
    if luma:
        sp = small & ap
        sq = small & aq
        p0_s = jnp.where(sp, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                         (2 * p1 + p0 + q1 + 2) >> 2)
        p1_s = jnp.where(sp, (p2 + p1 + p0 + q0 + 2) >> 2, p1)
        p2_s = jnp.where(sp, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
        q0_s = jnp.where(sq, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                         (2 * q1 + q0 + p1 + 2) >> 2)
        q1_s = jnp.where(sq, (q2 + q1 + q0 + p0 + 2) >> 2, q1)
        q2_s = jnp.where(sq, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2)
    else:
        p0_s = (2 * p1 + p0 + q1 + 2) >> 2
        q0_s = (2 * q1 + q0 + p1 + 2) >> 2
        p1_s, p2_s, q1_s, q2_s = p1, p2, q1, q2

    strong = bs == 4
    p0_o = jnp.where(filt, jnp.where(strong, p0_s, p0_n), p0)
    q0_o = jnp.where(filt, jnp.where(strong, q0_s, q0_n), q0)
    p1_o = jnp.where(filt, jnp.where(strong, p1_s, p1_n), p1)
    q1_o = jnp.where(filt, jnp.where(strong, q1_s, q1_n), q1)
    p2_o = jnp.where(filt & strong, p2_s, p2)
    q2_o = jnp.where(filt & strong, q2_s, q2)
    return p2_o, p1_o, p0_o, q0_o, q1_o, q2_o


def _vertical_pass(plane: jnp.ndarray, bs_v: jnp.ndarray, qp: int, luma: bool):
    """Filter every vertical 4-px edge, scanning left -> right.

    plane [H, W]; bs_v [H/4, W/4] — strength of the edge to the LEFT of each
    4-px cell column (column 0 entries are ignored; frame edge not filtered).
    """
    H, W = plane.shape
    n_edges = W // 4 - 1
    bs_rows = jnp.repeat(bs_v, 4, axis=0)          # [H, W/4]

    def body(buf, j):
        x = (j + 1) * 4
        cols = jax.lax.dynamic_slice(buf, (0, x - 4), (H, 8))
        p3, p2, p1, p0 = cols[:, 0], cols[:, 1], cols[:, 2], cols[:, 3]
        q0, q1, q2, q3 = cols[:, 4], cols[:, 5], cols[:, 6], cols[:, 7]
        bs = jax.lax.dynamic_slice(bs_rows, (0, j + 1), (H, 1))[:, 0]
        p2o, p1o, p0o, q0o, q1o, q2o = _filter_edge_lines(
            p3, p2, p1, p0, q0, q1, q2, q3, bs, qp, luma)
        new = jnp.stack([p3, p2o, p1o, p0o, q0o, q1o, q2o, q3], axis=1)
        buf = jax.lax.dynamic_update_slice(buf, new, (0, x - 4))
        return buf, None

    out, _ = jax.lax.scan(body, plane.astype(jnp.int32),
                          jnp.arange(n_edges, dtype=jnp.int32))
    return out


def deblock_plane(plane: jnp.ndarray, bs_v: jnp.ndarray, bs_h: jnp.ndarray,
                  qp: int, luma: bool = True) -> jnp.ndarray:
    """Deblock one plane: all vertical edges, then all horizontal edges."""
    out = _vertical_pass(plane, bs_v, qp, luma)
    out = _vertical_pass(out.T, bs_h.T, qp, luma).T
    return out


def deblock_plane_grouped(plane: jnp.ndarray, bs_v: jnp.ndarray,
                          bs_h: jnp.ndarray, qp: int, luma: bool = True,
                          groups: int = 1) -> jnp.ndarray:
    """Deblock in ``groups`` independent horizontal row bands.

    Each band runs the full V-then-H scan locally; band-boundary horizontal
    edges are left unfiltered — the FVC-format analogue of H.264's
    ``disable_deblocking_filter_idc == 2`` (no filtering across slice
    boundaries), which is what makes row-tile sharding bit-exactly
    shard-invariant: the band grid is fixed by the CONFIG (cfg.tile_rows),
    not by the device count, so any sharding that splits on band boundaries
    reproduces the single-device output.
    """
    if groups <= 1:
        return deblock_plane(plane, bs_v, bs_h, qp, luma)
    H, W = plane.shape
    gp = plane.reshape(groups, H // groups, W)
    cy = bs_v.shape[0]
    gv = bs_v.reshape(groups, cy // groups, -1)
    gh = bs_h.reshape(groups, cy // groups, -1)
    return jax.vmap(lambda p, v, h: deblock_plane(p, v, h, qp, luma))(
        gp, gv, gh).reshape(H, W)


def strengths_intra(h: int, w: int):
    """bS maps for an intra frame: 4 at MB edges, 3 at internal 4x4 edges."""
    cy, cx = h // 4, w // 4
    xs = np.arange(cx)
    ys = np.arange(cy)
    bs_v = np.where(xs[None, :] % 4 == 0, 4, 3) * np.ones((cy, 1), np.int32)
    bs_h = np.where(ys[:, None] % 4 == 0, 4, 3) * np.ones((1, cx), np.int32)
    return jnp.asarray(bs_v, jnp.int32), jnp.asarray(bs_h, jnp.int32)


def strengths_inter(mvx_q: jnp.ndarray, mvy_q: jnp.ndarray,
                    nz_cells: jnp.ndarray):
    """bS maps for a classic (H.264 ME) P frame: per-4x4-cell quarter-pel MV
    maps; bS = 2 with coded coefficients, 1 when the MV difference across the
    edge reaches 4 quarter-pel units (one integer pel), else 0."""
    nz = nz_cells.astype(bool)

    def edge(axis):
        def sh(x):
            return jnp.roll(x, 1, axis=axis)

        coeff = nz | sh(nz)
        moved = (jnp.abs(mvx_q - sh(mvx_q)) >= 4) | \
                (jnp.abs(mvy_q - sh(mvy_q)) >= 4)
        return jnp.where(coeff, 2, jnp.where(moved, 1, 0)).astype(jnp.int32)

    return edge(1), edge(0)


def strengths_fractal(maps: dict, nz_cells: jnp.ndarray):
    """bS maps for a fractal P frame from leaf maps + nonzero-coeff cells.

    Per the P-frame rules of ``GetStrength`` (FR/src/loopFilter.c:192):
    bS = 2 if either side of the edge has coded coefficients, else 1 if the
    sides' motion (domain offset) or reference differ, else 0.
    """
    dx, dy, ref = maps["dx"], maps["dy"], maps["ref"]
    nz = nz_cells.astype(bool)

    def edge(a_shift):
        def sh(x):
            return jnp.roll(x, 1, axis=a_shift)

        coeff = nz | sh(nz)
        moved = (dx != sh(dx)) | (dy != sh(dy)) | (ref != sh(ref))
        return jnp.where(coeff, 2, jnp.where(moved, 1, 0)).astype(jnp.int32)

    return edge(1), edge(0)   # vertical edges (left neighbor), horizontal
