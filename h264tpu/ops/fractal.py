"""Fractal (PIFS) P-frame engine — batched TPU search, fit, and reconstruction.

TPU-first re-design of the reference thesis codec's fractal engine
(``FR/src/compute.c`` domain/range sum tables + closed-form fit,
``FR/src/block_enc.c`` quadtree search, ``FR/src/block_dec.c`` non-iterative
reconstruction).  Instead of per-block spiral loops, we evaluate the ENTIRE
``[blocks x candidates x references]`` lattice at once:

* domain sums at every pixel offset come from integral images (exact int32
  window sums via wrap-safe prefix-sum differencing) — replacing the 7-shape
  sum pyramids of ``compute_domain_Sum`` (``FR/src/compute.c:277``);
* the cross term Σr·d is computed once at 4x4-cell granularity for all offsets
  (``cross4``); every block shape's Σr·d is a cell-pool of it — replacing the
  per-candidate pixel loop ``compute_rdSum`` (``FR/src/compute.c:192``);
* the α/β least-squares fit + quantization and the closed-form RMS
  (``FR/src/compute.c:6`` compute_rms) are evaluated for all candidates
  simultaneously; ties resolve by spiral order then reference order, exactly
  reproducing the sequential strict-improvement scan of ``full_search``
  (``FR/src/block_enc.c:1933``);
* the quadtree descent 16x16 -> 8x8 -> {8x4,4x8} -> 4x4 with the
  normalized-correlation ("chun") gate (``FR/src/block_enc.c:847``) becomes a
  vectorized per-MB decision over precomputed per-shape best arrays.  (In the
  reference's active code path the 16x8/8x16 trial at MB level is dead code —
  its ``mode=4`` break is commented out — so a failing 16x16 always descends
  to the 8x8 quadtree; we reproduce that shape set.)

Deviations from the reference, by design:
* The reference never actually fills its half-pel planes H/M/N (the
  interpolation loops at ``FR/src/code.c:230-253`` are commented out), so its
  H/M/N searches read uninitialized memory.  We implement the documented
  behavior: H = horizontal, M = vertical, N = diagonal bilinear averages.
* Reconstruction uses an exact integer formula equal to the real-valued
  ``bound(0.5 + α·d + β − α·mean(d))`` of ``FR/src/block_dec.c:113``; the
  reference's double rounding can differ only when the true value sits exactly
  on an integer boundary.
* The α fit is evaluated in f32 from exact int32 sums (reference: float64);
  the quantized index can differ only within ~1e-4 of a lattice boundary.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

INF_RMS = jnp.float32(1e30)

# α lattice: a = α·100 ∈ [-235, 400] quantized by QUAN_A; β ∈ [-60,255] step 5
A_MIN, A_MAX = -235, 400
BETA_MIN, BETA_MAX = -60, 255


# ---------------------------------------------------------------------------
# Quantizers (FR/inc/defines_enc.h:591 QUAN_A)
# ---------------------------------------------------------------------------

def quan_a(x: jnp.ndarray) -> jnp.ndarray:
    """Exact replica of the reference's QUAN_A macro on int32 input.

    C semantics: ``b = x % 10; c = x / 10`` (both truncate toward zero);
    digits 3..7 -> 5, digits 8..9 -> carry to next ten, else 0.  For negative
    x the C ``%`` gives b <= 0, so negatives always truncate toward zero to a
    multiple of ten — a quirk we reproduce.
    """
    x = x.astype(jnp.int32)
    c = jnp.sign(x) * (jnp.abs(x) // 10)        # truncate toward zero
    b = x - c * 10
    mid = (b > 2) & (b < 8)
    hi = b > 7
    b_new = jnp.where(mid, 5, 0)
    c_new = jnp.where(hi, c + 1, c)
    return c_new * 10 + b_new


# ---------------------------------------------------------------------------
# Reference planes
# ---------------------------------------------------------------------------

def halfpel_planes(ref: jnp.ndarray):
    """Bilinear half-pel planes (H, M, N) from an int32 plane.

    Documented behavior of the reference (commented loops at
    ``FR/src/code.c:230-253``): truncating integer averages.  At frame edges
    we use edge replication (clamped neighbors) rather than the reference's
    copy-last-row rule — identical for H and M, and for N it makes the value
    a clamped average; chosen because it is exactly shard-invariant under
    row-tile halo exchange (h264tpu.parallel).
    """
    ref = ref.astype(jnp.int32)
    right = jnp.concatenate([ref[:, 1:], ref[:, -1:]], axis=1)
    down = jnp.concatenate([ref[1:, :], ref[-1:, :]], axis=0)
    downright = jnp.concatenate([right[1:, :], right[-1:, :]], axis=0)
    h = (ref + right) // 2
    m = (ref + down) // 2
    n = (ref + down + right + downright) // 4
    return h, m, n


def build_reference_stack(ref: jnp.ndarray, use_halfpel: bool) -> jnp.ndarray:
    """[R, H, W] int32 stack of reference planes: C (+H, M, N)."""
    ref = ref.astype(jnp.int32)
    if not use_halfpel:
        return ref[None]
    h, m, n = halfpel_planes(ref)
    return jnp.stack([ref, h, m, n])


# ---------------------------------------------------------------------------
# Sum tables
# ---------------------------------------------------------------------------

def integral_image(x: jnp.ndarray) -> jnp.ndarray:
    """[H, W] -> [H+1, W+1] int32 inclusive prefix sums with zero border.

    int32 overflow wraps (two's complement in XLA); window sums recovered by
    differencing are exact whenever the true window sum fits in int31, which
    holds for all our shapes (<= 255^2 * 256 ~ 1.7e7).
    """
    x = x.astype(jnp.int32)
    ii = jnp.cumsum(jnp.cumsum(x, axis=0, dtype=jnp.int32), axis=1, dtype=jnp.int32)
    return jnp.pad(ii, ((1, 0), (1, 0)))


def window_sums(ii: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Sliding sums over [y:y+h, x:x+w] for every top-left (y, x).

    Returns [H, W] (same size as the plane, zero-padded at invalid
    bottom/right positions where the window would cross the frame edge).
    """
    s = ii[h:, w:] - ii[:-h, w:] - ii[h:, :-w] + ii[:-h, :-w]
    return jnp.pad(s, ((0, h - 1), (0, w - 1)))


def range_cell_sums(org: jnp.ndarray):
    """Per aligned 4x4 cell Σr and Σr² -> two [H/4, W/4] int32 arrays
    (cf. ``compute_range_Sum``, FR/src/compute.c:686, collapsed to the 4x4
    base level — larger shapes pool these cells)."""
    o = org.astype(jnp.int32)
    h, w = o.shape
    c = o.reshape(h // 4, 4, w // 4, 4)
    s1 = c.sum(axis=(1, 3), dtype=jnp.int32)
    s2 = (c * c).sum(axis=(1, 3), dtype=jnp.int32)
    return s1, s2


def spiral_offsets(search_range: int) -> np.ndarray:
    """All (dx, dy) integer offsets in visit order of the reference's spiral
    scan (``full_search``, FR/src/block_enc.c:1944-1977): center first, then
    ring l = 1..SR starting at (-l,-l), running right, down, left, up.
    Index in the returned array IS the tie-break priority.
    Returns [nOff, 2] int32 (dx, dy)."""
    out = [(0, 0)]
    for l in range(1, search_range + 1):
        i = j = -l
        for k in range(8 * l):
            out.append((i, j))
            if k < 2 * l:
                i += 1
            elif k < 4 * l:
                j += 1
            elif k < 6 * l:
                i -= 1
            else:
                j -= 1
    return np.asarray(out, dtype=np.int32)


def candidate_offsets(search_range: int, mode: int = 0) -> np.ndarray:
    """Candidate (dx, dy) set for one of the reference's four search modes
    (``search_mode``, FR/src/code.c:87: 0=full, 1=new-hex, 2=UMHex, 3=hex).

    TPU-first re-expression: the reference's hexagon searches
    (``hexagon_block_search`` FR/src/block_enc.c:2647,
    ``new_hexagon_block_search`` :2374, ``UMHEXIntegerPelBlockMotionSearch``
    :2925) are iterative descents whose next probe depends on the last
    winner — serial, data-dependent control flow that cannot batch.  Here
    each mode is a STATIC subsampled lattice with the same coverage
    philosophy, evaluated in one batched pass with the running-best carry:

    - mode 3 (hex): dense 3x3 core + hexagonal lattice (1/4 density) over
      the +-SR window — the positions reachable by repeated big-hex hops.
    - mode 1 (new-hex): hex lattice plus dense horizontal/vertical cross
      arms (the "new" variant's extended cross step).
    - mode 2 (UMHex): UMHexagonS-style uneven multi-hexagon grid — dense
      +-2 square, every-2nd-pel cross arms to +-SR, and 16-point hexagons
      at scales k = 1..SR/4.

    Candidates are ordered by spiral priority (center first) so the
    lexicographic (rms, ref, position) tie-break keeps the reference's
    "earlier spiral position wins" semantics within the subset.
    """
    spiral = spiral_offsets(search_range)
    if mode == 0:
        return spiral
    sel = []
    for idx, (x, y) in enumerate(spiral):
        x, y = int(x), int(y)
        keep = max(abs(x), abs(y)) <= 1                       # dense core
        if mode == 3 or mode == 1:
            keep |= (y % 2 == 0) and ((x + y // 2) % 2 == 0)  # hex lattice
            if mode == 1:
                keep |= (x == 0) or (y == 0)                  # cross arms
        elif mode == 2:
            keep |= max(abs(x), abs(y)) <= 2                  # dense square
            keep |= (x == 0 or y == 0) and (x % 2 == 0 and y % 2 == 0)
            for k in range(1, search_range // 4 + 1):
                hexpts = {(4 * k, 0), (-4 * k, 0), (0, 4 * k), (0, -4 * k),
                          (2 * k, 3 * k), (2 * k, -3 * k),
                          (-2 * k, 3 * k), (-2 * k, -3 * k),
                          (4 * k, 2 * k), (4 * k, -2 * k),
                          (-4 * k, 2 * k), (-4 * k, -2 * k),
                          (4 * k, k), (-4 * k, k), (4 * k, -k), (-4 * k, -k)}
                keep |= (x, y) in hexpts
        if keep:
            sel.append(idx)
    return spiral[np.asarray(sel, dtype=np.int64)]


def cross_cell_sums(org: jnp.ndarray, ref_ctx: jnp.ndarray, offsets: np.ndarray,
                    chunk: int = 32, halo: int = 0) -> jnp.ndarray:
    """Σ r·d over each aligned 4x4 cell for every candidate offset.

    Returns ``cross4`` [nOff, H/4, W/4] int32.  This one array carries the
    cross term for EVERY block shape at every position (pool cells to get a
    shape's Σr·d), replacing the innermost pixel loop of the reference
    (``compute_rdSum``).  ``ref_ctx`` is [H + 2*halo, W] — the reference
    plane with ``halo`` context rows above and below (halo=0 for the
    unsharded path; parallel row-tiles pass exchanged halos).  Out-of-range
    taps read zero-padding; those candidates are masked by the bound check.
    """
    H, W = org.shape
    sr = int(np.abs(offsets).max())
    o = org.astype(jnp.int32)
    padded = jnp.pad(ref_ctx.astype(jnp.int32), ((sr, sr), (sr, sr)))
    offs = jnp.asarray(offsets)

    def one(off):
        dx, dy = off[0], off[1]
        shifted = jax.lax.dynamic_slice(padded, (sr + halo + dy, sr + dx), (H, W))
        prod = o * shifted
        return prod.reshape(H // 4, 4, W // 4, 4).sum(axis=(1, 3), dtype=jnp.int32)

    return jax.lax.map(one, offs, batch_size=chunk)


# ---------------------------------------------------------------------------
# α/β fit + RMS (compute_rms, FR/src/compute.c:6)
# ---------------------------------------------------------------------------

def fit_and_rms(n: int, s_r: jnp.ndarray, s_r2: jnp.ndarray, s_d: jnp.ndarray,
                s_d2: jnp.ndarray, s_rd: jnp.ndarray,
                a_min: int = A_MIN, a_max: int = A_MAX,
                beta_min: int = BETA_MIN, beta_max: int = BETA_MAX):
    """Closed-form least-squares fit with exact quantization + RMS.

    All inputs exact int32 sums over an N-pixel block (N a power of two);
    shapes broadcast.  Returns (a, beta, rms) broadcast to the common shape:
    ``a`` = quantized α·100 (int32), ``beta`` int32 multiple of 5, ``rms``
    f32 (1e30 where the fit is out of bounds, matching the reject path of
    compute_rms).
    """
    assert n & (n - 1) == 0, "block pixel count must be a power of two"
    s_r = s_r.astype(jnp.int32)
    s_d = s_d.astype(jnp.int32)

    if n == 256:
        # N·Σrd and Σr·Σd reach 2^32; compute num/256 and det/256 in f32 from
        # exact int32 pieces (products of 16/8-bit halves stay < 2^25).
        dh, dl = s_d >> 8, s_d & 255
        num = (s_rd - s_r * dh).astype(jnp.float32) - (s_r * dl).astype(jnp.float32) / 256.0
        det = (s_d2 - s_d * dh).astype(jnp.float32) - (s_d * dl).astype(jnp.float32) / 256.0
    else:
        num = (n * s_rd - s_r * s_d).astype(jnp.float32)   # |.| < 2^31 for n <= 128
        det = (n * s_d2 - s_d * s_d).astype(jnp.float32)
    det_zero = det == 0.0
    alpha = jnp.where(det_zero, 0.0, num / jnp.where(det_zero, 1.0, det))

    a_raw = jnp.clip(jnp.trunc(alpha * 100.0), -1e6, 1e6).astype(jnp.int32)
    a = jnp.where(det_zero, 0, quan_a(a_raw))
    beta = quan_a(s_r // n)                  # Σr >= 0 so // == C truncation
    ok = (a >= a_min) & (a <= a_max) & (beta >= beta_min) & (beta <= beta_max)

    aq = a.astype(jnp.float32) / 100.0
    bq = beta.astype(jnp.float32)
    mean_term = bq - aq * s_d.astype(jnp.float32) / n
    rms = (s_r2.astype(jnp.float32)
           + aq * (aq * s_d2.astype(jnp.float32) - 2.0 * s_rd.astype(jnp.float32)
                   + 2.0 * mean_term * s_d.astype(jnp.float32))
           + mean_term * (mean_term * n - 2.0 * s_r.astype(jnp.float32)))
    rms = jnp.where(ok, rms, INF_RMS)
    shape = jnp.broadcast_shapes(rms.shape, a.shape, beta.shape)
    return (jnp.broadcast_to(a, shape), jnp.broadcast_to(beta, shape),
            jnp.broadcast_to(rms, shape))


class ShapeBest(NamedTuple):
    """Best candidate per block of one shape grid, reduced over offsets and
    reference planes."""
    rms: jnp.ndarray      # [nby, nbx] f32
    a: jnp.ndarray        # quantized α·100, int32
    beta: jnp.ndarray     # int32
    dx: jnp.ndarray       # chosen offset, int32
    dy: jnp.ndarray
    ref: jnp.ndarray      # reference plane index, int32
    s_d: jnp.ndarray      # Σd of the chosen domain block, int32 (decoder needs mean d)


def _pool_cells(x: jnp.ndarray, ch: int, cw: int) -> jnp.ndarray:
    """Sum trailing [Cy, Cx] cells into non-overlapping (ch x cw) groups."""
    *lead, cy, cx = x.shape
    r = x.reshape(*lead, cy // ch, ch, cx // cw, cw)
    return r.sum(axis=(-3, -1), dtype=x.dtype)


SHAPE_LIST = ((16, 16), (8, 8), (4, 8), (8, 4), (4, 4))
_PRI_SENTINEL = np.int32(2**31 - 1)


# ---------------------------------------------------------------------------
# Pallas TPU kernel: fused cross-correlation core
# ---------------------------------------------------------------------------

def _plan_row_tiles(H: int, W: int, chunk: int,
                    budget_bytes: int = 6 << 20) -> int:
    """Pick a row-tile height TH dividing H so the kernel's output block
    (chunk x TH/4 x W int32) fits the VMEM budget."""
    max_th = max(budget_bytes // (chunk * W), 8)
    best = 8
    for th in range(8, H + 1, 8):
        if H % th == 0 and th <= max_th:
            best = th
    return best


def pallas_cross_rows(org: jnp.ndarray, ref_tiles: jnp.ndarray,
                      offs_np: np.ndarray, H: int, W: int, sr: int,
                      TH: int, interpret: bool = False):
    """Row-pooled cross products for a STATIC chunk of offsets on all refs.

    The fused hot loop of the fractal search (SURVEY §3.2 HOT LOOP #1 —
    ``compute_rdSum`` FR/src/compute.c:192 for every candidate at once):
    for each (ref plane, row tile) grid cell the kernel holds the org tile
    and the padded ref tile in VMEM and, for all chunk offsets, forms
    org * shifted_ref and reduces rows by 4 (the 4x4-cell row half) without
    ever materializing the product in HBM.  Offsets are compile-time
    constants (the spiral is fixed per config), so every shifted view is a
    static slice — exactly what Mosaic lowers best.

    org: [H, W] int32; ref_tiles: [R, T, TH+2sr, W+2sr] int32 (pre-tiled,
    halo folded in); offs_np: numpy [chunk, 2] (dx, dy).
    Returns [R, chunk, H/4, W] int32 (column pooling happens in XLA where a
    4-way lane reduction fuses for free).
    """
    from jax.experimental import pallas as pl

    R = ref_tiles.shape[0]
    T = H // TH
    chunk = offs_np.shape[0]
    org_tiles = org.reshape(T, TH, W)

    # sub-chunk the static unroll so per-call scoped VMEM stays bounded
    # (each unrolled iteration holds a [TH, W] int32 product temporary)
    SUB = 8
    outs = []
    for s0 in range(0, chunk, SUB):
        offs_list = [(int(dx), int(dy)) for dx, dy in offs_np[s0:s0 + SUB]]
        nk = len(offs_list)

        def kern(org_ref, ref_ref, out_ref, offs_list=offs_list):
            o = org_ref[0]
            for k, (dx, dy) in enumerate(offs_list):
                sh = ref_ref[0, 0, sr + dy:sr + dy + TH, sr + dx:sr + dx + W]
                prod = o * sh
                out_ref[0, 0, k] = prod.reshape(TH // 4, 4, W).sum(axis=1)

        outs.append(pl.pallas_call(
            kern,
            grid=(R, T),
            in_specs=[
                pl.BlockSpec((1, TH, W), lambda r, t: (t, 0, 0)),
                pl.BlockSpec((1, 1, TH + 2 * sr, W + 2 * sr),
                             lambda r, t: (r, t, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, nk, TH // 4, W),
                                   lambda r, t: (r, t, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((R, T, nk, TH // 4, W), jnp.int32),
            interpret=interpret,
        )(org_tiles, ref_tiles))
    out = jnp.concatenate(outs, axis=2) if len(outs) > 1 else outs[0]
    # [R, T, chunk, TH/4, W] -> [R, chunk, H/4, W]
    return out.transpose(0, 2, 1, 3, 4).reshape(R, chunk, H // 4, W)


def _build_ref_tiles(refs: jnp.ndarray, H: int, W: int, sr: int, halo: int,
                     TH: int) -> jnp.ndarray:
    """[R, H+2halo, W] -> [R, T, TH+2sr, W+2sr] overlapping row windows."""
    rp = jnp.pad(refs, ((0, 0), (sr, sr), (sr, sr)))
    T = H // TH
    tiles = [rp[:, t * TH + halo:t * TH + halo + TH + 2 * sr, :]
             for t in range(T)]
    return jnp.stack(tiles, axis=1)


def _search_all_shapes(org, refs, offsets, H, W, halo, y_lo, y_hi,
                       chunk: int = 16, impl: str = "scan",
                       interpret: bool = False, bounds=None):
    """Evaluate every (shape, block, offset, ref) candidate with a chunked
    scan over spiral offsets carrying the running best per shape.

    Never materializes the full candidate lattice: per scan step only
    ``chunk`` shifted reference slices live, domain sums come from strided
    slices of precomputed sliding-window maps, and the carry holds one
    best-candidate record per block.  Tie-break matches the reference
    exactly — lexicographic (rms, reference, spiral position), cf. the
    strict-< cascades of full_search (FR/src/block_enc.c:1933) and the
    C→H→M→N chain (:560-830).
    """
    n_ref = refs.shape[0]
    sr = int(np.abs(offsets).max())
    n_off = offsets.shape[0]
    n_pad = (-n_off) % chunk
    offs = np.concatenate([offsets, np.zeros((n_pad, 2), np.int32)])
    off_ok = np.concatenate([np.ones(n_off, bool), np.zeros(n_pad, bool)])
    n_steps = offs.shape[0] // chunk
    offs_j = jnp.asarray(offs.reshape(n_steps, chunk, 2))
    ok_j = jnp.asarray(off_ok.reshape(n_steps, chunk))
    spiral_j = jnp.asarray(
        np.arange(offs.shape[0], dtype=np.int64).reshape(n_steps, chunk))

    org = org.astype(jnp.int32)
    oc1, oc2 = range_cell_sums(org)
    rng_sums = {}
    for code, (bh, bw) in enumerate(SHAPE_LIST):
        rng_sums[code] = (_pool_cells(oc1, bh // 4, bw // 4),
                          _pool_cells(oc2, bh // 4, bw // 4))

    # sliding-window domain sums per (ref, shape, moment), padded by sr rows
    # and cols so any (dy, dx) shift is a static-size dynamic_slice
    def maps_for_ref(ref):
        ii1 = integral_image(ref)
        ii2 = integral_image(ref * ref)
        out = []
        for bh, bw in SHAPE_LIST:
            d1 = jnp.pad(window_sums(ii1, bh, bw), sr)
            d2 = jnp.pad(window_sums(ii2, bh, bw), sr)
            out.append((d1, d2))
        return out

    dom_maps = jax.vmap(
        lambda r: [jnp.stack(p) for p in maps_for_ref(r)])(refs)
    # dom_maps: list per shape of [R, 2, Hp, Wp]

    padded_refs = jnp.pad(refs, ((0, 0), (sr, sr), (sr, sr)))
    if impl == "pallas":
        TH = _plan_row_tiles(H, W, chunk)
        ref_tiles = _build_ref_tiles(refs, H, W, sr, halo, TH)

    # tie the init to a traced input so the carry is "varying" under
    # shard_map (a constant init has a different manual-axes type)
    vary0 = (org[0, 0] * 0).astype(jnp.int32)

    def init_best(code):
        bh, bw = SHAPE_LIST[code]
        nby, nbx = H // bh, W // bw
        z = jnp.zeros((nby, nbx), jnp.int32) + vary0
        return dict(rms=jnp.full((nby, nbx), INF_RMS) + vary0.astype(jnp.float32),
                    a=z, beta=z, dx=z, dy=z, ref=z, s_d=z,
                    pri=jnp.full((nby, nbx), _PRI_SENTINEL, jnp.int32) + vary0)

    carry0 = tuple(init_best(c) for c in range(len(SHAPE_LIST)))

    def chunk_step(carry, offs_c, ok_c, spiral_c, offs_np=None):
        # offs_c [chunk,2], ok_c [chunk], spiral_c [chunk]; offs_np = the
        # same offsets as STATIC numpy (pallas path: static in-kernel slices)
        def shifted(ref_pad, dy, dx):
            return jax.lax.dynamic_slice(ref_pad, (sr + halo + dy, sr + dx),
                                         (H, W))

        # cross products at cell granularity for all (ref, chunk)
        if offs_np is not None and impl == "pallas":
            rows = pallas_cross_rows(org, ref_tiles, offs_np, H, W, sr,
                                     TH, interpret=interpret)
            cross = rows.reshape(refs.shape[0], chunk, H // 4,
                                 W // 4, 4).sum(axis=-1, dtype=jnp.int32)
        elif offs_np is not None:
            # wide XLA: static offsets -> static shifted slices, fused
            # multiply+cell-pool per offset, no scan / no gathers
            sls = []
            for dx_k, dy_k in offs_np:
                sh = padded_refs[:, sr + halo + int(dy_k):
                                 sr + halo + int(dy_k) + H,
                                 sr + int(dx_k):sr + int(dx_k) + W]
                sls.append((org[None] * sh).reshape(
                    refs.shape[0], H // 4, 4, W // 4, 4).sum(
                    axis=(2, 4), dtype=jnp.int32))
            cross = jnp.stack(sls, axis=1)     # [R, chunk, cy, cx]
        else:
            def per_ref(ref_pad):
                def per_off(o):
                    s = shifted(ref_pad, o[1], o[0])
                    return (org * s).reshape(H // 4, 4, W // 4, 4).sum(
                        axis=(1, 3), dtype=jnp.int32)
                return jax.vmap(per_off)(offs_c)              # [chunk, H/4, W/4]

            cross = jax.vmap(per_ref)(padded_refs)            # [R, chunk, cy, cx]

        new_carry = []
        for code, (bh, bw) in enumerate(SHAPE_LIST):
            n = bh * bw
            ch, cw = bh // 4, bw // 4
            nby, nbx = H // bh, W // bw
            s_r, s_r2 = rng_sums[code]
            s_rd = _pool_cells(cross, ch, cw)                 # [R, chunk, nby, nbx]

            # domain sums at block origins + (dy, dx)
            if offs_np is not None:
                # static offsets: strided slices (fast; no gather)
                sls = []
                for dx_k, dy_k in offs_np:
                    y0_k = sr + halo + int(dy_k)
                    x0_k = sr + int(dx_k)
                    sls.append(dom_maps[code][
                        :, :, y0_k:y0_k + nby * bh:bh,
                        x0_k:x0_k + nbx * bw:bw])
                dm = jnp.stack(sls, axis=2)       # [R, 2, chunk, nby, nbx]
            else:
                # traced offsets: one gather for the whole chunk
                by_pix = jnp.arange(nby, dtype=jnp.int32) * bh
                bx_pix = jnp.arange(nbx, dtype=jnp.int32) * bw
                yi = sr + halo + offs_c[:, 1][:, None] + by_pix[None, :]
                xi = sr + offs_c[:, 0][:, None] + bx_pix[None, :]
                dm = dom_maps[code][:, :, yi[:, :, None], xi[:, None, :]]
            d1s, d2s = dm[:, 0], dm[:, 1]                     # [R, chunk, nby, nbx]

            a, beta, rms = fit_and_rms(
                n, s_r[None, None], s_r2[None, None], d1s, d2s, s_rd,
                *(bounds or (A_MIN, A_MAX, BETA_MIN, BETA_MAX)))

            # validity: domain inside [y_lo, y_hi) x [0, W); padded offsets off
            by = jnp.arange(nby, dtype=jnp.int32)[None, :] * bh   # [1, nby]
            bx = jnp.arange(nbx, dtype=jnp.int32)[None, :] * bw
            dy = offs_c[:, 1:2]
            dx = offs_c[:, 0:1]
            vy = ((by + dy >= y_lo) & (by + dy + bh <= y_hi))     # [chunk, nby]
            vx = ((bx + dx >= 0) & (bx + dx <= W - bw))           # [chunk, nbx]
            valid = (vy[:, :, None] & vx[:, None, :] & ok_c[:, None, None])
            rms = jnp.where(valid[None], rms, INF_RMS)

            # reduce (ref, chunk) by (rms, priority = ref*n_off + spiral)
            pri = (jnp.arange(n_ref, dtype=jnp.int32)[:, None] * (n_off + n_pad)
                   + spiral_c[None, :].astype(jnp.int32))          # [R, chunk]
            rms_f = rms.reshape(n_ref * chunk, nby, nbx)
            pri_f = pri.reshape(n_ref * chunk)
            best_rms = jnp.min(rms_f, axis=0)
            is_best = rms_f == best_rms[None]
            # among equals pick smallest priority
            pri_masked = jnp.where(is_best, pri_f[:, None, None], _PRI_SENTINEL)
            best_pri = jnp.min(pri_masked, axis=0)
            sel = jnp.argmin(pri_masked, axis=0)                  # [nby, nbx]

            def take(arr):
                return jnp.take_along_axis(
                    arr.reshape(n_ref * chunk, nby, nbx), sel[None], axis=0)[0]

            cand = dict(rms=best_rms, a=take(a), beta=take(beta),
                        dx=offs_c[(sel % chunk), 0],
                        dy=offs_c[(sel % chunk), 1],
                        ref=(sel // chunk).astype(jnp.int32),
                        s_d=take(d1s), pri=best_pri)

            old = carry[code]
            win = (cand["rms"] < old["rms"]) | (
                (cand["rms"] == old["rms"]) & (cand["pri"] < old["pri"]))
            merged = {k: jnp.where(win, cand[k], old[k]) for k in old}
            new_carry.append(merged)
        return tuple(new_carry)

    if impl in ("pallas", "wide"):
        # Python loop: offsets are compile-time constants, so every shifted
        # view is a static slice (in-kernel for pallas, XLA slices for wide)
        carry = carry0
        for s in range(n_steps):
            carry = chunk_step(carry, offs_j[s], ok_j[s], spiral_j[s],
                               offs_np=offs[s * chunk:(s + 1) * chunk])
    else:
        carry, _ = jax.lax.scan(
            lambda c, xs: (chunk_step(c, *xs), None), carry0,
            (offs_j, ok_j, spiral_j))
    out = []
    for code in range(len(SHAPE_LIST)):
        b = carry[code]
        out.append(ShapeBest(rms=b["rms"], a=b["a"], beta=b["beta"],
                             dx=b["dx"], dy=b["dy"], ref=b["ref"],
                             s_d=b["s_d"]))
    return out


class TransTree(NamedTuple):
    """Vectorized TRANS_NODE forest for one plane (cf. FR/inc/defines_enc.h:45).

    mb_split: [nMBy, nMBx] bool — True = 8x8 quadtree, False = 16x16 leaf.
    b8_mode:  [2nMBy, 2nMBx] int32 — 0: 8x8 leaf, 1: 8x4 halves, 2: 4x8
              halves, 3: 4x4 split (meaningful only under split MBs).
    s16/s8/s84/s48/s44: ShapeBest arrays on their natural grids.
    """
    mb_split: jnp.ndarray
    b8_mode: jnp.ndarray
    s16: ShapeBest
    s8: ShapeBest
    s84: ShapeBest
    s48: ShapeBest
    s44: ShapeBest


def chun_correlation(org, ref_c):
    """Squared normalized correlation of each 16x16 block with its co-located
    block in the C reference (``FR/src/block_enc.c:800-847``).  Returns
    [nMBy, nMBx] f32; NaN where either side has zero variance (which the
    reference's comparisons treat as "do not split")."""
    H, W = org.shape
    o = org.astype(jnp.float32).reshape(H // 16, 16, W // 16, 16)
    d = ref_c.astype(jnp.float32).reshape(H // 16, 16, W // 16, 16)
    om = o.mean(axis=(1, 3), keepdims=True)
    dm = d.mean(axis=(1, 3), keepdims=True)
    cov = ((o - om) * (d - dm)).sum(axis=(1, 3))
    var_o = ((o - om) ** 2).sum(axis=(1, 3))
    var_d = ((d - dm) ** 2).sum(axis=(1, 3))
    return cov * cov / (var_o * var_d)


def default_search_impl() -> str:
    """Default search implementation: "scan" (lax.scan over offset chunks).

    The alternatives are opt-in because the axon TPU runtime in this image
    faults on large one-shot graphs (the same backend limitation the codec
    works around by splitting per-stage jits — see FractalCodec.__init__):
    * "wide"   — python loop over static spiral chunks, XLA static slices,
      no gathers; bit-equivalent (test_search_impls_agree) but its large
      unrolled graph crashed the axon worker during round-2 bench runs;
    * "pallas" — fused VMEM cross kernel (pallas_cross_rows); bit-validated
      in interpret mode, ran at CIF on hardware, but repeated launches
      wedged the worker (~45 min recovery each).
    On a standard Cloud TPU runtime, benchmark "wide"/"pallas" and flip this
    default.
    """
    return "scan"


def search_plane(org: jnp.ndarray, ref_ctx: jnp.ndarray, *, search_range: int,
                 tol16: float, tol8: float, use_halfpel: bool = True,
                 cross_chunk: int = 64, halo: int = 0, y_lo=None,
                 y_hi=None, search_mode: int = 0,
                 use_pallas=None, interpret: bool = False,
                 chun_lo: float = 0.9, chun_hi: float = 1.0,
                 bounds=None, impl: str = None,
                 extra_ref_ctx=None) -> TransTree:
    """Full fractal search of one plane against the previous reconstruction.

    The TPU expression of ``encode_one_macroblock`` (FR/src/block_enc.c:508)
    run over every MB at once.  ``org`` is [H, W] int32-like (H, W multiples
    of 16); ``ref_ctx`` is [H + 2*halo, W] (halo = exchanged context rows for
    sharded row-tiles; 0 for the single-device path).  y_lo/y_hi bound valid
    domain rows in org coordinates (traced scalars under shard_map).
    """
    H, W = org.shape
    assert H % 16 == 0 and W % 16 == 0
    org = org.astype(jnp.int32)
    refs = build_reference_stack(ref_ctx, use_halfpel)
    if extra_ref_ctx is not None:
        # dual reference frames (stereo side views, FR/src/block_enc.c
        # C->H->M->N chain per view + cross-view full_search_R :2031):
        # plane indices 0..R-1 = first frame, R..2R-1 = second frame; the
        # (rms, ref, spiral) tie-break then reproduces the reference's
        # strict-improvement reference order
        refs = jnp.concatenate(
            [refs, build_reference_stack(extra_ref_ctx, use_halfpel)], axis=0)
    offsets = candidate_offsets(search_range, search_mode)
    if y_lo is None:
        y_lo = 0
    if y_hi is None:
        y_hi = H

    if impl is None:
        if use_pallas is True:
            impl = "pallas"
        elif use_pallas is False:
            impl = "scan"
        else:
            impl = default_search_impl()
    s16, s8, s84, s48, s44 = _search_all_shapes(
        org, refs, offsets, H, W, halo, y_lo, y_hi, chunk=cross_chunk,
        impl=impl, interpret=interpret, bounds=bounds)

    # --- decision tree ---
    chun = chun_correlation(org, refs[0][halo:halo + H])
    # split only when correlation gate AND tolerance both fail the 16x16
    # (block_enc.c:847: if(chun<=1 && chun>=0.9 && rms > tol^2*no) -> split)
    mb_split = ((chun <= jnp.float32(chun_hi)) & (chun >= jnp.float32(chun_lo))
                & (s16.rms > jnp.float32(tol16 * tol16 * 256)))

    t8 = jnp.float32(tol8 * tol8 * 64)
    t_rect = jnp.float32(tol8 * tol8 * 32)
    accept8 = s8.rms <= t8                                        # [2nMBy, 2nMBx]
    # "both halves pass" per 8x8 block; 8x4 tried first, then 4x8
    # (encode_block_8, FR/src/block_enc.c:1583-1650)
    both84 = (s84.rms.reshape(H // 8, 2, W // 8) <= t_rect).all(axis=1)
    both48 = (s48.rms.reshape(H // 8, W // 8, 2) <= t_rect).all(axis=2)

    b8_mode = jnp.where(accept8, 0,
               jnp.where(both84, 1,
                jnp.where(both48, 2, 3))).astype(jnp.int32)

    return TransTree(mb_split=mb_split, b8_mode=b8_mode,
                     s16=s16, s8=s8, s84=s84, s48=s48, s44=s44)


# ---------------------------------------------------------------------------
# Reconstruction (decode_one_macroblock, FR/src/block_dec.c:20)
# ---------------------------------------------------------------------------

def _upsample(x: jnp.ndarray, fy: int, fx: int) -> jnp.ndarray:
    return jnp.repeat(jnp.repeat(x, fy, axis=0), fx, axis=1)


# shape codes used in leaf maps / the bitstream
SHAPES = ((16, 16), (8, 8), (4, 8), (8, 4), (4, 4))  # (bh, bw) per code 0..4


def leaf_maps(tree: TransTree, H: int, W: int):
    """Resolve the quadtree into per-4x4-cell leaf parameter maps.

    Returns dict of [H/4, W/4] int32 maps: a, beta, dx, dy, ref, shape
    (index into SHAPES).  Everything a decoder needs — domain sums are
    recomputed from the reference planes at decode time.
    """
    def sel(name):
        v16 = _upsample(getattr(tree.s16, name), 4, 4)
        v8 = _upsample(getattr(tree.s8, name), 2, 2)
        v84 = _upsample(getattr(tree.s84, name), 1, 2)
        v48 = _upsample(getattr(tree.s48, name), 2, 1)
        v44 = getattr(tree.s44, name)
        m8 = _upsample(tree.b8_mode, 2, 2)
        under8 = jnp.where(m8 == 0, v8,
                  jnp.where(m8 == 1, v84,
                   jnp.where(m8 == 2, v48, v44)))
        split = _upsample(tree.mb_split, 4, 4)
        return jnp.where(split, under8, v16)

    m8 = _upsample(tree.b8_mode, 2, 2)
    shape_under8 = jnp.where(m8 == 0, 1, jnp.where(m8 == 1, 2,
                    jnp.where(m8 == 2, 3, 4)))
    shape = jnp.where(_upsample(tree.mb_split, 4, 4), shape_under8, 0)

    return dict(a=sel("a"), beta=sel("beta"), dx=sel("dx"), dy=sel("dy"),
                ref=sel("ref"), shape=shape.astype(jnp.int32))


def reconstruct_from_maps(maps: dict, ref_ctx: jnp.ndarray, H: int, W: int,
                          use_halfpel: bool = True, halo: int = 0,
                          extra_ref_ctx=None) -> jnp.ndarray:
    """Non-iterative fractal reconstruction of a whole plane from leaf maps.

    Exact integer form of ``rec = bound(0.5 + α·d + β − α·mean(d))``
    (FR/src/block_dec.c:113): with a = α·100, N the leaf pixel count and
    S = Σd over the leaf's domain block,
    ``rec = clip(floor((50N + a(dN − S) + 100Nβ) / (100N)), 0, 255)``.
    S is recomputed here from the reference planes (the decoder path does not
    receive it in the stream), exactly like the decoder-side sum tables of the
    reference (``FR/src/block_dec.c:135-230``).  ``ref_ctx`` is
    [H + 2*halo, W] as in :func:`search_plane`.
    """
    refs = build_reference_stack(ref_ctx, use_halfpel)
    if extra_ref_ctx is not None:
        refs = jnp.concatenate(
            [refs, build_reference_stack(extra_ref_ctx, use_halfpel)], axis=0)
    He = H + 2 * halo

    up = functools.partial(_upsample, fy=4, fx=4)
    a = up(maps["a"])
    beta = up(maps["beta"])
    dx = up(maps["dx"])
    dy = up(maps["dy"])
    ref = up(maps["ref"])
    shape = up(maps["shape"])

    # per-pixel leaf geometry
    yy_pix = jnp.arange(H, dtype=jnp.int32)[:, None] + jnp.zeros((1, W), jnp.int32)
    xx_pix = jnp.arange(W, dtype=jnp.int32)[None, :] + jnp.zeros((H, 1), jnp.int32)
    bh = jnp.asarray([s[0] for s in SHAPES], jnp.int32)[shape]
    bw = jnp.asarray([s[1] for s in SHAPES], jnp.int32)[shape]
    oy = yy_pix - yy_pix % bh          # leaf origin
    ox = xx_pix - xx_pix % bw
    log2n = jnp.asarray([8, 6, 5, 5, 4], jnp.int32)[shape]

    # domain pixel for this output pixel (ext row coords)
    yy = jnp.clip(yy_pix + dy + halo, 0, He - 1)
    xx = jnp.clip(xx_pix + dx, 0, W - 1)
    d = jnp.take(refs.reshape(-1), (ref * (He * W) + yy * W + xx).reshape(-1)
                 ).reshape(H, W)

    # Σd over the leaf's domain block, per shape, gathered at the leaf origin
    dom_y = jnp.clip(oy + dy + halo, 0, He - 1)
    dom_x = jnp.clip(ox + dx, 0, W - 1)

    def wsums_for_ref(r):
        ii = integral_image(r)
        per_shape = jnp.stack([window_sums(ii, sh, sw) for sh, sw in SHAPES])
        return per_shape                                   # [5, He, W]

    wsums = jax.vmap(wsums_for_ref)(refs)                  # [R, 5, He, W]
    flat = (ref * (5 * He * W) + shape * (He * W) + dom_y * W + dom_x)
    s_d = jnp.take(wsums.reshape(-1), flat.reshape(-1)).reshape(H, W)

    n = (jnp.int32(1) << log2n)
    numer = 50 * n + a * (d * n - s_d) + 100 * n * beta
    rec = jnp.floor_divide(numer, 100 * n)
    return jnp.clip(rec, 0, 255)


def reconstruct_plane(tree: TransTree, ref_ctx: jnp.ndarray, H: int, W: int,
                      use_halfpel: bool = True, halo: int = 0,
                      extra_ref_ctx=None) -> jnp.ndarray:
    """Encoder-side reconstruction: resolve the tree then reconstruct."""
    return reconstruct_from_maps(leaf_maps(tree, H, W), ref_ctx, H, W,
                                 use_halfpel, halo,
                                 extra_ref_ctx=extra_ref_ctx)
