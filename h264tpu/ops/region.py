"""Object/region-based fractal coding (SURVEY F24).

TPU-native equivalent of the reference's region path: with ``Num_Regions=2``
each 16x16 range block is fitted **per object** against the alpha-plane masks
(`classify`, FR/src/compute.c:218): only range pixels of the block whose
current-frame mask matches the object enter the fit; domain pixels whose
reference-frame mask does NOT match are replaced by the average of the
matching domain pixels (compute.c:246-273).  Blocks that straddle both
objects are coded once per object and merged pixel-wise by the mask
(block_enc.c:523-561 `region` 0/1/2 logic; block_dec.c:32-151 per-region
reconstruction into ``imgY_rec_region[i]``).

The masks are side information available to encoder and decoder alike, as in
the reference (alpha planes read from ``Infile_*_plane`` files,
FR/src/image.c:96-103); :mod:`h264tpu.ops.segment` produces them.

TPU design: the per-candidate masked sums are five cross-correlations
(m_r x m_d, m_r x m_d.d, m_r x m_d.d^2, m_r.r x m_d.d, m_r.r x m_d) pooled
to 16x16 cells — the same batched candidate-lattice pattern as the main
search (ops/fractal.cross_cell_sums), evaluated for the whole frame at every
spiral offset in one `lax.map`.  The variable pixel count N (= masked range
pixels, `no` in compute.c:257) makes the fit per-block-variable, so the
closed form runs in f32 assembled from exact int32 split pieces (each piece
< 2^24, so every term is exact; only the final 4-way sum rounds).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .fractal import (A_MAX, A_MIN, BETA_MAX, BETA_MIN, INF_RMS,
                      build_reference_stack, quan_a, spiral_offsets)
from .segment import GREY_LEVELS

MB = 16
_NPIX = MB * MB


def _pool16(x):
    H, W = x.shape
    return x.reshape(H // MB, MB, W // MB, MB).sum(axis=(1, 3), dtype=jnp.int32)


def _split_mul(a, b):
    """Exact f32 value of int32 product a*b (a,b >= 0, a*b < 2^40):
    a*(b>>8)*256 + a*(b&255), each int32 piece < 2^24."""
    return (a * (b >> 8)).astype(jnp.float32) * 256.0 + \
        (a * (b & 255)).astype(jnp.float32)


def _masked_fit(n, s_r, s_r2, s_d, s_d2, s_rd):
    """compute_rms (FR/src/compute.c:6) with variable N (= `no`, masked range
    pixel count).  All sums int32; returns (a=alpha*100, beta, rms f32)."""
    num = _split_mul(n, s_rd) - _split_mul(s_r, s_d)
    det = _split_mul(n, s_d2) - _split_mul(s_d, s_d)
    det_zero = det == 0.0
    alpha = jnp.where(det_zero, 0.0, num / jnp.where(det_zero, 1.0, det))
    a = jnp.where(det_zero, 0,
                  quan_a(jnp.clip(jnp.trunc(alpha * 100.0), -1e6, 1e6)
                         .astype(jnp.int32)))
    n1 = jnp.maximum(n, 1)
    beta = quan_a(s_r // n1)
    ok = (n > 0) & (a >= A_MIN) & (a <= A_MAX) & \
        (beta >= BETA_MIN) & (beta <= BETA_MAX)

    aq = a.astype(jnp.float32) / 100.0
    bq = beta.astype(jnp.float32)
    nf = n1.astype(jnp.float32)
    mean_term = bq - aq * s_d.astype(jnp.float32) / nf
    rms = (s_r2.astype(jnp.float32)
           + aq * (aq * s_d2.astype(jnp.float32)
                   - 2.0 * s_rd.astype(jnp.float32)
                   + 2.0 * mean_term * s_d.astype(jnp.float32))
           + mean_term * (mean_term * nf - 2.0 * s_r.astype(jnp.float32)))
    return (jnp.where(ok, a, 0), jnp.where(ok, beta, 0),
            jnp.where(ok, rms, INF_RMS))


def _effective_sums(n_r, s_r, n_m, s_dm, s_d2m, s_rdm, s_rm):
    """Average-replacement of mismatched domain pixels (compute.c:258-273):
    avg = trunc(Σ_match d / n_match) (unsigned char cast in the reference),
    then every non-matching domain pixel contributes avg."""
    avg = jnp.where(n_m > 0, s_dm // jnp.maximum(n_m, 1), 0)
    miss = n_r - n_m
    s_d = s_dm + miss * avg
    s_d2 = s_d2m + miss * avg * avg
    s_rd = s_rdm + (s_r - s_rm) * avg
    return avg, s_d, s_d2, s_rd


@functools.partial(jax.jit, static_argnames=("search_range", "use_halfpel"))
def region_search_plane(org, ref, mask_cur, mask_ref, *, search_range: int,
                        use_halfpel: bool = True):
    """Masked 16x16 fractal search for both objects of a 2-region alpha plane.

    Returns a dict of [2, H/16, W/16] arrays: a, beta, dx, dy, ref, rms,
    n (masked pixel count) — object axis first (0 = background, 1 = object).
    Offsets scan in spiral order with first-minimum tie-break, like the
    reference full search (block_enc.c:1933).
    """
    org = jnp.asarray(org, jnp.int32)
    H, W = org.shape
    refs = build_reference_stack(jnp.asarray(ref, jnp.int32), use_halfpel)
    offsets = jnp.asarray(spiral_offsets(search_range))
    sr = search_range
    n_off = offsets.shape[0]

    m_cur = jnp.asarray(mask_cur, jnp.int32) // GREY_LEVELS
    m_ref = jnp.asarray(mask_ref, jnp.int32) // GREY_LEVELS

    oy = jnp.arange(H // MB, dtype=jnp.int32)[:, None] * MB
    ox = jnp.arange(W // MB, dtype=jnp.int32)[None, :] * MB

    def per_obj(obj):
        mr = (m_cur == obj).astype(jnp.int32)
        md = (m_ref == obj).astype(jnp.int32)
        mr_r = mr * org
        n_r = _pool16(mr)                       # [nby, nbx]
        s_r = _pool16(mr_r)
        s_r2 = _pool16(mr * org * org)

        def per_ref(rp):
            md_d = md * rp
            md_d2 = md * rp * rp
            pad = lambda x: jnp.pad(x, ((sr, sr), (sr, sr)))
            p_md, p_mdd, p_mdd2 = pad(md), pad(md_d), pad(md_d2)

            def per_off(off):
                dx, dy = off[0], off[1]
                sl = lambda p: jax.lax.dynamic_slice(p, (sr + dy, sr + dx),
                                                     (H, W))
                smd, smdd, smdd2 = sl(p_md), sl(p_mdd), sl(p_mdd2)
                n_m = _pool16(mr * smd)
                s_dm = _pool16(mr * smdd)
                s_d2m = _pool16(mr * smdd2)
                s_rdm = _pool16(mr_r * smdd)
                s_rm = _pool16(mr_r * smd)
                avg, s_d, s_d2, s_rd = _effective_sums(
                    n_r, s_r, n_m, s_dm, s_d2m, s_rdm, s_rm)
                a, beta, rms = _masked_fit(n_r, s_r, s_r2, s_d, s_d2, s_rd)
                valid = ((oy + dy >= 0) & (oy + dy + MB <= H) &
                         (ox + dx >= 0) & (ox + dx + MB <= W))
                return a, beta, jnp.where(valid, rms, INF_RMS)

            return jax.lax.map(per_off, offsets,
                               batch_size=min(16, n_off))  # [nOff, nby, nbx]

        a_all, b_all, rms_all = jax.vmap(per_ref)(refs)    # [R, nOff, ...]
        R = refs.shape[0]
        rms_flat = rms_all.reshape(R * n_off, *rms_all.shape[2:])
        # reference tries refs C→H→M→N in order, keeping strict improvement;
        # spiral first-minimum within a ref: flat argmin (ref-major) matches.
        best = jnp.argmin(rms_flat, axis=0)
        take = lambda x: jnp.take_along_axis(
            x.reshape(R * n_off, *x.shape[2:]), best[None], axis=0)[0]
        off_idx = best % n_off
        return dict(
            a=take(a_all), beta=take(b_all),
            rms=jnp.take_along_axis(rms_flat, best[None], axis=0)[0],
            dx=offsets[off_idx, 0], dy=offsets[off_idx, 1],
            ref=(best // n_off).astype(jnp.int32), n=n_r)

    out0, out1 = per_obj(0), per_obj(1)
    return {k: jnp.stack([out0[k], out1[k]]) for k in out0}


@functools.partial(jax.jit, static_argnames=("use_halfpel",))
def region_reconstruct(params, ref, mask_cur, mask_ref,
                       use_halfpel: bool = True):
    """Merged reconstruction from per-object 16x16 params + alpha masks.

    Per object: rec = clip(trunc(0.5 + α·d_eff + β − α·S_eff/N)) with
    d_eff = d where the domain mask matches, else the matching-domain average
    (block_dec.c:32-151); pixels merge by the current-frame mask.  Runs the
    same on encoder and decoder — masks are side information on both ends.
    """
    m_cur = jnp.asarray(mask_cur, jnp.int32) // GREY_LEVELS
    m_ref = jnp.asarray(mask_ref, jnp.int32) // GREY_LEVELS
    H, W = m_cur.shape
    refs = build_reference_stack(jnp.asarray(ref, jnp.int32), use_halfpel)

    yy = jnp.arange(H, dtype=jnp.int32)[:, None] + jnp.zeros((1, W), jnp.int32)
    xx = jnp.arange(W, dtype=jnp.int32)[None, :] + jnp.zeros((H, 1), jnp.int32)
    up = lambda m: jnp.repeat(jnp.repeat(m, MB, 0), MB, 1)

    def per_obj(obj):
        p = {k: params[k][obj] for k in params}
        a, beta = up(p["a"]), up(p["beta"])
        dx, dy, ridx = up(p["dx"]), up(p["dy"]), up(p["ref"])
        sy = jnp.clip(yy + dy, 0, H - 1)
        sx = jnp.clip(xx + dx, 0, W - 1)
        d = jnp.take(refs.reshape(-1),
                     (ridx * (H * W) + sy * W + sx).reshape(-1)).reshape(H, W)
        md = jnp.take(m_ref.reshape(-1), (sy * W + sx).reshape(-1)
                      ).reshape(H, W) == obj
        mr = (m_cur == obj).astype(jnp.int32)

        match = mr * md.astype(jnp.int32)
        n_m = up(_pool16(match))
        s_dm = up(_pool16(match * d))
        avg = jnp.where(n_m > 0, s_dm // jnp.maximum(n_m, 1), 0)
        d_eff = jnp.where(md, d, avg)
        n_r = up(_pool16(mr))
        # S_eff = Σ over masked range pixels of d_eff
        s_eff = up(_pool16(mr * d_eff))

        n1 = jnp.maximum(n_r, 1)
        numer = 50 * n1 + a * (d_eff * n1 - s_eff) + 100 * n1 * beta
        rec = jnp.clip(jnp.floor_divide(numer, 100 * n1), 0, 255)
        return rec

    rec0, rec1 = per_obj(0), per_obj(1)
    return jnp.where(m_cur == 0, rec0, rec1).astype(jnp.int32)
