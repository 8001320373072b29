"""Exact CAVLC residual bit costs, computed on device (JAX, batched).

The conformant TPU encoder makes Lagrangian RD decisions inside a jitted
per-frame graph, so it needs the *exact* number of bits that
``avc.cavlc.write_block`` would emit for a candidate block — recomputed
here as pure array math over ``[..., n]`` zig-zag level vectors.  The only
sequential piece of CAVLC is the level-VLC adaptation chain (vlcnum), which
is a fixed 16-step unrolled loop over scan ranks; everything else (token /
total_zeros / run_before table lookups) is vectorized gathers.

Bit-length semantics mirror ``JM/lencod/src/vlc.c:820-1340`` writers
(writeSyntaxElement_Level_VLC1/VLCN, writeCoeff4x4_CAVLC) exactly — the
host twin is :func:`h264tpu.avc.cavlc.block_bits`, tested equal.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..entropy.cavlc import (COEFF_TOKEN_LEN, TOTAL_ZEROS_LEN,
                             RUN_BEFORE_LEN, INC_VLC)
from .tables import CHROMA_DC_TOKEN_LEN, CHROMA_DC_TZ_LEN

_TOKEN_LEN = jnp.asarray(np.asarray(COEFF_TOKEN_LEN, np.int32))      # [3,4,17]
_TZ_LEN = jnp.asarray(np.asarray(TOTAL_ZEROS_LEN, np.int32))         # [15,16]
_RB_LEN = jnp.asarray(np.asarray(RUN_BEFORE_LEN, np.int32))          # [7,16]
_INC = jnp.asarray(np.asarray(INC_VLC, np.int32))                    # [7]
_CDC_TOKEN_LEN = jnp.asarray(np.asarray(CHROMA_DC_TOKEN_LEN, np.int32))
_CDC_TZ_LEN = jnp.asarray(np.asarray(CHROMA_DC_TZ_LEN, np.int32))


def _bitlen(x):
    """floor(log2(x)) + 1 for x >= 1 (0 -> 0), int32."""
    x = x.astype(jnp.int32)
    return jnp.where(x > 0, 32 - jax.lax.clz(jnp.maximum(x, 1)), 0)


def _level_len(labs, sign, vlcnum):
    """Length of one level code (labs >= 1), all traced int32 [...]."""
    # vlcnum == 0 (VLC1)
    l0 = jnp.where(
        labs < 8, 2 * labs - 1 + sign,
        jnp.where(labs < 16, jnp.int32(19),
                  28 + 2 * jnp.maximum(_bitlen(labs + 2032) - 12, 0)))
    # vlcnum >= 1 (VLCN)
    shift = vlcnum - 1
    escape = jnp.int32(15) << shift
    labn = labs - 1
    ln = (labn >> jnp.maximum(shift, 0)) + 1 + vlcnum
    lesc = labn - escape + 2048
    lesc_len = 28 + 2 * jnp.maximum(_bitlen(jnp.maximum(lesc, 1)) - 12, 0)
    lN = jnp.where(labn < escape, ln, lesc_len)
    return jnp.where(vlcnum == 0, l0, lN)


def block_fields(zz):
    """Vectorized CAVLC fields of [..., n] zig-zag levels.

    Returns dict with total, t1, total_zeros, lev_by_rank [..., n] (levels
    ordered by scan rank), run_by_rank [..., n] (zeros preceding each
    nonzero, by rank).
    """
    n = zz.shape[-1]
    zz = zz.astype(jnp.int32)
    nz = zz != 0
    total = nz.sum(axis=-1).astype(jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)
    last_pos = jnp.max(jnp.where(nz, idx, -1), axis=-1)
    total_zeros = last_pos + 1 - total

    # stable order: nonzero positions first, in scan order
    order = jnp.argsort(~nz, axis=-1, stable=True)
    lev_by_rank = jnp.take_along_axis(zz, order, axis=-1)
    pos_by_rank = jnp.take_along_axis(
        jnp.broadcast_to(idx, zz.shape), order, axis=-1)
    prev_pos = jnp.concatenate(
        [jnp.full((*zz.shape[:-1], 1), -1, jnp.int32),
         pos_by_rank[..., :-1]], axis=-1)
    run_by_rank = pos_by_rank - prev_pos - 1

    # trailing ones: rev_rank of the last nonzero with |lev| != 1
    rank = jnp.broadcast_to(idx, zz.shape)
    rev_rank = total[..., None] - 1 - rank
    non_one = (jnp.abs(lev_by_rank) != 1) & (rank < total[..., None])
    m = jnp.min(jnp.where(non_one, rev_rank, n), axis=-1)
    t1 = jnp.minimum(jnp.minimum(m, 3), total).astype(jnp.int32)
    return dict(total=total, t1=t1, total_zeros=total_zeros,
                lev_by_rank=lev_by_rank, run_by_rank=run_by_rank)


def block_bits(zz, nc, max_coeff: int, chroma_dc: bool = False):
    """Exact bit cost of ``avc.cavlc.write_block(w, zz, nc, max_coeff)``.

    zz: [..., max_coeff] traced int32 scan levels; nc: [...] traced int32
    (ignored when ``chroma_dc``); returns [...] int32 bit counts.
    """
    f = block_fields(zz)
    total, t1, tz = f["total"], f["t1"], f["total_zeros"]
    lev = f["lev_by_rank"]
    runs = f["run_by_rank"]
    n = zz.shape[-1]

    if chroma_dc:
        bits = _CDC_TOKEN_LEN[t1, total]
    else:
        nc = jnp.asarray(nc, jnp.int32)
        vt = jnp.where(nc < 2, 0, jnp.where(nc < 4, 1, jnp.where(nc < 8, 2, 3)))
        tbl = _TOKEN_LEN[jnp.minimum(vt, 2), t1, total]
        bits = jnp.where(vt == 3, jnp.int32(6), tbl)
    bits = bits + t1                                  # trailing-one signs

    # ---- level VLC chain over coding order (rank total-1-t1 down to 0) ----
    vlcnum = jnp.where((total > 10) & (t1 < 3), 1, 0).astype(jnp.int32)
    lth = ~((total > 3) & (t1 == 3))
    first_rank = total - 1 - t1                        # rank of first coded

    def lev_step(carry, i):
        bits, vlcnum = carry
        k = first_rank - i                             # rank being coded
        active = k >= 0
        lv = jnp.take_along_axis(lev, jnp.maximum(k, 0)[..., None],
                                 axis=-1)[..., 0]
        labs = jnp.abs(lv)
        sign = (lv < 0).astype(jnp.int32)
        is_first = i == 0
        adj = jnp.where(is_first & lth & active, labs - 1, labs)
        ln = _level_len(jnp.maximum(adj, 1), sign, vlcnum)
        bits = bits + jnp.where(active & (adj > 0), ln, 0)
        # special case: first coded level shrunk to 0 by the lth adjustment
        # cannot happen (adjusted |level| >= 1 because raw |level| >= 2 when
        # lth applies and it is not a trailing one... but |level|==1 beyond
        # t1==3 cap IS possible) — handle adj == 0 exactly: VLC1 length of
        # level 0 is labs*2-1+sign with labs=0 -> writer emits u(1, -1+sign);
        # in practice JM never hits it because t1 counts at most 3 ones and
        # the 4th-from-end one is coded unadjusted (lth False only when
        # t1 == 3).  When lth is True, t1 < 3 means the first coded level is
        # not +-1, so adj >= 1.  Assert-free: adj==0 contributes sign bits.
        bits = bits + jnp.where(active & (adj == 0), sign, 0)
        inc = (labs > _INC[jnp.minimum(vlcnum, 6)]).astype(jnp.int32)
        vlcnum = jnp.where(active, vlcnum + inc, vlcnum)
        vlcnum = jnp.where(active & is_first & (labs > 3),
                           jnp.maximum(vlcnum, 2), vlcnum)
        return (bits, vlcnum), None

    (bits, _), _ = jax.lax.scan(lev_step, (bits, vlcnum),
                                jnp.arange(n, dtype=jnp.int32))

    # ---- total_zeros ----
    has_tz = (total > 0) & (total < max_coeff)
    if chroma_dc:
        tz_len = _CDC_TZ_LEN[jnp.clip(total - 1, 0, 2), jnp.clip(tz, 0, 3)]
    else:
        tz_len = _TZ_LEN[jnp.clip(total - 1, 0, 14), jnp.clip(tz, 0, 15)]
    bits = bits + jnp.where(has_tz, tz_len, 0)

    # ---- run_before ----
    def run_step(carry, i):
        bits, zerosleft = carry
        k = total - 1 - i                              # rank, down to 1
        active = (k >= 1) & (zerosleft > 0)
        run = jnp.take_along_axis(runs, jnp.maximum(k, 0)[..., None],
                                  axis=-1)[..., 0]
        row = jnp.clip(zerosleft - 1, 0, 6)
        rl = _RB_LEN[row, jnp.clip(run, 0, 15)]
        bits = bits + jnp.where(active, rl, 0)
        zerosleft = jnp.where(active, zerosleft - run, zerosleft)
        return (bits, zerosleft), None

    (bits, _), _ = jax.lax.scan(run_step, (bits, tz),
                                jnp.arange(n - 1, dtype=jnp.int32))
    return jnp.where(total > 0, bits, bits * 1)


def block_bits_est(zz, nc, max_coeff: int, chroma_dc: bool = False):
    """Fast CHAIN-FREE CAVLC bit estimate for on-device RD costs.

    Exact: token / total_zeros table lengths, trailing-one signs, the
    level adjustment of the first coded level, and the run_before
    zerosleft rows (a suffix cumsum — no chain needed).  Approximate:
    the level-VLC adaptation (vlcnum) is modeled as init + 1 after the
    first coded level + one increment per earlier level with |l| > 3
    (the INC_VLC 0/3 thresholds; the rare 6/12/24/48 rungs are treated
    like 3), capped at 6.  Within ~1 bit of :func:`block_bits` on
    typical blocks at a fraction of its scan-chain op count; the emitted
    stream is unaffected (decisions only).
    """
    f = block_fields(zz)
    total, t1, tz = f["total"], f["t1"], f["total_zeros"]
    lev = f["lev_by_rank"]
    runs = f["run_by_rank"]
    n = zz.shape[-1]

    if chroma_dc:
        bits = _CDC_TOKEN_LEN[t1, total]
    else:
        nc = jnp.asarray(nc, jnp.int32)
        vt = jnp.where(nc < 2, 0, jnp.where(nc < 4, 1, jnp.where(nc < 8, 2, 3)))
        tbl = _TOKEN_LEN[jnp.minimum(vt, 2), t1, total]
        bits = jnp.where(vt == 3, jnp.int32(6), tbl)
    bits = bits + t1

    rank = jnp.arange(n, dtype=jnp.int32)
    first_rank = (total - 1 - t1)[..., None]            # rank coded first
    coded = rank <= jnp.maximum(first_rank, -1)
    coded = coded & (rank < (total - t1)[..., None])
    labs = jnp.abs(lev)
    sign = (lev < 0).astype(jnp.int32)

    # vlcnum model: coding order is rank first_rank down to 0
    init = jnp.where((total > 10) & (t1 < 3), 1, 0).astype(jnp.int32)
    is_first = rank == first_rank
    lth = ~((total > 3) & (t1 == 3))
    labs_adj = jnp.where(is_first & lth[..., None] & coded,
                         jnp.maximum(labs - 1, 1), labs)
    # suffix counts over HIGHER ranks (coded before rank r):
    big = (labs > 3) & coded
    csum = jnp.cumsum(big.astype(jnp.int32), axis=-1)
    big_after = csum[..., -1:] - csum                    # #{j > r: |l_j|>3}
    any_after = (first_rank - rank) > 0                  # a level coded before
    first_big = jnp.take_along_axis(
        labs, jnp.maximum(first_rank, 0), axis=-1) > 3
    first_inc = jnp.where(init[..., None] == 0, 1,
                          first_big.astype(jnp.int32))
    # big_after includes the first-coded level; its increment is the
    # first_inc term instead, so remove it from the >3 count
    later_big = big_after - jnp.where(any_after & first_big, 1, 0)
    vlc = init[..., None] \
        + jnp.where(any_after & coded, first_inc + later_big, 0)
    # JM first-level rule: |first| > 3 jumps vlcnum to >= 2 right after
    vlc = jnp.where(any_after & coded & first_big, jnp.maximum(vlc, 2),
                    vlc)
    vlc = jnp.clip(vlc, 0, 6)
    ln = _level_len(jnp.maximum(labs_adj, 1), sign, vlc)
    bits = bits + jnp.where(coded, ln, 0).sum(-1)

    has_tz = (total > 0) & (total < max_coeff)
    if chroma_dc:
        tz_len = _CDC_TZ_LEN[jnp.clip(total - 1, 0, 2), jnp.clip(tz, 0, 3)]
    else:
        tz_len = _TZ_LEN[jnp.clip(total - 1, 0, 14), jnp.clip(tz, 0, 15)]
    bits = bits + jnp.where(has_tz, tz_len, 0)

    # run_before: EXACT zerosleft rows via suffix sums (runs are coded
    # for ranks total-1 .. 1 while zerosleft > 0)
    rsum = jnp.cumsum(runs, axis=-1)
    run_above = rsum[..., -1:] - rsum                    # sum of runs j > r
    zerosleft = tz[..., None] - run_above
    run_coded = (rank >= 1) & (rank <= (total - 1)[..., None]) \
        & (zerosleft > 0)
    row = jnp.clip(zerosleft - 1, 0, 6)
    rb = _RB_LEN[row, jnp.clip(runs, 0, 15)]
    bits = bits + jnp.where(run_coded, rb, 0).sum(-1)
    return bits
