"""Fractal + H.264 hybrid video codec — frame pipeline.

TPU re-design of the reference sequence loop (``FR/src/code.c:76`` main /
``FR/src/image.c:411`` encode_oneframe): every ``intra_period``-th frame is
coded intra, all others are fractal P frames:

  fractal search (Y, U, V trees) -> fractal reconstruction -> residual
  DCT/quant -> final reconstruction -> [deblock] -> becomes next reference.

All per-frame compute is one jitted function per frame type; the Python level
only loops over frames and moves uint8 planes in/out.  The intra path here is
an interim DC-predicted residual coder; the full H.264 intra RDO engine
replaces it in the intra-codec model (build plan §7 phase 4).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.config import CodecConfig
from ..utils.yuv import psnr
from ..ops import fractal as F
from ..ops import transform as T


def _pad16(plane: jnp.ndarray):
    h, w = plane.shape
    ph, pw = (-h) % 16, (-w) % 16
    if ph == 0 and pw == 0:
        return plane, h, w
    return jnp.pad(plane, ((0, ph), (0, pw)), mode="edge"), h, w


@dataclasses.dataclass
class FrameResult:
    frame_type: str
    psnr_y: float
    psnr_u: float
    psnr_v: float
    nonzero_coeffs: int
    recon: tuple  # (Y, U, V) uint8 numpy


class FractalCodec:
    """Sequence encoder with fractal P frames (reference capability F1-F10)."""

    def __init__(self, cfg: CodecConfig):
        self.cfg = cfg.validate()
        fr = cfg.fractal
        self._search = functools.partial(
            F.search_plane, search_range=fr.search_range, tol16=fr.tol_16,
            tol8=fr.tol_8, use_halfpel=fr.use_halfpel_refs)
        self._p_step = jax.jit(self._p_step_impl)
        self._i_step = jax.jit(self._i_step_impl)

    # -- intra step (interim: DC-128 prediction + residual coding) ---------
    def _i_step_impl(self, y, u, v):
        qp = self.cfg.qp_i
        cqp = T.chroma_qp(qp)
        outs = []
        zzs = []
        for plane, q in ((y, qp), (u, cqp), (v, cqp)):
            pred = jnp.full_like(plane, 128)
            zz, rec = T.residual_code_plane(plane, pred, q, intra=True,
                                            luma_mb_grid=False)
            outs.append(rec)
            zzs.append(zz)
        return tuple(zzs), tuple(outs)

    # -- fractal P step -----------------------------------------------------
    def _p_step_impl(self, y, u, v, ref_y, ref_u, ref_v):
        cfg = self.cfg
        qp = cfg.qp
        cqp = T.chroma_qp(qp)
        use_hp = cfg.fractal.use_halfpel_refs

        trees = []
        zzs = []
        recs = []
        for org, ref, q, is_luma in ((y, ref_y, qp, True),
                                     (u, ref_u, cqp, False),
                                     (v, ref_v, cqp, False)):
            orgp, h, w = _pad16(org)
            refp, _, _ = _pad16(ref)
            tree = self._search(orgp, refp)
            frec = F.reconstruct_plane(tree, refp, orgp.shape[0], orgp.shape[1],
                                       use_halfpel=use_hp)[:h, :w]
            zz, rec = T.residual_code_plane(org, frec, q, intra=False,
                                            luma_mb_grid=is_luma)
            trees.append(tree)
            zzs.append(zz)
            recs.append(rec)
        return tuple(trees), tuple(zzs), tuple(recs)

    # -- sequence loop ------------------------------------------------------
    def is_intra(self, frame_idx: int) -> bool:
        if frame_idx == 0:
            return True
        ip = self.cfg.intra_period
        return ip > 0 and frame_idx % ip == 0

    def encode_frame(self, yuv, ref=None, frame_idx: int = 0):
        """Encode one frame; returns (FrameResult, trees_or_None)."""
        y, u, v = (jnp.asarray(p, jnp.int32) for p in yuv)
        if self.is_intra(frame_idx) or ref is None:
            zzs, recs = self._i_step(y, u, v)
            trees = None
            ftype = "I"
        else:
            ry, ru, rv = (jnp.asarray(p, jnp.int32) for p in ref)
            trees, zzs, recs = self._p_step(y, u, v, ry, ru, rv)
            ftype = "P"
        recs = tuple(np.asarray(r, dtype=np.uint8) for r in recs)
        nz = int(sum(int((np.asarray(z) != 0).sum()) for z in zzs))
        res = FrameResult(
            frame_type=ftype,
            psnr_y=psnr(recs[0], np.asarray(y)),
            psnr_u=psnr(recs[1], np.asarray(u)),
            psnr_v=psnr(recs[2], np.asarray(v)),
            nonzero_coeffs=nz,
            recon=recs,
        )
        return res, trees

    def encode_sequence(self, frames, verbose: bool = False):
        """Encode an iterable of (Y, U, V) uint8 frames; returns FrameResults."""
        results = []
        ref = None
        for idx, yuv in enumerate(frames):
            res, _ = self.encode_frame(yuv, ref, idx)
            ref = res.recon
            results.append(res)
            if verbose:
                print(f"frame {idx:3d} {res.frame_type}  "
                      f"PSNR Y {res.psnr_y:6.2f}  U {res.psnr_u:6.2f}  "
                      f"V {res.psnr_v:6.2f}  nz {res.nonzero_coeffs}")
        return results
