"""Sequence driver for the TPU-resident conformant H.264 encoder.

Same API shape as :class:`h264tpu.avc.codec.AVCCodec` but every frame's
decisions/residuals are computed by the jitted device graph
(``avc/tpu_enc.py``); the host packs bits (``avc/pack.py``), applies the
spec deblocking filter, and assembles the Annex-B stream.  Reference
pictures stay device-resident as quarter-pel grids between frames.

Reference: ``JM/lencod/src/lencod.c:876`` encode_sequence.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from .params import AVCParams, assemble_stream
from .codec import AVCFrameResult
from .deblock import DeblockContext, deblock_frame
from . import conformance
from . import tpu_enc as TE
from . import pack as PK

_prep_ref = functools.partial(jax.jit, static_argnames="sr")(TE.prep_ref)


class TPUAVCCodec:
    """Baseline/CAVLC H.264 encoder with all pixel work on device."""

    def __init__(self, p: AVCParams, intra_period: int = 0,
                 search_range: int = 16, check_conformance: bool = True):
        if p.slice_groups != 1:
            raise ValueError("TPU path is single-slice; use AVCCodec for FMO")
        self.p = p
        self.intra_period = intra_period
        self.sr = search_range
        if check_conformance:
            conformance.check_params(p)
        self._dummy = None

    def _is_idr(self, idx: int) -> bool:
        if idx == 0:
            return True
        return self.intra_period > 0 and idx % self.intra_period == 0

    def _dummy_refs(self):
        """Zero reference stack for intra frames (static shapes, R=1)."""
        if self._dummy is None:
            p, sr = self.p, self.sr
            P, PC = TE.luma_pad(sr), TE.chroma_pad(sr)
            H, W = p.height, p.width
            self._dummy = (
                jnp.zeros((1, 4 * (H + 2 * P), 4 * (W + 2 * P)), jnp.int32),
                jnp.zeros((1, H // 2 + 2 * PC, W // 2 + 2 * PC), jnp.int32),
                jnp.zeros((1, H // 2 + 2 * PC, W // 2 + 2 * PC), jnp.int32))
        return self._dummy

    def encode_sequence(self, frames, qp: int = None, verbose: bool = False,
                        force_intra=None):
        """frames: iterable of (Y, U, V) uint8.  Returns
        (results, Annex-B stream bytes) like AVCCodec.encode_sequence."""
        p = self.p
        qp = p.qp if qp is None else qp
        R = max(p.num_ref_frames, 1)
        mb_h, mb_w = p.mb_h, p.mb_w
        no_force = jnp.zeros((mb_h, mb_w), bool)

        slices, results = [], []
        dpb = []                               # (up, u_pad, v_pad), newest 1st
        frame_num = 0
        idr_pic_id = 0
        for idx, yuv in enumerate(frames):
            y, u, v = (jnp.asarray(np.asarray(pl), jnp.int32) for pl in yuv)
            idr = self._is_idr(idx)
            if idr:
                ups, us, vs = self._dummy_refs()
                sym, rec, tctx = TE.encode_frame(
                    y, u, v, ups, us, vs, jnp.int32(qp), jnp.int32(0),
                    no_force, mb_h=mb_h, mb_w=mb_w, sr=self.sr,
                    intra_only=True,
                    chroma_qp_offset=p.chroma_qp_offset)
                sym = jax.device_get(sym)
                rbsp = PK.pack_i_slice(sym, p, qp, frame_num=0, idr=True,
                                       idr_pic_id=idr_pic_id)
                idr_pic_id = (idr_pic_id + 1) & 0xFFFF
                frame_num = 1
                dpb = []
                ftype = "IDR"
            else:
                n_valid = min(len(dpb), R)
                refs = [dpb[i if i < n_valid else n_valid - 1]
                        for i in range(R)]
                ups = jnp.stack([r[0] for r in refs])
                us = jnp.stack([r[1] for r in refs])
                vs = jnp.stack([r[2] for r in refs])
                fim = force_intra(idx) if force_intra else None
                fim = no_force if fim is None else jnp.asarray(fim, bool)
                sym, rec, tctx = TE.encode_frame(
                    y, u, v, ups, us, vs, jnp.int32(qp), jnp.int32(n_valid),
                    fim, mb_h=mb_h, mb_w=mb_w, sr=self.sr, intra_only=False,
                    chroma_qp_offset=p.chroma_qp_offset)
                sym = jax.device_get(sym)
                rbsp = PK.pack_p_slice(sym, p, qp, frame_num=frame_num,
                                       num_ref=n_valid)
                frame_num = (frame_num + 1) % (1 << p.log2_max_frame_num)
                ftype = "P"

            rec_np = tuple(np.asarray(pl, np.int64) for pl in rec)
            if p.deblock:
                ctx = DeblockContext(mb_w, mb_h, qp, p.chroma_qp_offset)
                if ftype != "IDR":
                    tctx = jax.device_get(tctx)
                    ctx.mb_intra = np.asarray(tctx["mb_intra"])
                    ctx.nnz = np.asarray(tctx["nnz"], np.int64)
                    ctx.mv = np.asarray(tctx["mv"], np.int64)
                    ctx.ref = np.asarray(tctx["ref"], np.int64)
                rec_np = deblock_frame(*rec_np, ctx)
            dpb.insert(0, _prep_ref(jnp.asarray(rec_np[0]),
                                    jnp.asarray(rec_np[1]),
                                    jnp.asarray(rec_np[2]), sr=self.sr))
            dpb = dpb[:R]
            slices.append((idr, rbsp))
            rec8 = tuple(np.asarray(pl, np.uint8) for pl in rec_np)
            mse = ((np.asarray(yuv[0], np.float64) - rec8[0]) ** 2).mean()
            res = AVCFrameResult(
                frame_type=ftype, bits=len(rbsp) * 8,
                psnr_y=99.99 if mse == 0 else
                float(10 * np.log10(255.0 ** 2 / mse)),
                recon=rec8)
            results.append(res)
            if verbose:
                print(f"frame {idx:3d} {ftype:3s} bits {res.bits:7d} "
                      f"PSNR-Y {res.psnr_y:6.2f}")
        return results, assemble_stream(p, slices)
