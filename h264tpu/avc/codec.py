"""High-level conformant H.264 codec driver (the ``lencod``-shaped API).

Ties the avc layer together the way ``JM/lencod/src/lencod.c:876``
encode_sequence does: GOP scheduling (IDR period), multi-reference DPB,
deblocking, Annex-B assembly, per-frame stats — emitting streams that JM
18.5 ``ldecod`` (and :class:`h264tpu.avc.slice_dec.AVCDecoder`) decode
bit-exactly.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .params import AVCParams, assemble_stream
from .slice_enc import encode_i_frame, encode_p_frame
from .slice_dec import AVCDecoder
from .deblock import DeblockContext, deblock_frame
from .inter import RefPlanes
from . import conformance


@dataclasses.dataclass
class AVCFrameResult:
    frame_type: str
    bits: int
    psnr_y: float
    recon: tuple          # (Y, U, V) uint8


class AVCCodec:
    """Sequence encoder for real H.264 Baseline/CAVLC streams."""

    def __init__(self, p: AVCParams, intra_period: int = 0,
                 search_range: int = 16, use_satd: bool = True,
                 check_conformance: bool = True):
        """``intra_period``: 0 = first frame IDR then all P (IPPP);
        N>0 = IDR every N frames."""
        self.p = p
        self.intra_period = intra_period
        self.sr = search_range
        self.use_satd = use_satd
        if p.slice_groups > 1 and intra_period != 1:
            # encode_p_frame has no FMO support (one raster slice) while the
            # PPS would still signal num_slice_groups>1 — ldecod would walk
            # the FMO map and misdecode the P slices.  All-IDR sequences
            # (intra_period == 1) are the supported FMO configuration.
            raise ValueError(
                "slice_groups > 1 requires intra_period == 1 (all-IDR): "
                "P slices have no FMO support yet")
        if check_conformance:
            conformance.check_params(p)

    def _is_idr(self, idx: int) -> bool:
        if idx == 0:
            return True
        return self.intra_period > 0 and idx % self.intra_period == 0

    def encode_sequence(self, frames, qp: int = None, verbose: bool = False,
                        force_intra=None):
        """frames: iterable of (Y, U, V) uint8.  ``force_intra``: optional
        callable idx -> [mb_h, mb_w] bool mask (errdo / intra refresh).
        Returns (results, Annex-B stream bytes)."""
        p = self.p
        qp = p.qp if qp is None else qp
        slices, results = [], []
        dpb = []                      # list0, most recent first
        frame_num = 0
        idr_pic_id = 0
        for idx, yuv in enumerate(frames):
            idr = self._is_idr(idx)
            ctx = DeblockContext(p.mb_w, p.mb_h, qp, p.chroma_qp_offset)
            if idr:
                rbsp, rec, stats = encode_i_frame(yuv, p, qp=qp, frame_num=0,
                                                  idr=True,
                                                  idr_pic_id=idr_pic_id)
                idr_pic_id = (idr_pic_id + 1) & 0xFFFF
                frame_num = 1
                dpb = []
                ftype = "IDR"
            else:
                fim = force_intra(idx) if force_intra else None
                rbsp, rec, pctx, stats = encode_p_frame(
                    yuv, dpb, p, qp=qp, frame_num=frame_num, sr=self.sr,
                    force_intra_mask=fim, use_satd=self.use_satd)
                ctx.mb_intra = pctx["mb_intra"]
                ctx.nnz = pctx["nnz"]
                ctx.mv = pctx["mvf"].mv
                ctx.ref = pctx["mvf"].ref
                frame_num = (frame_num + 1) % (1 << p.log2_max_frame_num)
                ftype = "P"
            if p.deblock:
                rec = deblock_frame(*rec, ctx)
            dpb.insert(0, RefPlanes(*rec))
            dpb = dpb[:max(p.num_ref_frames, 1)]
            for r in (rbsp if isinstance(rbsp, list) else [rbsp]):
                slices.append((idr, r))
            rec8 = tuple(np.asarray(pl, np.uint8) for pl in rec)
            mse = ((np.asarray(yuv[0], np.float64) - rec8[0]) ** 2).mean()
            res = AVCFrameResult(
                frame_type=ftype, bits=stats["bits"],
                psnr_y=99.99 if mse == 0 else
                float(10 * np.log10(255.0 ** 2 / mse)),
                recon=rec8)
            results.append(res)
            if verbose:
                print(f"frame {idx:3d} {ftype:3s} bits {res.bits:7d} "
                      f"PSNR-Y {res.psnr_y:6.2f}")
        return results, assemble_stream(p, slices)

    @staticmethod
    def decode_sequence(stream: bytes, trace: bool = False):
        """Decode an Annex-B stream (ours or JM's); returns frame list
        (and the decoder, for .trace)."""
        dec = AVCDecoder(trace=trace)
        return dec.decode(stream), dec
