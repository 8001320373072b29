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
from . import pack_cabac as PKC
from . import native as AN
from .params import SLICE_I, SLICE_P

_prep_ref = functools.partial(jax.jit, static_argnames="sr")(TE.prep_ref)

# symbol fields and their per-MB int16 widths (transfer-packing layout)
_SYM_KEYS = (("win", 1), ("ri", 1), ("mvd", 8), ("i4flags", 32),
             ("i16mode", 1), ("i16dc", 16), ("cmode", 1), ("cbp_luma", 1),
             ("cbp_chroma", 1), ("zz", 256), ("cdc", 8), ("cac", 120),
             ("mb_intra", 1))


@jax.jit
def _pack_out(sym, ctx, rec):
    """Pack symbols+deblock ctx into one int16 buffer and the recon into
    one uint8 buffer — two tunnel transfers per frame instead of ~20."""
    nmb = sym["win"].shape[0]
    parts = [sym[k].reshape(nmb, -1).astype(jnp.int16) for k, _ in _SYM_KEYS]
    flat = [p.reshape(-1) for p in parts]
    flat += [ctx["nnz"].reshape(-1).astype(jnp.int16),
             ctx["mv"].reshape(-1).astype(jnp.int16),
             ctx["ref"].reshape(-1).astype(jnp.int16),
             ctx["mb_intra"].reshape(-1).astype(jnp.int16)]
    buf = jnp.concatenate(flat)
    y, u, v = rec
    recbuf = jnp.concatenate(
        [y, jnp.concatenate([u, v], axis=1)], axis=0).astype(jnp.uint8)
    return buf, recbuf


def _unpack_out(buf, recbuf, mb_h, mb_w):
    """Host-side inverse of _pack_out (numpy views + reshapes)."""
    nmb = mb_h * mb_w
    h4, w4 = mb_h * 4, mb_w * 4
    sym = {}
    off = 0
    for k, wdt in _SYM_KEYS:
        sym[k] = np.asarray(buf[off:off + nmb * wdt]).reshape(nmb, wdt)
        off += nmb * wdt
    shapes = {"mvd": (nmb, 4, 2), "i4flags": (nmb, 16, 2),
              "zz": (nmb, 16, 16), "cdc": (nmb, 2, 4),
              "cac": (nmb, 2, 2, 2, 15)}
    for k, shp in shapes.items():
        sym[k] = sym[k].reshape(shp)
    for k in ("win", "ri", "i16mode", "cmode", "cbp_luma", "cbp_chroma",
              "mb_intra"):
        sym[k] = sym[k][:, 0]
    ctx = {}
    ctx["nnz"] = buf[off:off + h4 * w4].reshape(h4, w4)
    off += h4 * w4
    ctx["mv"] = buf[off:off + h4 * w4 * 2].reshape(h4, w4, 2)
    off += h4 * w4 * 2
    ctx["ref"] = buf[off:off + h4 * w4].reshape(h4, w4)
    off += h4 * w4
    ctx["mb_intra"] = buf[off:off + nmb].reshape(mb_h, mb_w).astype(bool)
    H, W = mb_h * 16, mb_w * 16
    rec = (recbuf[:H].astype(np.int64),
           recbuf[H:, :W // 2].astype(np.int64),
           recbuf[H:, W // 2:].astype(np.int64))
    return sym, ctx, rec


@functools.partial(jax.jit, static_argnames=("sr", "H", "W"))
def _prep_ref_packed(buf, sr, H, W):
    y = buf[:H].astype(jnp.int32)
    u = buf[H:, :W // 2].astype(jnp.int32)
    v = buf[H:, W // 2:].astype(jnp.int32)
    return TE.prep_ref(y, u, v, sr)


@functools.partial(jax.jit, static_argnames=("H", "W"))
def _split_org(buf, H, W):
    return (buf[:H].astype(jnp.int32), buf[H:, :W // 2].astype(jnp.int32),
            buf[H:, W // 2:].astype(jnp.int32))


class TPUAVCCodec:
    """Baseline/CAVLC H.264 encoder with all pixel work on device."""

    def __init__(self, p: AVCParams, intra_period: int = 0,
                 search_range: int = 16, check_conformance: bool = True,
                 n_slices: int = 1, mesh=None, mesh_axis: str = "slice"):
        """``n_slices``: split each picture into that many equal row-band
        slices (must divide mb_h).  Slices reset all prediction/entropy
        contexts, so the device decision scan runs them concurrently —
        the standard-compliant intra-frame parallel axis (~n_slices x
        fewer sequential steps at a small bitrate cost).

        ``mesh``: a ``jax.sharding.Mesh`` to shard the per-frame encode
        over (row-band slices distributed along ``mesh_axis``; n_slices
        must be a multiple of the axis size).  The sharded encode is
        byte-identical to the single-device one."""
        if p.slice_groups != 1:
            raise ValueError("TPU path has no FMO; use AVCCodec for FMO")
        if p.mb_h % n_slices:
            raise ValueError(f"n_slices {n_slices} must divide {p.mb_h}")
        self.p = p
        self.intra_period = intra_period
        self.sr = search_range
        self.n_slices = n_slices
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        self._sharded = {}
        if check_conformance:
            conformance.check_params(p)
        self._dummy = None

    def _encode_fn(self, intra_only: bool):
        """The per-frame device graph (mesh-sharded when configured)."""
        p = self.p
        kw = dict(mb_h=p.mb_h, mb_w=p.mb_w, sr=self.sr,
                  intra_only=intra_only, n_slices=self.n_slices,
                  chroma_qp_offset=p.chroma_qp_offset)
        if self.mesh is None:
            return functools.partial(TE.encode_frame, **kw)
        if intra_only not in self._sharded:
            self._sharded[intra_only] = TE.make_sharded_encode(
                self.mesh, self.mesh_axis, **kw)
        return self._sharded[intra_only]

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
        H, W = p.height, p.width
        for idx, yuv in enumerate(frames):
            orgbuf = np.concatenate(
                [np.asarray(yuv[0], np.uint8),
                 np.concatenate([np.asarray(yuv[1], np.uint8),
                                 np.asarray(yuv[2], np.uint8)], axis=1)],
                axis=0)
            y, u, v = _split_org(jnp.asarray(orgbuf), H=H, W=W)
            idr = self._is_idr(idx)
            if idr:
                ups, us, vs = self._dummy_refs()
                sym, rec, tctx = self._encode_fn(True)(
                    y, u, v, ups, us, vs, jnp.int32(qp), jnp.int32(0),
                    no_force)
                buf, recbuf = _pack_out(sym, tctx, rec)
                buf, recbuf = jax.device_get((buf, recbuf))
                sym, tctx, rec_np = _unpack_out(buf, recbuf, mb_h, mb_w)
                rows = mb_h // self.n_slices
                if p.cabac:
                    rbsps = [PKC.pack_i_slice_cabac(
                        sym, p, qp, frame_num=0, idr=True,
                        idr_pic_id=idr_pic_id, row0=s0 * rows, n_rows=rows)
                        for s0 in range(self.n_slices)]
                elif AN.available():
                    rbsps = [AN.pack_slice(sym, p, SLICE_I, qp, 0, True,
                                           idr_pic_id, 1, row0=s0 * rows,
                                           n_rows=rows)
                             for s0 in range(self.n_slices)]
                else:
                    rbsps = [PK.pack_i_slice(sym, p, qp, frame_num=0,
                                             idr=True,
                                             idr_pic_id=idr_pic_id,
                                             row0=s0 * rows, n_rows=rows)
                             for s0 in range(self.n_slices)]
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
                sym, rec, tctx = self._encode_fn(False)(
                    y, u, v, ups, us, vs, jnp.int32(qp), jnp.int32(n_valid),
                    fim)
                buf, recbuf = _pack_out(sym, tctx, rec)
                buf, recbuf = jax.device_get((buf, recbuf))
                sym, tctx, rec_np = _unpack_out(buf, recbuf, mb_h, mb_w)
                rows = mb_h // self.n_slices
                if p.cabac:
                    rbsps = [PKC.pack_p_slice_cabac(
                        sym, p, qp, frame_num=frame_num, num_ref=n_valid,
                        row0=s0 * rows, n_rows=rows)
                        for s0 in range(self.n_slices)]
                elif AN.available():
                    rbsps = [AN.pack_slice(sym, p, SLICE_P, qp, frame_num,
                                           False, 0, n_valid,
                                           row0=s0 * rows, n_rows=rows)
                             for s0 in range(self.n_slices)]
                else:
                    rbsps = [PK.pack_p_slice(sym, p, qp,
                                             frame_num=frame_num,
                                             num_ref=n_valid,
                                             row0=s0 * rows, n_rows=rows)
                             for s0 in range(self.n_slices)]
                frame_num = (frame_num + 1) % (1 << p.log2_max_frame_num)
                ftype = "P"

            if p.deblock:
                ctx = DeblockContext(mb_w, mb_h, qp, p.chroma_qp_offset)
                if ftype != "IDR":
                    ctx.mb_intra = np.asarray(tctx["mb_intra"])
                    ctx.nnz = np.asarray(tctx["nnz"], np.int64)
                    ctx.mv = np.asarray(tctx["mv"], np.int64)
                    ctx.ref = np.asarray(tctx["ref"], np.int64)
                if AN.available():
                    rec_np = AN.deblock_frame(*rec_np, ctx)
                else:
                    rec_np = deblock_frame(*rec_np, ctx)
            refbuf = np.concatenate(
                [rec_np[0], np.concatenate([rec_np[1], rec_np[2]], axis=1)],
                axis=0).astype(np.uint8)
            dpb.insert(0, _prep_ref_packed(jnp.asarray(refbuf), sr=self.sr,
                                           H=H, W=W))
            dpb = dpb[:R]
            for rb in rbsps:
                slices.append((idr, rb))
            rec8 = tuple(np.asarray(pl, np.uint8) for pl in rec_np)
            mse = ((np.asarray(yuv[0], np.float64) - rec8[0]) ** 2).mean()
            res = AVCFrameResult(
                frame_type=ftype, bits=sum(len(rb) for rb in rbsps) * 8,
                psnr_y=99.99 if mse == 0 else
                float(10 * np.log10(255.0 ** 2 / mse)),
                recon=rec8)
            results.append(res)
            if verbose:
                print(f"frame {idx:3d} {ftype:3s} bits {res.bits:7d} "
                      f"PSNR-Y {res.psnr_y:6.2f}")
        return results, assemble_stream(p, slices)
