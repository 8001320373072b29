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
from .codec import AVCFrameResult, estimate_wp
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
             ("mb_intra", 1), ("t8", 1), ("sub", 4), ("mvd_s", 32))


@jax.jit
def _pack_out(sym, ctx, rec):
    """Pack encoder outputs into three transfer buffers: symbols
    (int16, only needed for host entropy packing — may download lazily),
    deblock ctx (int16) and recon (uint8), both on the frame critical
    path (deblock -> prep_ref).  Splitting them lets the driver overlap
    frame n's entropy packing with frame n+1's device compute."""
    nmb = sym["win"].shape[0]
    parts = [sym[k].reshape(nmb, -1).astype(jnp.int16) for k, _ in _SYM_KEYS]
    buf = jnp.concatenate([p.reshape(-1) for p in parts])
    ctxbuf = jnp.concatenate(
        [ctx["nnz"].reshape(-1).astype(jnp.int16),
         ctx["mv"].reshape(-1).astype(jnp.int16),
         ctx["ref"].reshape(-1).astype(jnp.int16),
         ctx["mb_intra"].reshape(-1).astype(jnp.int16),
         ctx.get("t8", ctx["mb_intra"] * 0).reshape(-1)
            .astype(jnp.int16)])
    y, u, v = rec
    recbuf = jnp.concatenate(
        [y, jnp.concatenate([u, v], axis=1)], axis=0).astype(jnp.uint8)
    return buf, ctxbuf, recbuf


def _unpack_sym(buf, mb_h, mb_w):
    """Host-side inverse of _pack_out's symbol buffer."""
    nmb = mb_h * mb_w
    sym = {}
    off = 0
    for k, wdt in _SYM_KEYS:
        sym[k] = np.asarray(buf[off:off + nmb * wdt]).reshape(nmb, wdt)
        off += nmb * wdt
    shapes = {"mvd": (nmb, 4, 2), "i4flags": (nmb, 16, 2),
              "zz": (nmb, 16, 16), "cdc": (nmb, 2, 4),
              "cac": (nmb, 2, 2, 2, 15), "mvd_s": (nmb, 4, 4, 2)}
    for k, shp in shapes.items():
        sym[k] = sym[k].reshape(shp)
    for k in ("win", "ri", "i16mode", "cmode", "cbp_luma", "cbp_chroma",
              "mb_intra", "t8"):
        sym[k] = sym[k][:, 0]
    return sym


def _unpack_ctx_rec(ctxbuf, recbuf, mb_h, mb_w):
    """Host-side inverse of _pack_out's ctx/recon buffers."""
    h4, w4 = mb_h * 4, mb_w * 4
    nmb = mb_h * mb_w
    ctx = {}
    off = 0
    ctx["nnz"] = ctxbuf[off:off + h4 * w4].reshape(h4, w4)
    off += h4 * w4
    ctx["mv"] = ctxbuf[off:off + h4 * w4 * 2].reshape(h4, w4, 2)
    off += h4 * w4 * 2
    ctx["ref"] = ctxbuf[off:off + h4 * w4].reshape(h4, w4)
    off += h4 * w4
    ctx["mb_intra"] = ctxbuf[off:off + nmb].reshape(mb_h, mb_w).astype(bool)
    off += nmb
    ctx["t8"] = ctxbuf[off:off + nmb].reshape(mb_h, mb_w).astype(bool)
    H, W = mb_h * 16, mb_w * 16
    rec = (recbuf[:H].astype(np.int64),
           recbuf[H:, :W // 2].astype(np.int64),
           recbuf[H:, W // 2:].astype(np.int64))
    return ctx, rec


def _unpack_out(buf, ctxbuf, recbuf, mb_h, mb_w):
    """Host-side inverse of _pack_out (numpy views + reshapes)."""
    sym = _unpack_sym(buf, mb_h, mb_w)
    ctx, rec = _unpack_ctx_rec(ctxbuf, recbuf, mb_h, mb_w)
    return sym, ctx, rec


@functools.partial(jax.jit, static_argnames=("sr", "H", "W"))
def _prep_ref_packed(buf, sr, H, W):
    y = buf[:H].astype(jnp.int32)
    u = buf[H:, :W // 2].astype(jnp.int32)
    v = buf[H:, W // 2:].astype(jnp.int32)
    return TE.prep_ref(y, u, v, sr)


@jax.jit
def _weight_luma(up, wy, oy):
    """Explicit-WP view of one reference's phase-split quarter-pel
    planes (luma MC is a pure gather, so weighting the planes IS the
    spec 8.4.2.3.2 post-MC transform; d_l = 5)."""
    return jnp.clip((((up.astype(jnp.int32)) * wy + 16) >> 5) + oy,
                    0, 255).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("H", "W"))
def _split_org(buf, H, W):
    return (buf[:H].astype(jnp.int32), buf[H:, :W // 2].astype(jnp.int32),
            buf[H:, W // 2:].astype(jnp.int32))


class TPUAVCCodec:
    """Baseline/CAVLC H.264 encoder with all pixel work on device."""

    def __init__(self, p: AVCParams, intra_period: int = 0,
                 search_range: int = 16, check_conformance: bool = True,
                 n_slices: int = 1, mesh=None, mesh_axis: str = "slice",
                 bframes: int = 0, hierarchical: bool = False,
                 sub8x8: bool = False, data_partitioning: bool = False,
                 wp_method: str = "dc"):
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
        self.bframes = bframes
        self.hierarchical = hierarchical
        self.sub8x8 = sub8x8
        if wp_method not in ("dc", "lms"):
            raise ValueError(f"wp_method {wp_method!r}")
        # explicit-WP estimator: "dc" (DC ratio) or "lms" (least-squares
        # gain+offset, wp_lms.c) — the LMS fit reads host copies of the
        # recent reconstructions (already resident from the deblock step)
        self.wp_method = wp_method
        if sub8x8 and (p.cabac or bframes > 0):
            raise NotImplementedError("P8x8 sub-partitions are "
                                      "CAVLC-IPPP for now")
        self.data_partitioning = data_partitioning
        if data_partitioning and (p.cabac or bframes > 0):
            raise NotImplementedError("data partitioning is CAVLC "
                                      "P/I only (spec 7.4.1)")
        if p.scaling_matrix is not None:
            if p.scaling_matrix != "default":
                raise NotImplementedError("only the spec default "
                                          "matrices are supported")
            if p.profile_idc < 100:
                raise ValueError("scaling lists need High profile")
            if bframes > 0:
                raise NotImplementedError("scaling lists in the B "
                                          "driver are not wired")
        self._sharded = {}
        if bframes > 0:
            if p.poc_type != 0:
                raise ValueError("bframes needs AVCParams(poc_type=0)")
            if p.profile_idc == 66:
                raise ValueError("B slices need Main profile (77)")
            if hierarchical and bframes != 3:
                raise ValueError("hierarchical GOP supports bframes=3 "
                                 "(dyadic GOP of 4) for now")
            if hierarchical and p.num_ref_frames < 3:
                # decoder DPB must hold {prev anchor, ref-B, anchor}
                raise ValueError("hierarchical GOP needs "
                                 "num_ref_frames >= 3")
        if p.transform_8x8 and bframes > 0:
            raise NotImplementedError("8x8 transform in the B driver "
                                      "is not wired yet")
        if p.weighted_pred and (bframes > 0 or p.cabac
                                or mesh is not None):
            raise NotImplementedError("device WP is CAVLC-IPPP "
                                      "single-mesh for now")
        if check_conformance:
            conformance.check_params(p)
        self._dummy = None

    def _encode_fn(self, intra_only: bool):
        """The per-frame device graph (mesh-sharded when configured)."""
        p = self.p
        kw = dict(mb_h=p.mb_h, mb_w=p.mb_w, sr=self.sr,
                  intra_only=intra_only, n_slices=self.n_slices,
                  chroma_qp_offset=p.chroma_qp_offset,
                  transform8=p.transform_8x8, sub8x8=self.sub8x8,
                  scaling_default=p.scaling_matrix == "default")
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
                jnp.zeros((1, 4, 4, H + 2 * P, W + 2 * P), jnp.uint8),
                jnp.zeros((1, H // 2 + 2 * PC, W // 2 + 2 * PC), jnp.int32),
                jnp.zeros((1, H // 2 + 2 * PC, W // 2 + 2 * PC), jnp.int32))
        return self._dummy

    def encode_sequence(self, frames, qp: int = None, verbose: bool = False,
                        force_intra=None, rate_control=None):
        """frames: iterable of (Y, U, V) uint8.  Returns
        (results, Annex-B stream bytes) like AVCCodec.encode_sequence.

        ``rate_control``: a models.ratectl.QuadraticRateControl — per-frame
        QP comes from the quadratic R-Q model (rc_quadratic.c:170
        semantics) instead of the fixed config QP; QP is a traced scalar
        in the device graph so no recompilation happens.  With
        ``rc_mode=3`` (RCUpdateMode 3, the basic-unit layer of
        rc_quadratic.c) each row-band slice is a basic unit: the frame
        target splits over the units by the previous frame's measured
        per-unit MAD, QP becomes a traced per-slice vector, and each
        slice header carries its own slice_qp_delta."""
        if self.bframes > 0:
            return self._encode_sequence_b(frames, qp, verbose)
        p = self.p
        qp = p.qp if qp is None else qp
        rc = rate_control
        bu = (rc is not None and getattr(rc, "rc_mode", 1) == 3
              and self.n_slices > 1)
        if bu:
            if self.mesh is not None:
                raise NotImplementedError(
                    "basic-unit RC is not mesh-sharded yet")
            rc.basic_units = self.n_slices   # BU = one row-band slice
        R = max(p.num_ref_frames, 1)
        mb_h, mb_w = p.mb_h, p.mb_w
        no_force = jnp.zeros((mb_h, mb_w), bool)

        slices, results = [], []
        dpb = []                               # (up, u_pad, v_pad), newest 1st
        dpb_means = []                         # (dc_y, dc_u, dc_v) per entry
        dpb_recs = []                          # host rec8 copies (LMS WP)
        frame_num = 0
        idr_pic_id = 0
        H, W = p.height, p.width
        rows = mb_h // self.n_slices
        pending = None      # deferred entropy pack of the previous frame

        def finalize(pend):
            """Host entropy pack of a finished frame (overlaps the next
            frame's device compute — the symbol buffer download and the
            CAVLC/CABAC packing don't gate the encode loop)."""
            sym = _unpack_sym(np.asarray(pend["buf"]), mb_h, mb_w)
            fqp = pend["qp"]
            # basic-unit RC: one QP per row-band slice (slice_qp_delta)
            fqps = (list(fqp) if isinstance(fqp, (list, tuple, np.ndarray))
                    else [fqp] * self.n_slices)
            if pend["idr"]:
                if p.cabac:
                    rbsps = [PKC.pack_i_slice_cabac(
                        sym, p, fqps[s0], frame_num=0, idr=True,
                        idr_pic_id=pend["idr_pic_id"], row0=s0 * rows,
                        n_rows=rows) for s0 in range(self.n_slices)]
                elif AN.available():
                    rbsps = [AN.pack_slice(sym, p, SLICE_I, fqps[s0],
                                           0, True,
                                           pend["idr_pic_id"], 1,
                                           row0=s0 * rows, n_rows=rows)
                             for s0 in range(self.n_slices)]
                else:
                    rbsps = [PK.pack_i_slice(sym, p, fqps[s0], frame_num=0,
                                             idr=True,
                                             idr_pic_id=pend["idr_pic_id"],
                                             row0=s0 * rows, n_rows=rows)
                             for s0 in range(self.n_slices)]
            else:
                fn, nv = pend["frame_num"], pend["n_valid"]
                wp = pend.get("wp")
                if p.cabac:
                    rbsps = [PKC.pack_p_slice_cabac(
                        sym, p, fqps[s0], frame_num=fn, num_ref=nv,
                        row0=s0 * rows, n_rows=rows)
                        for s0 in range(self.n_slices)]
                elif self.data_partitioning:
                    rbsps = [PK.pack_p_slice(sym, p, fqps[s0], frame_num=fn,
                                             num_ref=nv,
                                             row0=s0 * rows, n_rows=rows,
                                             wp=wp, dp_slice_id=s0)
                             for s0 in range(self.n_slices)]
                elif AN.available() and not self.sub8x8:
                    # the C packer has no sub_mb_type support yet
                    rbsps = [AN.pack_slice(sym, p, SLICE_P, fqps[s0], fn,
                                           False, 0, nv,
                                           row0=s0 * rows, n_rows=rows,
                                           wp=wp)
                             for s0 in range(self.n_slices)]
                else:
                    rbsps = [PK.pack_p_slice(sym, p, fqps[s0], frame_num=fn,
                                             num_ref=nv,
                                             row0=s0 * rows, n_rows=rows,
                                             wp=wp)
                             for s0 in range(self.n_slices)]
            for rb in rbsps:
                slices.append((pend["idr"], rb))
            res = AVCFrameResult(
                frame_type=pend["ftype"],
                bits=sum(len(x) for rb in rbsps
                         for x in (rb if isinstance(rb, tuple)
                                   else (rb,))) * 8,
                psnr_y=pend["psnr_y"], recon=pend["rec8"])
            results.append(res)
            if verbose:
                print(f"frame {pend['idx']:3d} {pend['ftype']:3s} "
                      f"bits {res.bits:7d} PSNR-Y {res.psnr_y:6.2f}")
            return res

        for idx, yuv in enumerate(frames):
            idr = self._is_idr(idx)
            qp_s = None                  # per-slice QPs (basic-unit RC)
            if rc is not None and idx > 0:
                # rate control needs the previous frame's bits NOW
                if pending is not None:
                    pftype = pending["ftype"]
                    pqp = pending.get("qp_frame", qp)
                    pmads = pending.get("bu_mads")
                    res = finalize(pending)
                    pending = None
                    mse_y = 255.0 ** 2 / (10.0 ** (res.psnr_y / 10.0))
                    rc.update(res.bits, pqp, float(np.sqrt(mse_y)),
                              ftype="P" if pftype == "P" else "I")
                    if pmads is not None:
                        rc.update_basic_units(pmads)
                if bu and not idr:
                    qp_s = [int(v) for v in
                            rc.basic_unit_qps(self.n_slices)]
                    qp = int(round(np.mean(qp_s)))
                else:
                    qp = rc.frame_qp("I" if idr else "P")
            orgbuf = np.concatenate(
                [np.asarray(yuv[0], np.uint8),
                 np.concatenate([np.asarray(yuv[1], np.uint8),
                                 np.asarray(yuv[2], np.uint8)], axis=1)],
                axis=0)
            y, u, v = _split_org(jnp.asarray(orgbuf), H=H, W=W)
            meta = dict(idx=idx, idr=idr,
                        qp=(qp_s if qp_s is not None else qp),
                        qp_frame=qp)
            if idr:
                ups, us, vs = self._dummy_refs()
                sym, rec, tctx = self._encode_fn(True)(
                    y, u, v, ups, us, vs, jnp.int32(qp), jnp.int32(0),
                    no_force)
                meta.update(ftype="IDR", idr_pic_id=idr_pic_id)
                idr_pic_id = (idr_pic_id + 1) & 0xFFFF
                frame_num = 1
                dpb = []
            else:
                n_valid = min(len(dpb), R)
                refs = [dpb[i if i < n_valid else n_valid - 1]
                        for i in range(R)]
                wp = None
                wp_c = None
                if p.weighted_pred:
                    if self.wp_method == "lms":
                        from .codec import estimate_wp_lms
                        recs = [dpb_recs[i if i < n_valid else n_valid - 1]
                                for i in range(R)]
                        wp = estimate_wp_lms(yuv, recs)
                    else:
                        means = [dpb_means[i if i < n_valid
                                           else n_valid - 1]
                                 for i in range(R)]
                        wp = estimate_wp(yuv, means)
                    ups = jnp.stack([
                        _weight_luma(r[0], jnp.int32(e[0]), jnp.int32(e[1]))
                        for r, e in zip(refs, wp["l0"])])
                    wp_c = jnp.asarray(
                        [[e[2], e[3], e[4], e[5]] for e in wp["l0"]],
                        jnp.int32)
                else:
                    ups = jnp.stack([r[0] for r in refs])
                us = jnp.stack([r[1] for r in refs])
                vs = jnp.stack([r[2] for r in refs])
                fim = force_intra(idx) if force_intra else None
                fim = no_force if fim is None else jnp.asarray(fim, bool)
                qp_dev = (jnp.asarray(qp_s, jnp.int32) if qp_s is not None
                          else jnp.int32(qp))
                sym, rec, tctx = self._encode_fn(False)(
                    y, u, v, ups, us, vs, qp_dev, jnp.int32(n_valid),
                    fim, wp_c)
                meta.update(ftype="P", frame_num=frame_num,
                            n_valid=n_valid, wp=wp)
                frame_num = (frame_num + 1) % (1 << p.log2_max_frame_num)
            buf, ctxbuf, recbuf = _pack_out(sym, tctx, rec)

            # previous frame's entropy pack overlaps this frame's device
            # compute (the device is busy encoding; the host packs bits)
            if pending is not None:
                finalize(pending)
                pending = None

            # critical path: ctx+recon -> deblock -> ref upload -> prep
            ctxbuf, recbuf = jax.device_get((ctxbuf, recbuf))
            tctx, rec_np = _unpack_ctx_rec(ctxbuf, recbuf, mb_h, mb_w)
            if p.deblock:
                ctx = DeblockContext(mb_w, mb_h, qp, p.chroma_qp_offset)
                if qp_s is not None:
                    # basic-unit RC: per-row-band slice QP (the filter
                    # averages neighbor MB QPs across the band edge)
                    for s0 in range(self.n_slices):
                        ctx.mb_qp[s0 * rows:(s0 + 1) * rows, :] = qp_s[s0]
                if meta["ftype"] != "IDR":
                    ctx.mb_intra = np.asarray(tctx["mb_intra"])
                    ctx.nnz = np.asarray(tctx["nnz"], np.int64)
                    ctx.mv = np.asarray(tctx["mv"], np.int64)
                    ctx.ref = np.asarray(tctx["ref"], np.int64)
                t8 = np.asarray(tctx["t8"])
                if t8.any():
                    # 8x8-transform MBs: bS tests the 8x8 block's coded
                    # status; internal 4x4 luma edges unfiltered
                    ctx.transform8 = t8
                    q = ctx.nnz.reshape(mb_h * 2, 2,
                                        mb_w * 2, 2).sum(axis=(1, 3))
                    q = np.repeat(np.repeat(q, 2, 0), 2, 1)
                    m8 = np.repeat(np.repeat(t8, 4, 0), 4, 1)
                    ctx.nnz = np.where(m8, q, ctx.nnz)
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
            rec8 = tuple(np.asarray(pl, np.uint8) for pl in rec_np)
            if p.weighted_pred:
                dpb_means.insert(0, tuple(float(pl.mean()) for pl in rec8))
                dpb_means = dpb_means[:R]
                if self.wp_method == "lms":
                    dpb_recs.insert(0, rec8)
                    dpb_recs = dpb_recs[:R]
            mse = ((np.asarray(yuv[0], np.float64) - rec8[0]) ** 2).mean()
            meta.update(buf=buf, rec8=rec8,
                        psnr_y=99.99 if mse == 0 else
                        float(10 * np.log10(255.0 ** 2 / mse)))
            if bu and not idr:
                # measured per-basic-unit MAD (recon error proxy) feeds
                # the next frame's per-unit target split
                oy = np.asarray(yuv[0], np.int64)
                ry = rec8[0].astype(np.int64)
                bpx = rows * 16
                meta["bu_mads"] = [
                    float(np.abs(oy[i * bpx:(i + 1) * bpx]
                                 - ry[i * bpx:(i + 1) * bpx]).mean())
                    for i in range(self.n_slices)]
            pending = meta
        if pending is not None:
            pftype = pending["ftype"]
            pqp = pending.get("qp_frame", qp)
            res = finalize(pending)
            if rc is not None:
                mse_y = 255.0 ** 2 / (10.0 ** (res.psnr_y / 10.0))
                rc.update(res.bits, pqp, float(np.sqrt(mse_y)),
                          ftype="P" if pftype == "P" else "I")
        return results, assemble_stream(p, slices)


def _tpu_b_sequence(codec, frames, qp=None, verbose=False):
    """Device-graph B-GOP sequence encode for :class:`TPUAVCCodec`.

    ``bframes`` disposable B pictures between anchors (IbbP), or — with
    ``hierarchical=True`` and bframes=3 — the dyadic GOP-of-4 structure
    of ``JM/lencod/src/pred_struct.c`` populate_frm_struct: anchor P,
    then a REFERENCE B at the midpoint (own DPB slot, MMCO-dropped at
    the next anchor), then the two leaf Bs predicting from it.  Layered
    QP cascade (anchor qp, ref-B qp+1, leaf B qp+2) per JM pyramid
    defaults.  Stream is decode order; results display order."""
    import jax.numpy as jnp
    from . import pack as PK
    from . import pack_cabac as PKC
    p = codec.p
    qp = p.qp if qp is None else qp
    frames = list(frames)
    n = len(frames)
    G = codec.bframes + 1
    anchors = sorted(set(list(range(0, n, G)) + [n - 1]))
    mb_h, mb_w = p.mb_h, p.mb_w
    H, W = p.height, p.width
    no_force = jnp.zeros((mb_h, mb_w), bool)
    max_fn = 1 << p.log2_max_frame_num
    max_poc = 1 << p.log2_max_poc_lsb

    slices = []
    results = [None] * n
    frame_num = 0
    prev = None          # dict(prep, motion(np mv,ref), poc)
    pending_bref_fn = None

    def device_encode_p(yuv, prep_list, fqp):
        y, u, v = _split_org(jnp.asarray(_orgbuf(yuv)), H=H, W=W)
        ups = jnp.stack([r[0] for r in prep_list])
        us = jnp.stack([r[1] for r in prep_list])
        vs = jnp.stack([r[2] for r in prep_list])
        sym, rec, tctx = codec._encode_fn(False)(
            y, u, v, ups, us, vs, jnp.int32(fqp),
            jnp.int32(len(prep_list)), no_force)
        buf, ctxbuf, recbuf = _pack_out(sym, tctx, rec)
        buf, ctxbuf, recbuf = jax.device_get((buf, ctxbuf, recbuf))
        return _unpack_out(buf, ctxbuf, recbuf, mb_h, mb_w)

    def device_encode_b(yuv, prep0, prep1, col_motion, fqp):
        y, u, v = _split_org(jnp.asarray(_orgbuf(yuv)), H=H, W=W)
        if codec.mesh is not None:
            if "b" not in codec._sharded:
                codec._sharded["b"] = TE.make_sharded_encode_b(
                    codec.mesh, codec.mesh_axis, mb_h=mb_h, mb_w=mb_w,
                    sr=codec.sr, chroma_qp_offset=p.chroma_qp_offset,
                    n_slices=codec.n_slices)
            sym, rec, tctx = codec._sharded["b"](
                y, u, v,
                prep0[0][None], prep0[1][None], prep0[2][None],
                prep1[0][None], prep1[1][None], prep1[2][None],
                jnp.asarray(col_motion[0], jnp.int32),
                jnp.asarray(col_motion[1], jnp.int32),
                jnp.int32(fqp), jnp.int32(1), jnp.int32(1))
        else:
            sym, rec, tctx = TE.encode_frame_b(
                y, u, v,
                prep0[0][None], prep0[1][None], prep0[2][None],
                prep1[0][None], prep1[1][None], prep1[2][None],
                jnp.asarray(col_motion[0], jnp.int32),
                jnp.asarray(col_motion[1], jnp.int32),
                jnp.int32(fqp), jnp.int32(1), jnp.int32(1),
                mb_h=mb_h, mb_w=mb_w, sr=codec.sr,
                chroma_qp_offset=p.chroma_qp_offset,
                n_slices=codec.n_slices)
        sym = jax.device_get(sym)
        tctx = jax.device_get(tctx)
        rec_np = tuple(np.asarray(pl, np.int64) for pl in jax.device_get(rec))
        return sym, tctx, rec_np

    def deblock_b(rec_np, tctx, fqp, poc0, poc1):
        ctx = DeblockContext(mb_w, mb_h, fqp, p.chroma_qp_offset)
        ctx.mb_intra = np.asarray(tctx["mb_intra"])
        ctx.nnz = np.asarray(tctx["nnz"], np.int64)
        r0 = np.asarray(tctx["ref0"], np.int64)
        r1 = np.asarray(tctx["ref1"], np.int64)
        ctx.mv = np.asarray(tctx["mv0"], np.int64)
        ctx.ref = np.where(r0 == 0, poc0, -1)
        ctx.mv1 = np.asarray(tctx["mv1"], np.int64)
        ctx.ref1 = np.where(r1 == 0, poc1, -1)
        if not p.deblock:
            return rec_np
        return AN.deblock_frame(*rec_np, ctx) if AN.available() \
            else deblock_frame(*rec_np, ctx)

    def finish(rec_np, yuv, disp, ftype, bits):
        rec8 = tuple(np.asarray(pl, np.uint8) for pl in rec_np)
        mse = ((np.asarray(yuv[0], np.float64) - rec8[0]) ** 2).mean()
        results[disp] = AVCFrameResult(
            frame_type=ftype, bits=bits,
            psnr_y=99.99 if mse == 0 else
            float(10 * np.log10(255.0 ** 2 / mse)), recon=rec8)
        if verbose:
            print(f"frame {disp:3d} {ftype:3s} bits {bits:7d} "
                  f"PSNR-Y {results[disp].psnr_y:6.2f}")
        return rec8

    def prep(rec_np):
        refbuf = np.concatenate(
            [rec_np[0], np.concatenate([rec_np[1], rec_np[2]], axis=1)],
            axis=0).astype(np.uint8)
        return _prep_ref_packed(jnp.asarray(refbuf), sr=codec.sr, H=H, W=W)

    def encode_b(disp, prep0, poc0, prep1, poc1, col_motion, fqp,
                 ref_pic=False):
        nonlocal frame_num
        sym, tctx, rec_np = device_encode_b(frames[disp], prep0, prep1,
                                            col_motion, fqp)
        rows = mb_h // codec.n_slices
        packb = PKC.pack_b_slice_cabac if p.cabac else PK.pack_b_slice
        rbsps = [packb(sym, p, fqp, frame_num=frame_num % max_fn,
                       num_ref0=1, num_ref1=1,
                       poc_lsb=(2 * disp) % max_poc,
                       ref_pic=ref_pic, row0=s0 * rows, n_rows=rows)
                 for s0 in range(codec.n_slices)]
        rec_np = deblock_b(rec_np, tctx, fqp, poc0, poc1)
        for rb in rbsps:
            slices.append((False, rb, 2 if ref_pic else 0))
        finish(rec_np, frames[disp], disp, "B",
               sum(len(rb) for rb in rbsps) * 8)
        out = dict(rec=rec_np,
                   motion=(np.asarray(tctx["mv0"], np.int64),
                           np.asarray(tctx["ref0"], np.int64)))
        if ref_pic:
            frame_num += 1
        return out

    for a in anchors:
        yuv = frames[a]
        fqp = qp
        if a == 0:
            y, u, v = _split_org(jnp.asarray(_orgbuf(yuv)), H=H, W=W)
            ups, us, vs = codec._dummy_refs()
            sym, rec, tctx = codec._encode_fn(True)(
                y, u, v, ups, us, vs, jnp.int32(fqp), jnp.int32(0),
                no_force)
            buf, ctxbuf, recbuf = _pack_out(sym, tctx, rec)
            buf, ctxbuf, recbuf = jax.device_get((buf, ctxbuf, recbuf))
            sym, tctx, rec_np = _unpack_out(buf, ctxbuf, recbuf, mb_h, mb_w)
            rows = mb_h // codec.n_slices
            packi = PKC.pack_i_slice_cabac if p.cabac else PK.pack_i_slice
            rbsps = [packi(sym, p, fqp, frame_num=0, idr=True,
                           row0=s0 * rows, n_rows=rows)
                     for s0 in range(codec.n_slices)]
            if p.deblock:
                ctx = DeblockContext(mb_w, mb_h, fqp, p.chroma_qp_offset)
                rec_np = AN.deblock_frame(*rec_np, ctx) \
                    if AN.available() else deblock_frame(*rec_np, ctx)
            for rb in rbsps:
                slices.append((True, rb, 3))
            frame_num = 1
            motion = (np.zeros((mb_h * 4, mb_w * 4, 2), np.int64),
                      np.full((mb_h * 4, mb_w * 4), -1, np.int64))
            finish(rec_np, yuv, a, "IDR", sum(len(r) for r in rbsps) * 8)
            anchor_fn = 0
        else:
            sym, tctx, rec_np = device_encode_p(yuv, [prev["prep"]], fqp)
            rows = mb_h // codec.n_slices
            mmco = None
            reorder = None
            if pending_bref_fn is not None:
                # the reference B outranks the previous anchor in the
                # default l0 init (higher frame_num), so explicitly pick
                # the anchor (spec 8.2.4.3.1) and MMCO-drop the ref B
                # (marking applies after this picture decodes)
                diff = (frame_num - pending_bref_fn - 1) % max_fn
                mmco = [(1, diff)]
                adiff = (frame_num - prev["fn"] - 1) % max_fn
                if adiff:
                    reorder = [(0, adiff)]
            packp = PKC.pack_p_slice_cabac if p.cabac else PK.pack_p_slice
            rbsps = [packp(sym, p, fqp,
                           frame_num=frame_num % max_fn,
                           num_ref=1,
                           poc_lsb=(2 * a) % max_poc,
                           row0=s0 * rows, n_rows=rows,
                           mmco=mmco, reorder_l0=reorder)
                     for s0 in range(codec.n_slices)]
            pending_bref_fn = None
            if p.deblock:
                ctx = DeblockContext(mb_w, mb_h, fqp, p.chroma_qp_offset)
                ctx.mb_intra = np.asarray(tctx["mb_intra"])
                ctx.nnz = np.asarray(tctx["nnz"], np.int64)
                ctx.mv = np.asarray(tctx["mv"], np.int64)
                ctx.ref = np.asarray(tctx["ref"], np.int64)
                rec_np = AN.deblock_frame(*rec_np, ctx) \
                    if AN.available() else deblock_frame(*rec_np, ctx)
            for rb in rbsps:
                slices.append((False, rb, 2))
            anchor_fn = frame_num
            frame_num += 1
            motion = (np.asarray(tctx["mv"], np.int64),
                      np.asarray(tctx["ref"], np.int64))
            finish(rec_np, yuv, a, "P", sum(len(r) for r in rbsps) * 8)
        cur = dict(prep=prep(rec_np), motion=motion, poc=2 * a,
                   fn=anchor_fn)

        if prev is not None:
            gap = a - prev["disp"]
            if codec.hierarchical and gap == 4:
                m = prev["disp"] + 2
                bref = encode_b(m, prev["prep"], prev["poc"], cur["prep"],
                                cur["poc"], cur["motion"], qp + 1,
                                ref_pic=True)
                pending_bref_fn = frame_num - 1
                brefp = prep(bref["rec"])
                encode_b(prev["disp"] + 1, prev["prep"], prev["poc"],
                         brefp, 2 * m, bref["motion"], qp + 2)
                encode_b(prev["disp"] + 3, brefp, 2 * m, cur["prep"],
                         cur["poc"], cur["motion"], qp + 2)
            else:
                for b in range(prev["disp"] + 1, a):
                    encode_b(b, prev["prep"], prev["poc"], cur["prep"],
                             cur["poc"], cur["motion"], qp)
        cur["disp"] = a
        prev = cur
    return results, assemble_stream(p, slices)


def _orgbuf(yuv):
    return np.concatenate(
        [np.asarray(yuv[0], np.uint8),
         np.concatenate([np.asarray(yuv[1], np.uint8),
                         np.asarray(yuv[2], np.uint8)], axis=1)], axis=0)


TPUAVCCodec._encode_sequence_b = _tpu_b_sequence
