"""Fractal + H.264 hybrid video codec — frame pipeline + bitstream.

TPU re-design of the reference sequence loop (``FR/src/code.c:76`` main /
``FR/src/image.c:411`` encode_oneframe): every ``intra_period``-th frame is
coded intra, all others are fractal P frames:

  fractal search (Y, U, V trees) -> fractal reconstruction -> residual
  DCT/quant -> final reconstruction -> [deblock] -> becomes next reference,
  and the tree + residual levels are entropy-coded into the FVC stream.

All per-frame compute is one jitted function per frame type; the Python level
only loops over frames, packs bits, and moves uint8 planes in/out.  The intra
path is the 9-mode H.264-style wavefront coder (``ops/intra.py``); the fully
conformant AVC encode path lives in ``avc/`` (see ``avc.codec.AVCCodec``).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.config import CodecConfig
from ..utils.yuv import psnr
from ..ops import fractal as F
from ..ops import transform as T
from ..ops import intra as IN
from ..ops import deblock as DB
from ..ops import me as ME
from ..entropy.bitio import BitWriter, BitReader
from ..entropy import fractal_syntax as FS


def _pad16_np(h: int, w: int):
    return h + ((-h) % 16), w + ((-w) % 16)


def _pad16(plane: jnp.ndarray):
    h, w = plane.shape
    ph, pw = (-h) % 16, (-w) % 16
    if ph == 0 and pw == 0:
        return plane
    return jnp.pad(plane, ((0, ph), (0, pw)), mode="edge")


@dataclasses.dataclass
class FrameResult:
    frame_type: str
    psnr_y: float
    psnr_u: float
    psnr_v: float
    bits: int
    recon: tuple  # (Y, U, V) uint8 numpy
    recon_dev: tuple = None  # (Y, U, V) int32 device arrays (next frame's ref)
    qp: int = 0


class _FramePacker:
    """Flattens all host-bound per-frame outputs into ONE device buffer.

    The axon TPU tunnel costs ~27ms per device->host fetch regardless of
    size; a frame's outputs (leaf maps, levels, recon, distortion sums) are
    ~20 arrays, so fetching them individually dominated encode time.  One
    concatenated int32 buffer -> one fetch.

    The tunnel is also BANDWIDTH-starved (~25 MB/s measured at 1080p), so
    narrow fields travel narrow: leaf maps / levels / MVs as int16 pairs
    and the recon as uint8 quads, bitcast into the int32 buffer (3x
    smaller frame fetch than all-int32).
    """

    _WIDTH = {"i32": 1, "i16": 2, "u8": 4}   # elements per int32 word

    def __init__(self, specs):
        # specs: (name, shape[, kind]) in order; kind defaults to i16
        self.specs = [(s[0], s[1], (s[2] if len(s) > 2 else "i16"))
                      for s in specs]
        self.offsets = {}
        self.seg_elems = {}
        for kind in ("i32", "i16", "u8"):
            off = 0
            for name, shape, k in self.specs:
                if k != kind:
                    continue
                n = int(np.prod(shape))
                self.offsets[name] = (kind, off, shape)
                off += n
            self.seg_elems[kind] = off
        self.seg_words = {k: -(-self.seg_elems[k] // self._WIDTH[k])
                          for k in self._WIDTH}
        self.total = sum(self.seg_words.values())

    def pack(self, arrays: list) -> jnp.ndarray:
        """arrays: values in spec order (device).  -> int32 [total]."""
        by_name = {name: a for (name, _s, _k), a in zip(self.specs, arrays)}
        segs = []
        for kind, dt in (("i32", jnp.int32), ("i16", jnp.int16),
                         ("u8", jnp.uint8)):
            parts = [by_name[name].astype(dt).reshape(-1)
                     for name, _s, k in self.specs if k == kind]
            if not parts:
                continue
            flat = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
            w = self._WIDTH[kind]
            if w > 1:
                pad = (-flat.shape[0]) % w
                if pad:
                    flat = jnp.pad(flat, (0, pad))
                flat = jax.lax.bitcast_convert_type(
                    flat.reshape(-1, w), jnp.int32)
            segs.append(flat.reshape(-1))
        return jnp.concatenate(segs) if len(segs) > 1 else segs[0]

    def unpack(self, flat: np.ndarray) -> dict:
        flat = np.ascontiguousarray(flat, np.int32)
        seg = {}
        off = 0
        for kind, view in (("i32", np.int32), ("i16", np.int16),
                           ("u8", np.uint8)):
            w = self.seg_words[kind]
            seg[kind] = flat[off:off + w].view(view)[:self.seg_elems[kind]]
            off += w
        out = {}
        for name, (kind, o, shape) in self.offsets.items():
            n = int(np.prod(shape))
            a = seg[kind][o:o + n].reshape(shape)
            # i32 keeps its exact 4-byte dtype (sse is a bitcast float32);
            # narrow kinds widen for downstream integer math
            out[name] = a if kind != "i16" else a.astype(np.int64)
        return out


class FractalCodec:
    """Sequence encoder with fractal P frames (reference capabilities F1-F10)."""

    def __init__(self, cfg: CodecConfig, mesh=None):
        """``mesh``: optional jax.sharding.Mesh with ('gop', 'tile') axes.
        When given (and inter_mode == 'fractal'), P frames run the sharded
        row-tile step (parallel.tiled_search) with ICI halo exchange; the
        emitted bitstream is byte-identical to the single-device encode
        because search validity bounds, reconstruction, and the deblock
        band grid (cfg.tile_rows) are all sharding-independent."""
        self.cfg = cfg.validate()
        fr = cfg.fractal
        # NOTE on tol_4: faithfully UNUSED.  The reference declares
        # ``double tol = input->tol_4`` in encode_block_4
        # (FR/src/block_enc.c:1681) but the comparison is commented out —
        # 4x4 is the terminal leaf either way.  We reproduce that behavior;
        # the config field exists for cfg-file parity only.
        self._search = functools.partial(
            F.search_plane, search_range=fr.search_range, tol16=fr.tol_16,
            tol8=fr.tol_8, use_halfpel=fr.use_halfpel_refs,
            search_mode=int(fr.search_mode),
            chun_lo=fr.chun_lo, chun_hi=fr.chun_hi,
            bounds=(int(round(fr.min_alpha * 100)),
                    int(round(fr.max_alpha * 100)),
                    int(round(fr.min_beta)), int(round(fr.max_beta))))
        # Per-plane, per-stage jits: search / reconstruct / residual are
        # separate XLA executables.  Fusing them into one graph crashes the
        # axon TPU backend at CIF+ sizes (worker "kernel fault"); split they
        # compile and run fine, and intermediates stay on-device between
        # stages so the cost is only lost fusion.
        self._search_jit = jax.jit(self._search)
        self._search2_jit = jax.jit(
            lambda o, r1, r2: self._search(o, r1, extra_ref_ctx=r2))
        self._recon2_jit = jax.jit(
            lambda tree, r1, r2, hp, wp: F.reconstruct_plane(
                tree, r1, hp, wp, use_halfpel=cfg.fractal.use_halfpel_refs,
                extra_ref_ctx=r2), static_argnums=(3, 4))
        self._recon_jit = jax.jit(
            functools.partial(F.reconstruct_plane,
                              use_halfpel=cfg.fractal.use_halfpel_refs),
            static_argnums=(2, 3))
        # qp is a TRACED argument everywhere (rate control changes it per
        # frame without recompiling); only booleans/shapes are static.
        self._residual_jit = jax.jit(T.residual_code_plane,
                                     static_argnums=(3, 4))
        self._maps_jit = jax.jit(F.leaf_maps, static_argnums=(1, 2))
        self._intra_jit = jax.jit(IN.encode_plane)
        # deblock in cfg.tile_rows independent row bands (shard-invariant
        # grouping; DB.deblock_plane_grouped) — groups fixed by config
        self._deblock_jit = jax.jit(
            functools.partial(DB.deblock_plane_grouped,
                              groups=max(cfg.tile_rows, 1)),
            static_argnums=(4,))
        self._c_step = jax.jit(self._c_step_impl)
        self.mesh = mesh
        if mesh is not None:
            from ..parallel import tiled_search as PAR
            from jax.sharding import NamedSharding, PartitionSpec as _P
            if cfg.tile_rows % mesh.shape["tile"]:
                raise ValueError("cfg.tile_rows must be a multiple of the "
                                 "mesh 'tile' axis size")
            self._tiled = PAR.tiled_p_step(
                mesh, search_range=fr.search_range, tol16=fr.tol_16,
                tol8=fr.tol_8, use_halfpel=fr.use_halfpel_refs,
                deblock=cfg.deblock, tile_rows=cfg.tile_rows,
                search_mode=int(fr.search_mode),
                chun_lo=fr.chun_lo, chun_hi=fr.chun_hi,
                bounds=self._search.keywords["bounds"])
            self._frame_sharding = NamedSharding(mesh, _P("gop", "tile", None))
        self._packers = {}

    def _packer(self, kind, dims):
        """Packer for a frame's host-bound outputs (kind: 'p' or 'i')."""
        key = (kind, tuple(dims))
        if key not in self._packers:
            specs = []
            for i, (h, w) in enumerate(dims):
                hp, wp = _pad16_np(h, w)
                if kind == "p":
                    for f in ("a", "beta", "dx", "dy", "ref", "shape"):
                        specs.append((f"{i}_{f}", (hp // 4, wp // 4), "i16"))
                elif kind == "i":
                    specs.append((f"{i}_modes", (h // 4, w // 4), "i16"))
                elif kind == "c" and i == 0:
                    specs.append(("mvx", (h // 16, w // 16), "i16"))
                    specs.append(("mvy", (h // 16, w // 16), "i16"))
                specs.append((f"{i}_zz", ((h // 4) * (w // 4), 16), "i16"))
                specs.append((f"{i}_rec", (h, w), "u8"))
                specs.append((f"{i}_sse", (1,), "i32"))
            self._packers[key] = _FramePacker(specs)
        return self._packers[key]

    def _pack_fn(self, kind, dims):
        """Jitted word-packing pack() of the (kind, dims) packer."""
        key = ("jit", kind, tuple(dims))
        if key not in self._packers:
            packer = self._packer(kind, dims)
            self._packers[key] = jax.jit(packer.pack)
        return self._packers[key]

    # -- intra step (wavefront 4x4 intra, ops/intra.py) ---------------------
    def _i_step(self, y, u, v, qp):
        cqp = T.chroma_qp(qp)
        modes_l, zzs, outs = [], [], []
        for plane, q, luma in ((y, qp, True), (u, cqp, False), (v, cqp, False)):
            modes, zz, rec = self._intra_jit(plane, q)
            if self.cfg.deblock:
                h, w = plane.shape
                bs_v, bs_h = DB.strengths_intra(h, w)
                rec = self._deblock_jit(rec, bs_v, bs_h, q, luma)
            modes_l.append(modes)
            outs.append(rec)
            zzs.append(zz)
        return tuple(modes_l), tuple(zzs), tuple(outs)

    # -- fractal P step -----------------------------------------------------
    def _p_plane(self, org, ref, qp, is_luma, ref2=None):
        h, w = org.shape
        orgp = _pad16(org)
        refp = _pad16(ref)
        hp, wp = orgp.shape
        if ref2 is not None:
            ref2p = _pad16(ref2)
            tree = self._search2_jit(orgp, refp, ref2p)
            maps = self._maps_jit(tree, hp, wp)
            frec = self._recon2_jit(tree, refp, ref2p, hp, wp)[:h, :w]
        else:
            tree = self._search_jit(orgp, refp)
            maps = self._maps_jit(tree, hp, wp)
            frec = self._recon_jit(tree, refp, hp, wp)[:h, :w]
        zz, rec = self._residual_jit(org, frec, qp, False, is_luma)
        if self.cfg.deblock:
            nz = (zz != 0).any(axis=-1).reshape(h // 4, w // 4)
            bs_v, bs_h = DB.strengths_fractal(
                {k: m[:h // 4, :w // 4] for k, m in maps.items()}, nz)
            rec = self._deblock_jit(rec, bs_v, bs_h, qp, is_luma)
        return maps, zz, rec

    def _p_step(self, y, u, v, ref_y, ref_u, ref_v, qp=None, ref2=None):
        qp = self.cfg.qp if qp is None else qp
        cqp = T.chroma_qp(qp)
        all_maps, zzs, recs = [], [], []
        r2 = ref2 if ref2 is not None else (None, None, None)
        for org, ref, q, is_luma, x2 in ((y, ref_y, qp, True, r2[0]),
                                         (u, ref_u, cqp, False, r2[1]),
                                         (v, ref_v, cqp, False, r2[2])):
            maps, zz, rec = self._p_plane(org, ref, q, is_luma, ref2=x2)
            all_maps.append(maps)
            zzs.append(zz)
            recs.append(rec)
        return tuple(all_maps), tuple(zzs), tuple(recs)

    # -- classic H.264-style inter step (ops/me.py; SURVEY J6) ---------------
    def _c_step_impl(self, y, u, v, ref_y, ref_u, ref_v, qp):
        cfg = self.cfg
        cqp = T.chroma_qp(qp)
        sr = cfg.me_search_range
        lam = 1  # flat MV-cost weight; lambda-per-qp refinement on roadmap
        h, w = y.shape

        up_y = ME.sixtap_halfpel(ref_y)
        me0 = ME.full_search_int(y, ref_y, 16, sr, lam)
        me1 = ME.subpel_refine(y, up_y, me0, 16, lam)
        pred_y = ME.motion_compensate(up_y, me1.mv_x, me1.mv_y, 16, h, w)
        zz_y, rec_y = T.residual_code_plane(y, pred_y, qp, False, True)

        zzs, recs = [zz_y], [rec_y]
        mv_cx = me1.mv_x >> 1          # luma 1/4-pel -> chroma 1/4-pel approx
        mv_cy = me1.mv_y >> 1
        for org, ref in ((u, ref_u), (v, ref_v)):
            hc, wc = org.shape
            up_c = ME.sixtap_halfpel(ref)
            pred = ME.motion_compensate(up_c, mv_cx, mv_cy, 8, hc, wc)
            zz, rec = T.residual_code_plane(org, pred, cqp, False, False)
            zzs.append(zz)
            recs.append(rec)

        if cfg.deblock:
            nzy = (zz_y != 0).any(axis=-1).reshape(h // 4, w // 4)
            mvx_c = jnp.repeat(jnp.repeat(me1.mv_x, 4, 0), 4, 1)
            mvy_c = jnp.repeat(jnp.repeat(me1.mv_y, 4, 0), 4, 1)
            bs_v, bs_h = DB.strengths_inter(mvx_c, mvy_c, nzy)
            recs[0] = DB.deblock_plane(recs[0], bs_v, bs_h, qp, True)
            for i, org in ((1, u), (2, v)):
                hc, wc = recs[i].shape
                nzc = (zzs[i] != 0).any(axis=-1).reshape(hc // 4, wc // 4)
                mvxc = jnp.repeat(jnp.repeat(mv_cx, 2, 0), 2, 1)
                mvyc = jnp.repeat(jnp.repeat(mv_cy, 2, 0), 2, 1)
                bs_v, bs_h = DB.strengths_inter(mvxc, mvyc, nzc)
                recs[i] = DB.deblock_plane(recs[i], bs_v, bs_h, cqp, False)
        return (me1.mv_x, me1.mv_y), tuple(zzs), tuple(recs)

    # -- frame / sequence ----------------------------------------------------
    def is_intra(self, frame_idx: int) -> bool:
        if frame_idx == 0:
            return True
        ip = self.cfg.intra_period
        return ip > 0 and frame_idx % ip == 0

    def dispatch_frame(self, yuv, ref=None, frame_idx: int = 0,
                       qp: int = None, ref2=None) -> dict:
        """Enqueue all device work for one frame; returns a pending handle.

        No host synchronization happens here — the packed output buffer is an
        in-flight device array.  ``ref`` may be numpy or device arrays.
        ``qp`` overrides the config QP (rate control).
        """
        y, u, v = (jnp.asarray(p, jnp.int32) for p in yuv)
        orgs = (y, u, v)
        dims = [tuple(p.shape) for p in orgs]
        intra = self.is_intra(frame_idx) or ref is None
        if qp is None:
            qp = self.cfg.qp_i if intra else self.cfg.qp

        classic = (not intra) and self.cfg.inter_mode == "classic"
        if intra:
            modes_l, zzs, recs = self._i_step(y, u, v, qp)
        elif classic:
            refs = tuple(jnp.asarray(p, jnp.int32) for p in ref)
            mvs, zzs, recs = self._c_step(y, u, v, *refs, qp)
        elif self.mesh is not None and ref2 is None:
            refs = tuple(jnp.asarray(p, jnp.int32) for p in ref)
            args = tuple(jax.device_put(a[None], self._frame_sharding)
                         for a in orgs + refs)
            maps_b, zzs_b, recs_b = self._tiled(*args, jnp.int32(qp))
            maps = [{k: m[0] for k, m in d.items()} for d in maps_b]
            zzs = tuple(z[0] for z in zzs_b)
            recs = tuple(r[0] for r in recs_b)
        else:
            # dual-ref (multiview side views) always takes the unsharded
            # step: the tiled mesh step has no ref2 plumbing, and silently
            # dropping the cross-view reference would degrade quality while
            # the stream still pays 3-bit ref fields.
            refs = tuple(jnp.asarray(p, jnp.int32) for p in ref)
            r2 = None if ref2 is None else tuple(
                jnp.asarray(p, jnp.int32) for p in ref2)
            maps, zzs, recs = self._p_step(y, u, v, *refs, qp=qp, ref2=r2)

        parts = []
        for i in range(3):
            if intra:
                parts.append(modes_l[i])
            elif classic:
                if i == 0:
                    parts.extend(mvs)
            else:
                for f in ("a", "beta", "dx", "dy", "ref", "shape"):
                    parts.append(maps[i][f])
            parts.append(zzs[i])
            parts.append(recs[i])
            sse = ((recs[i] - orgs[i]).astype(jnp.float32) ** 2).sum()
            parts.append(jax.lax.bitcast_convert_type(sse, jnp.int32).reshape(1))
        kind = "i" if intra else ("c" if classic else "p")
        packed = self._pack_fn(kind, dims)(parts)
        return dict(intra=intra, kind=kind, dims=dims, packed=packed,
                    recs=recs, qp=qp, dual_ref=ref2 is not None)

    def finalize_frame(self, pending: dict):
        """Fetch the packed buffer (one tunnel round-trip) and entropy-code.

        Returns (FrameResult, payload bytes)."""
        cfg = self.cfg
        intra = pending["intra"]
        kind = pending.get("kind", "i" if intra else "p")
        dims = pending["dims"]
        ent = int(cfg.entropy)  # EntropyMode values == stream entropy ids
        packer = self._packer(kind, dims)
        h = packer.unpack(np.asarray(pending["packed"]))

        w = BitWriter()
        w.u({"i": 0, "p": 1, "c": 2}[kind], 8)
        w.u(int(pending["qp"]), 8)
        for i, (ph, pw) in enumerate(dims):
            if kind == "i":
                FS.write_intra_modes(w, h[f"{i}_modes"])
            elif kind == "c":
                if i == 0:
                    w.se(h["mvx"].reshape(-1))
                    w.se(h["mvy"].reshape(-1))
            else:
                rb = 3 if pending.get("dual_ref") else None
                FS.write_tree(w, {f: h[f"{i}_{f}"] for f in
                                  ("a", "beta", "dx", "dy", "ref", "shape")},
                              cfg.fractal.search_range,
                              cfg.fractal.use_halfpel_refs, ref_bits=rb)
            FS.write_residual(w, h[f"{i}_zz"], ph // 4, pw // 4, ent)
        payload = w.to_bytes()

        rec_np = tuple(h[f"{i}_rec"].astype(np.uint8) for i in range(3))
        psnrs = []
        for i, (ph, pw) in enumerate(dims):
            mse = float(h[f"{i}_sse"].view(np.float32)[0]) / (ph * pw)
            psnrs.append(99.99 if mse == 0 else
                         10.0 * np.log10(255.0 * 255.0 / mse))
        res = FrameResult(
            frame_type="I" if intra else "P", psnr_y=psnrs[0],
            psnr_u=psnrs[1], psnr_v=psnrs[2], bits=len(payload) * 8,
            recon=rec_np, qp=int(pending["qp"]))
        res.recon_dev = pending["recs"]
        return res, payload

    def encode_frame(self, yuv, ref=None, frame_idx: int = 0, qp: int = None):
        """Encode one frame; returns (FrameResult, frame_payload_bytes)."""
        return self.finalize_frame(self.dispatch_frame(yuv, ref, frame_idx, qp))

    def encode_sequence(self, frames, verbose: bool = False):
        """Encode an iterable of (Y, U, V) uint8 frames.

        Software-pipelined: frame N's host entropy packing overlaps frame
        N+1's device compute (the recon feedback stays on-device).  With
        cfg.rate_control the loop runs sequentially instead (frame N's bits
        feed frame N+1's QP).
        Returns (results, bitstream bytes)."""
        if self.cfg.num_regions == 2:
            res, stream, _masks = self.encode_sequence_region(
                list(frames), verbose=verbose)
            return res, stream
        if self.cfg.rate_control and self.cfg.target_bitrate > 0:
            return self._encode_sequence_rc(frames, verbose)
        results = []
        payloads = []
        pending = None
        ref = None
        for idx, yuv in enumerate(frames):
            disp = self.dispatch_frame(yuv, ref, idx)
            ref = disp["recs"]
            if pending is not None:
                results.append(self._emit(pending, payloads, verbose))
            pending = disp
        if pending is not None:
            results.append(self._emit(pending, payloads, verbose))
        return results, self._assemble(payloads, len(results))

    def _encode_sequence_rc(self, frames, verbose: bool):
        """Rate-controlled sequence encode (quadratic model, models/ratectl)."""
        from .ratectl import QuadraticRateControl
        cfg = self.cfg
        rc = QuadraticRateControl(cfg.target_bitrate, cfg.frame_rate, cfg.qp)
        results = []
        payloads = []
        ref = None
        for idx, yuv in enumerate(frames):
            intra = self.is_intra(idx) or ref is None
            qp = cfg.qp_i if intra else rc.frame_qp()
            res, payload = self.encode_frame(yuv, ref, idx, qp=qp)
            ref = res.recon_dev
            results.append(res)
            payloads.append(payload)
            if not intra:
                mse_y = 255.0 ** 2 / (10.0 ** (res.psnr_y / 10.0))
                rc.update(res.bits, qp, float(np.sqrt(mse_y)))
            if verbose:
                print(f"frame {idx:3d} {res.frame_type} qp {qp:2d}  "
                      f"PSNR Y {res.psnr_y:6.2f}  bits {res.bits}")
        return results, self._assemble(payloads, len(results))

    def _assemble(self, payloads, num_frames: int, views: int = None) -> bytes:
        """Wrap frame payloads in the configured container (cfg.container):
        raw FVC concatenation, Annex-B NAL stream, or an RTP packet file."""
        cfg = self.cfg
        if views is not None and views != cfg.views:
            cfg = dataclasses.replace(cfg, views=views)
        hdr = BitWriter()
        FS.write_header(hdr, cfg, num_frames)
        header_bytes = hdr.to_bytes()
        if cfg.container == "annexb":
            from ..bitstream import nal
            return nal.wrap_stream(cfg, header_bytes, payloads)
        if cfg.container == "rtp":
            from ..bitstream import rtp
            return rtp.packetize(cfg, header_bytes, payloads)
        return header_bytes + b"".join(payloads)

    def _emit(self, pending, payloads, verbose):
        res, payload = self.finalize_frame(pending)
        payloads.append(payload)
        if verbose:
            idx = len(payloads) - 1
            print(f"frame {idx:3d} {res.frame_type}  "
                  f"PSNR Y {res.psnr_y:6.2f}  U {res.psnr_u:6.2f}  "
                  f"V {res.psnr_v:6.2f}  bits {res.bits}")
        return res

    # ------------------------------------------------------------------
    # Object/region-based coding (reference capability F24, Num_Regions=2)
    # ------------------------------------------------------------------
    def encode_sequence_region(self, frames, masks=None, verbose=False):
        """Region-coded sequence (cfg.num_regions == 2): luma P frames use
        the per-object masked fractal search (ops/region) with alpha-plane
        masks; chroma planes use the normal fractal path.  ``masks`` are
        side information (the reference reads them from Infile_*_plane
        files, FR/src/image.c:96-103); if None they are derived by the
        temporal-differencing segmenter (ops/segment.segment_sequence).

        Returns (results, stream, masks) — the decoder needs the same masks.
        """
        from ..ops import region as RG
        from ..ops import segment as SG

        cfg = self.cfg
        if masks is None:
            masks = [np.asarray(m, np.uint8)
                     for m in SG.segment_sequence([f[0] for f in frames])]
        results, payloads = [], []
        ref = None
        search = functools.partial(
            RG.region_search_plane, search_range=cfg.fractal.search_range,
            use_halfpel=cfg.fractal.use_halfpel_refs)
        search = jax.jit(search)
        for idx, yuv in enumerate(frames):
            if self.is_intra(idx) or ref is None:
                res, payload = self.encode_frame(yuv, None, 0)
                results.append(res)
                payloads.append(payload)
                ref = res.recon_dev
                continue
            y, u, v = (jnp.asarray(pl, jnp.int32) for pl in yuv)
            qp = cfg.qp
            cqp = T.chroma_qp(qp)
            m_cur, m_ref = masks[idx], masks[idx - 1]
            params = search(y, ref[0], m_cur, m_ref)
            frec = RG.region_reconstruct(
                {k: params[k] for k in ("a", "beta", "dx", "dy", "ref")},
                ref[0], m_cur, m_ref,
                use_halfpel=cfg.fractal.use_halfpel_refs)
            zz_y, rec_y = self._residual_jit(y, frec, qp, False, True)

            w = BitWriter()
            w.u(3, 8)                     # frame type 3 = region-coded
            w.u(int(qp), 8)
            FS.write_region_params(
                w, {k: np.asarray(params[k]) for k in params},
                cfg.fractal.search_range, cfg.fractal.use_halfpel_refs)
            FS.write_residual(w, np.asarray(zz_y), y.shape[0] // 4,
                              y.shape[1] // 4, int(cfg.entropy))
            recs = [rec_y]
            for org, rf, luma in ((u, ref[1], False), (v, ref[2], False)):
                maps, zz, rec = self._p_plane(org, rf, cqp, luma)
                FS.write_tree(w, {k: np.asarray(m) for k, m in maps.items()},
                              cfg.fractal.search_range,
                              cfg.fractal.use_halfpel_refs)
                FS.write_residual(w, np.asarray(zz), org.shape[0] // 4,
                                  org.shape[1] // 4, int(cfg.entropy))
                recs.append(rec)
            payload = w.to_bytes()
            payloads.append(payload)
            rec_np = tuple(np.asarray(r, np.uint8) for r in recs)
            res = FrameResult(
                frame_type="R", psnr_y=psnr(np.asarray(yuv[0]), rec_np[0]),
                psnr_u=psnr(np.asarray(yuv[1]), rec_np[1]),
                psnr_v=psnr(np.asarray(yuv[2]), rec_np[2]),
                bits=len(payload) * 8, recon=rec_np, qp=qp)
            res.recon_dev = tuple(recs)
            results.append(res)
            ref = res.recon_dev
            if verbose:
                print(f"frame {idx:3d} R  PSNR Y {res.psnr_y:6.2f}  "
                      f"bits {res.bits}")
        return results, self._assemble(payloads, len(frames)), masks

    # ------------------------------------------------------------------
    # Stereo / 3-view coding (reference capability F25)
    # ------------------------------------------------------------------
    def encode_sequence_views(self, view_frames, verbose: bool = False):
        """Encode 1 or 3 views (C[, R, L]) per the reference's scheme
        (``FR/src/code.c:171-306``): every view is intra-coded on I frames;
        on P frames the center view predicts from its own previous
        reconstruction while the side views search BOTH their own previous
        reconstruction and the CENTER view's current reconstruction, with
        the chosen reference signaled per leaf (3-bit ref: planes 0-3 = own
        prev C/H/M/N, 4-7 = center current) — the reference's per-view
        C->H->M->N chain (FR/src/block_enc.c:560-830) plus the cross-view
        disparity search (``full_search_R`` :2031, full-lattice superset).

        ``view_frames``: list over views of lists of (Y, U, V) frames.
        Returns (results [view][frame], stream bytes).
        """
        n_views = len(view_frames)
        assert n_views in (1, 3)
        num_frames = len(view_frames[0])
        results = [[] for _ in range(n_views)]
        payloads = []
        ref_c = None
        prev_views = [None] * n_views
        queue = []
        for idx in range(num_frames):
            intra = self.is_intra(idx) or ref_c is None
            disp_c = self.dispatch_frame(view_frames[0][idx],
                                         None if intra else ref_c, idx)
            disps = [disp_c]
            for vi in range(1, n_views):
                own_prev = None if intra else prev_views[vi]
                disps.append(self.dispatch_frame(
                    view_frames[vi][idx],
                    own_prev, idx,
                    ref2=None if intra else disp_c["recs"]))
            ref_c = disp_c["recs"]
            prev_views = [d["recs"] for d in disps]
            queue.append(disps)
            if len(queue) > 1:
                self._emit_views(queue.pop(0), results, payloads, verbose)
        while queue:
            self._emit_views(queue.pop(0), results, payloads, verbose)
        return results, self._assemble(payloads, num_frames, views=n_views)

    def _emit_views(self, disps, results, payloads, verbose):
        for vi, disp in enumerate(disps):
            res, payload = self.finalize_frame(disp)
            results[vi].append(res)
            payloads.append(payload)
            if verbose:
                print(f"frame {len(results[vi]) - 1:3d} view {vi} "
                      f"{res.frame_type}  PSNR Y {res.psnr_y:6.2f}  "
                      f"bits {res.bits}")


class FractalDecoder:
    """Decoder for FVC streams; mirrors the encoder's in-loop reconstruction
    bit-exactly (the TPU equivalent of the reference's embedded decoder,
    ``FR/src/block_dec.c`` + ``decode_Oneframe`` FR/src/image.c:639)."""

    def __init__(self):
        self._dec_p_plane = {}
        self._dec_i_plane = {}
        self._dec_c_plane = {}

    def _c_plane_fn(self, key):
        if key not in self._dec_c_plane:
            h, w, deblock, luma, groups = key
            bs = 16 if luma else 8
            cell = 4 if luma else 2

            def fn(mvx, mvy, zz, ref, qp):
                up = ME.sixtap_halfpel(ref)
                pred = ME.motion_compensate(up, mvx, mvy, bs, h, w)
                deq = T.dequant4x4(T.zigzag_unscan(zz), qp)
                rec = T.reconstruct(T.frame_to_blocks(pred, 4), T.idct4x4(deq))
                rec = T.blocks_to_frame(rec, h, w)
                if deblock:
                    nz = (zz != 0).any(axis=-1).reshape(h // 4, w // 4)
                    mvxc = jnp.repeat(jnp.repeat(mvx, cell, 0), cell, 1)
                    mvyc = jnp.repeat(jnp.repeat(mvy, cell, 0), cell, 1)
                    bs_v, bs_h = DB.strengths_inter(mvxc, mvyc, nz)
                    rec = DB.deblock_plane_grouped(rec, bs_v, bs_h, qp, luma,
                                                   groups)
                return rec

            self._dec_c_plane[key] = jax.jit(fn)
        return self._dec_c_plane[key]

    def _p_plane_fn(self, key):
        if key not in self._dec_p_plane:
            h, w, use_hp, deblock, luma, groups, dual = key

            def fn(a, beta, dx, dy, refidx, shape, zz, ref, qp, ref2=None):
                maps = dict(a=a, beta=beta, dx=dx, dy=dy, ref=refidx, shape=shape)
                refp = _pad16(ref)
                hp, wp = refp.shape
                x2 = _pad16(ref2) if dual else None
                frec = F.reconstruct_from_maps(maps, refp, hp, wp, use_hp,
                                               extra_ref_ctx=x2)[:h, :w]
                lev = T.zigzag_unscan(zz)
                deq = T.dequant4x4(lev, qp)
                rec = T.reconstruct(T.frame_to_blocks(frec, 4), T.idct4x4(deq))
                rec = T.blocks_to_frame(rec, h, w)
                if deblock:
                    nz = (zz != 0).any(axis=-1).reshape(h // 4, w // 4)
                    bs_v, bs_h = DB.strengths_fractal(
                        {k: m[:h // 4, :w // 4] for k, m in maps.items()}, nz)
                    rec = DB.deblock_plane_grouped(rec, bs_v, bs_h, qp, luma,
                                                   groups)
                return rec

            self._dec_p_plane[key] = jax.jit(fn)
        return self._dec_p_plane[key]

    def _i_plane_fn(self, key):
        if key not in self._dec_i_plane:
            h, w, deblock, luma, groups = key

            def fn(modes, zz, qp):
                rec = IN.decode_plane(modes, zz, h, w, qp)
                if deblock:
                    bs_v, bs_h = DB.strengths_intra(h, w)
                    rec = DB.deblock_plane_grouped(rec, bs_v, bs_h, qp, luma,
                                                   groups)
                return rec

            self._dec_i_plane[key] = jax.jit(fn)
        return self._dec_i_plane[key]

    @staticmethod
    def detect_container(stream: bytes) -> str:
        if stream[:4] == b"FVC1":
            return "fvc"
        if stream[:3] == b"\x00\x00\x01" or stream[:4] == b"\x00\x00\x00\x01":
            return "annexb"
        return "rtp"

    def decode(self, stream: bytes, verbose: bool = False, masks=None):
        """Decode a stream in any container (auto-detected).  For Annex-B/RTP
        containers, lost frame NALUs/packets are concealed by frame copy
        (the simplest mode of the reference's inter concealment,
        ``erc_do_p.c`` / ``FR/src/erc_do_p.c``).  ``masks`` = per-frame
        alpha planes, required for region-coded (type 3) frames — side
        information exactly like the reference's Infile_*_plane files."""
        self._masks = masks
        kind = self.detect_container(stream)
        if kind == "fvc":
            r = BitReader(stream)
            hdr = FS.read_header(r)
            unit_reader = lambda i: r           # shared sequential reader
        else:
            if kind == "annexb":
                from ..bitstream import nal
                _, _, header_bytes, payloads = nal.unwrap_stream(stream)
            else:
                from ..bitstream import rtp
                _, _, header_bytes, payloads = rtp.depacketize(stream)
            hdr = FS.read_header(BitReader(header_bytes))
            unit_reader = lambda i: (BitReader(payloads[i])
                                     if i in payloads else None)
        return self._decode_units(hdr, unit_reader, verbose)

    def _decode_region_y(self, r, hdr, ref_y, fidx, fqp):
        from ..ops import region as RG
        W, H = hdr["width"], hdr["height"]
        params = FS.read_region_params(r, H // 16, W // 16,
                                       hdr["search_range"],
                                       hdr["use_halfpel"])
        m_cur, m_ref = self._masks[fidx], self._masks[fidx - 1]
        frec = RG.region_reconstruct(
            {k: jnp.asarray(params[k], jnp.int32)
             for k in ("a", "beta", "dx", "dy", "ref")},
            jnp.asarray(ref_y, jnp.int32), m_cur, m_ref,
            use_halfpel=hdr["use_halfpel"])
        zz = FS.read_residual(r, H // 4, W // 4, hdr["entropy"])
        deq = T.dequant4x4(T.zigzag_unscan(jnp.asarray(zz, jnp.int32)), fqp)
        rec = T.reconstruct(T.frame_to_blocks(frec, 4), T.idct4x4(deq))
        return np.asarray(T.blocks_to_frame(rec, H, W), np.uint8)

    def _decode_units(self, hdr: dict, unit_reader, verbose: bool = False):
        W, H = hdr["width"], hdr["height"]
        sr = hdr["search_range"]
        use_hp = hdr["use_halfpel"]
        dbl = hdr["deblock"]
        grp = max(hdr.get("tile_rows", 1), 1)
        cw, ch = W // 2, H // 2
        plane_dims = [(H, W, True), (ch, cw, False), (ch, cw, False)]

        n_views = max(hdr.get("views", 1), 1)

        def conceal(ref):
            """Frame-copy concealment for a lost unit (erc_do_p analogue);
            mid-gray planes when there is no reference yet (erc_do_i)."""
            if ref is not None:
                return 1, tuple(np.array(p, np.uint8) for p in ref)
            return 0, tuple(np.full((h, w), 128, np.uint8)
                            for (h, w, _l) in plane_dims)

        def decode_one(r, ref, fidx=0, ref2=None):
            """Parse + reconstruct one view payload; ref = its reference
            frame planes (None for intra); ref2 = second reference frame
            (side views: center's current recon)."""
            if r is None:
                return conceal(ref)
            ftype = r.u(8)
            fqp = r.u(8)
            cqp = T.chroma_qp(fqp)
            qps = (fqp, cqp, cqp)
            planes = []
            if ftype == 0:
                for (h, w, luma), q in zip(plane_dims, qps):
                    modes = FS.read_intra_modes(r, h // 4, w // 4)
                    zz = FS.read_residual(r, h // 4, w // 4, hdr["entropy"])
                    rec = self._i_plane_fn((h, w, dbl, luma, grp))(
                        jnp.asarray(modes, jnp.int32),
                        jnp.asarray(zz, jnp.int32), q)
                    planes.append(np.asarray(rec, np.uint8))
            elif ftype == 2:
                nmby, nmbx = H // 16, W // 16
                mvx = jnp.asarray(
                    r.se_array(nmby * nmbx).reshape(nmby, nmbx), jnp.int32)
                mvy = jnp.asarray(
                    r.se_array(nmby * nmbx).reshape(nmby, nmbx), jnp.int32)
                for pi, ((h, w, luma), q) in enumerate(zip(plane_dims, qps)):
                    zz = FS.read_residual(r, h // 4, w // 4, hdr["entropy"])
                    fn = self._c_plane_fn((h, w, dbl, luma, grp))
                    mx, my = (mvx, mvy) if luma else (mvx >> 1, mvy >> 1)
                    rec = fn(mx, my, jnp.asarray(zz, jnp.int32),
                             jnp.asarray(ref[pi], jnp.int32), q)
                    planes.append(np.asarray(rec, np.uint8))
            else:
                if ftype == 3:            # region-coded luma (Num_Regions=2)
                    planes.append(self._decode_region_y(r, hdr, ref[0],
                                                        fidx, fqp))
                start_pi = 1 if ftype == 3 else 0
                dual = ref2 is not None
                for pi, ((h, w, luma), q) in enumerate(zip(plane_dims, qps)):
                    if pi < start_pi:
                        continue
                    hp, wp = _pad16_np(h, w)
                    maps = FS.read_tree(r, hp, wp, sr, use_hp,
                                        ref_bits=3 if dual else None)
                    zz = FS.read_residual(r, h // 4, w // 4, hdr["entropy"])
                    fn = self._p_plane_fn((h, w, use_hp, dbl, luma, grp,
                                           dual))
                    args = [jnp.asarray(maps[k], jnp.int32) for k in
                            ("a", "beta", "dx", "dy", "ref", "shape")]
                    args += [jnp.asarray(zz, jnp.int32),
                             jnp.asarray(ref[pi], jnp.int32), q]
                    if dual:
                        args.append(jnp.asarray(ref2[pi], jnp.int32))
                    rec = fn(*args)
                    planes.append(np.asarray(rec, np.uint8))
            r.byte_align()
            return ftype, tuple(planes)

        frames = [[] for _ in range(n_views)]
        ref_c = None
        prev_views = [None] * n_views
        for fi in range(hdr["num_frames"]):
            ftype, planes_c = decode_one(unit_reader(fi * n_views), ref_c,
                                         fidx=fi)
            ref_c = planes_c
            frames[0].append(planes_c)
            new_prev = [planes_c]
            for vi in range(1, n_views):
                # side views: own previous frame + the center's current
                # frame as the second reference (intra frames ignore refs)
                _, planes_v = decode_one(unit_reader(fi * n_views + vi),
                                         prev_views[vi],
                                         ref2=None if ftype == 0 else
                                         planes_c)
                frames[vi].append(planes_v)
                new_prev.append(planes_v)
            prev_views = new_prev
            if verbose:
                print(f"decoded frame {fi} type {'I' if ftype == 0 else 'P'}")
        return frames[0] if n_views == 1 else frames
