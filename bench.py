"""Benchmark: fractal+H.264 encode throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Headline metric (comparable across rounds, pinned frame set): CIF fractal
encode fps, QP24, SR 7, IPPP, 10 timed frames built by tiling the real
foreman QCIF frames shipped with the reference (2x2 tiling + per-frame
shifts for motion — real texture, deterministic).  Baseline: JM 18.5
measured by the reference authors on foreman CIF QP24 (full search, SR 7,
5 refs, CAVLC): 50 frames / 969 022 ms => 0.0516 fps (BASELINE.md §B,
JM/log.dat:5).  vs_baseline = our_fps / that (NOTE: the baseline machine is
a 2008 CPU — this ratio tracks progress vs the published row, NOT
speed-of-light; see the *_util_pct extras for that).

Extras: 720p/1080p fps (3 timed frames each) and the effective search
arithmetic utilization — search MACs (n_offsets x n_refs x H x W x 1.5
planes) per second over a nominal 2 Tops/s int32 VPU peak for v5e.
"""

import functools
import json
import time

import numpy as np

JM_BASELINE_FPS = 50.0 / 969.022  # foreman CIF QP24, JM/log.dat:5
VPU_INT32_PEAK = 2.0e12           # nominal v5e int32 MAC/s (order of magnitude)


def make_frames(n: int, H: int, W: int):
    """Deterministic test sequence at HxW tiled from the real foreman QCIF
    frames (the only real video shipped in the reference checkout)."""
    from h264tpu.utils.yuv import YUVReader
    path = "/root/reference/4.对比程序/jm18.5/JM/bin/foreman_part_qcif.yuv"
    try:
        r = YUVReader(path, 176, 144)
        base = [r.read(i) for i in range(len(r))]
    except FileNotFoundError:
        rng = np.random.default_rng(0)
        base = [tuple(rng.integers(0, 255, s).astype(np.uint8)
                      for s in ((144, 176), (72, 88), (72, 88)))]

    def tile_to(p, h, w):
        ty = -(-h // p.shape[0])
        tx = -(-w // p.shape[1])
        return np.tile(p, (ty, tx))[:h, :w]

    frames = []
    for i in range(n):
        y, u, v = base[i % len(base)]
        s = i % 3
        frames.append((
            np.roll(tile_to(y, H, W), (s, -s), axis=(0, 1)),
            np.roll(tile_to(u, H // 2, W // 2), (s, -s), axis=(0, 1)),
            np.roll(tile_to(v, H // 2, W // 2), (s, -s), axis=(0, 1)),
        ))
    return frames


def bench_resolution(H, W, qp, sr, n_timed, n_warm=2):
    """Returns (fps, search_gmacs_per_frame)."""
    import jax.numpy as jnp
    from h264tpu.utils.config import CodecConfig, FractalConfig
    from h264tpu.models.fractal_codec import FractalCodec
    from h264tpu.ops.fractal import spiral_offsets

    cfg = CodecConfig(width=W, height=H, qp=qp, intra_period=0,
                      fractal=FractalConfig(search_range=sr))
    codec = FractalCodec(cfg)
    frames = [tuple(jnp.asarray(p, jnp.int32) for p in f)
              for f in make_frames(n_warm + n_timed + 1, H, W)]

    res0, _ = codec.encode_frame(frames[0], None, 0)
    res1, _ = codec.encode_frame(frames[1], res0.recon_dev, 1)
    ref = res1.recon_dev

    t0 = time.time()
    pending = None
    for i in range(n_timed):
        disp = codec.dispatch_frame(frames[2 + (i % (len(frames) - 2))],
                                    ref, 2 + i)
        ref = disp["recs"]
        if pending is not None:
            codec.finalize_frame(pending)
        pending = disp
    codec.finalize_frame(pending)
    fps = n_timed / (time.time() - t0)

    n_off = spiral_offsets(sr).shape[0]
    macs = n_off * 4 * H * W * 1.5          # 4 ref planes, Y + 2 chroma/4
    return fps, macs / 1e9


def bench_avc(n_timed=8, qp=28, sr=8, n_slices=9, H=288, W=352):
    """Conformant H.264 path (TPU-resident encoder, full-RD + adaptive
    rounding): IPPP at the given size.

    Returns (fps, psnr_y_mean, kbps at 30 fps).  Baseline for vs_jm:
    the JM 18.5 authors' foreman CIF row (BASELINE.md §B, 0.0516 fps
    on their 2008 CPU)."""
    from h264tpu.avc.params import AVCParams
    from h264tpu.avc.tpu_codec import TPUAVCCodec

    frames = make_frames(n_timed + 2, H, W)
    p = AVCParams(width=W, height=H, qp=qp, num_ref_frames=1, level_idc=42)
    codec = TPUAVCCodec(p, intra_period=0, search_range=sr,
                        n_slices=n_slices)
    codec.encode_sequence(frames[:2])              # compile
    t0 = time.time()
    results, stream = codec.encode_sequence(frames)
    dt = time.time() - t0
    fps = len(frames) / dt
    psnr = sum(r.psnr_y for r in results) / len(results)
    kbps = len(stream) * 8 * 30.0 / len(frames) / 1000.0
    return fps, psnr, kbps


def bench_jm_host(n_cif=10, n_1080=3, qp=28, sr=8):
    """Measure JM 18.5 lencod on THIS host (judge-matched settings:
    encoder_baseline.cfg, RDO=1, CAVLC, 1 ref) — the honest anchor for
    avc_vs_jm_host.  Needs the .jm oracle build (tools/build_jm.sh)."""
    import os
    import subprocess
    import tempfile
    jm_bin = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jm", "JM", "bin")
    if not os.path.exists(os.path.join(jm_bin, "lencod.exe")):
        return None

    def run(H, W, n_frames):
        with tempfile.TemporaryDirectory() as tmp:
            raw = bytearray()
            for y, u, v in make_frames(n_frames, H, W):
                raw += y.tobytes() + u.tobytes() + v.tobytes()
            src = os.path.join(tmp, "in.yuv")
            open(src, "wb").write(bytes(raw))
            t0 = time.time()
            r = subprocess.run(
                [os.path.join(jm_bin, "lencod.exe"),
                 "-d", os.path.join(jm_bin, "encoder_baseline.cfg"),
                 "-p", f"InputFile={src}",
                 "-p", f"FramesToBeEncoded={n_frames}",
                 "-p", f"SourceWidth={W}", "-p", f"SourceHeight={H}",
                 "-p", f"OutputWidth={W}", "-p", f"OutputHeight={H}",
                 "-p", "IntraPeriod=0", "-p", "IDRPeriod=0",
                 "-p", f"QPISlice={qp}", "-p", f"QPPSlice={qp}",
                 "-p", "SymbolMode=0", "-p", "OutFileMode=0",
                 "-p", f"OutputFile={os.path.join(tmp, 'o.264')}",
                 "-p", f"ReconFile={os.path.join(tmp, 'r.yuv')}",
                 "-p", "NumberReferenceFrames=1", "-p", "RDOptimization=1",
                 "-p", f"SearchRange={sr}"],
                capture_output=True, text=True, cwd=tmp, timeout=600)
            if r.returncode != 0:
                return None
            return n_frames / (time.time() - t0)
    return run(288, 352, n_cif), run(1088, 1920, n_1080)


def bench_avc_stages(qp=28, sr=8, n_slices=17, H=1088, W=1920):
    """Per-stage wall budget of one steady-state P frame at 1080p
    (upload / device search+RD graph / transfers / host pack / deblock /
    ref prep) — the frame time decomposition VERDICT round 4 asked for."""
    import jax
    import jax.numpy as jnp
    from h264tpu.avc.params import AVCParams, SLICE_P
    from h264tpu.avc import tpu_enc as TE
    from h264tpu.avc import tpu_codec as TC
    from h264tpu.avc import native as AN
    from h264tpu.avc.deblock import DeblockContext

    p = AVCParams(width=W, height=H, qp=qp, num_ref_frames=1, level_idc=42)
    mb_h, mb_w = p.mb_h, p.mb_w
    frames = make_frames(3, H, W)
    no_force = jnp.zeros((mb_h, mb_w), bool)
    enc = functools.partial(TE.encode_frame, mb_h=mb_h, mb_w=mb_w, sr=sr,
                            intra_only=False, n_slices=n_slices,
                            chroma_qp_offset=p.chroma_qp_offset)

    def orgbuf(yuv):
        return np.concatenate(
            [yuv[0], np.concatenate([yuv[1], yuv[2]], axis=1)],
            axis=0).astype(np.uint8)

    prep = TC._prep_ref_packed(jnp.asarray(orgbuf(frames[0])), sr=sr,
                               H=H, W=W)
    ups, us, vs = (prep[0][None], prep[1][None], prep[2][None])
    stages = {}

    def tick(name, fn, reps=2):
        fn()                                   # compile / warm
        ts = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        stages[name] = round(float(np.median(ts)), 3)

    ob = orgbuf(frames[1])
    tick("upload", lambda: jax.block_until_ready(
        TC._split_org(jnp.asarray(ob), H=H, W=W)))
    y, u, v = TC._split_org(jnp.asarray(ob), H=H, W=W)
    tick("encode_graph", lambda: jax.block_until_ready(
        enc(y, u, v, ups, us, vs, jnp.int32(qp), jnp.int32(1), no_force)))
    sym, rec, tctx = enc(y, u, v, ups, us, vs, jnp.int32(qp), jnp.int32(1),
                         no_force)
    tick("pack_out", lambda: jax.block_until_ready(
        TC._pack_out(sym, tctx, rec)))
    bufs = TC._pack_out(sym, tctx, rec)
    tick("download", lambda: jax.device_get(bufs))
    bufh = jax.device_get(bufs)
    symh, ctxh, rec_np = TC._unpack_out(*bufh, mb_h, mb_w)
    rows = mb_h // n_slices
    tick("pack_host", lambda: [AN.pack_slice(
        symh, p, SLICE_P, qp, 1, False, 0, 1, row0=s0 * rows, n_rows=rows)
        for s0 in range(n_slices)])
    ctx = DeblockContext(mb_w, mb_h, qp, p.chroma_qp_offset)
    ctx.mb_intra = np.asarray(ctxh["mb_intra"])
    ctx.nnz = np.asarray(ctxh["nnz"], np.int64)
    ctx.mv = np.asarray(ctxh["mv"], np.int64)
    ctx.ref = np.asarray(ctxh["ref"], np.int64)
    tick("deblock_host", lambda: AN.deblock_frame(*rec_np, ctx))
    rec_db = AN.deblock_frame(*rec_np, ctx)
    rb = np.concatenate(
        [rec_db[0], np.concatenate([rec_db[1], rec_db[2]], axis=1)],
        axis=0).astype(np.uint8)
    tick("ref_prep", lambda: jax.block_until_ready(
        TC._prep_ref_packed(jnp.asarray(rb), sr=sr, H=H, W=W)))
    return stages


def main():
    out = {}

    def emit():
        # one line per completed section: if the driver's timeout kills
        # us mid-run, the LAST complete line still carries everything
        # measured so far (the driver records the final line)
        print(json.dumps(out), flush=True)

    try:
        cif_fps, cif_gmac = bench_resolution(288, 352, qp=24, sr=7,
                                             n_timed=10)
    except Exception as e:
        # still emit one parseable line if the chip/tunnel is unhealthy
        print(json.dumps({"metric": "cif_fractal_encode_fps", "value": 0.0,
                          "unit": "frames/s", "vs_baseline": 0.0,
                          "error": f"{type(e).__name__}: {str(e)[:160]}"}))
        return
    out.update({
        "metric": "cif_fractal_encode_fps",
        "value": round(cif_fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(cif_fps / JM_BASELINE_FPS, 1),
        "cif_search_util_pct": round(
            100.0 * cif_fps * cif_gmac * 1e9 / VPU_INT32_PEAK, 3),
    })
    emit()
    for name, (H, W) in (("720p", (720, 1280)), ("1080p", (1088, 1920))):
        try:
            fps, gmac = bench_resolution(H, W, qp=24, sr=7, n_timed=3)
            out[f"{name}_fps"] = round(fps, 3)
            out[f"{name}_search_util_pct"] = round(
                100.0 * fps * gmac * 1e9 / VPU_INT32_PEAK, 3)
        except Exception as e:             # keep the headline row alive
            out[f"{name}_fps"] = None
            out[f"{name}_error"] = type(e).__name__
        emit()
    try:
        avc_fps, avc_psnr, avc_kbps = bench_avc()
        out["avc_cif_fps"] = round(avc_fps, 3)
        out["avc_cif_psnr_y"] = round(avc_psnr, 2)
        out["avc_cif_kbps"] = round(avc_kbps, 1)
        out["avc_vs_jm2008"] = round(avc_fps / JM_BASELINE_FPS, 1)
    except Exception as e:
        out["avc_cif_fps"] = None
        out["avc_error"] = f"{type(e).__name__}: {str(e)[:120]}"
    emit()
    # hierarchical-B CABAC (BASELINE config 4 shape) at CIF
    try:
        from h264tpu.avc.params import AVCParams
        from h264tpu.avc.tpu_codec import TPUAVCCodec
        frames = make_frames(9, 288, 352)
        p = AVCParams(width=352, height=288, qp=28, profile_idc=77,
                      poc_type=0, num_ref_frames=3, cabac=True)
        codec = TPUAVCCodec(p, intra_period=0, search_range=8, n_slices=9,
                            bframes=3, hierarchical=True)
        codec.encode_sequence(frames[:5])          # compile both graphs
        t0 = time.time()
        resb, stb = codec.encode_sequence(frames)
        out["avc_cif_hierb_cabac_fps"] = round(len(frames) /
                                               (time.time() - t0), 3)
        out["avc_cif_hierb_psnr_y"] = round(
            sum(r.psnr_y for r in resb) / len(resb), 2)
    except Exception as e:
        out["avc_cif_hierb_cabac_fps"] = None
        out["avc_hierb_error"] = f"{type(e).__name__}: {str(e)[:120]}"
    emit()
    # conformant path at HD (BASELINE.json metric: 1080p fps/chip at
    # BD-rate-qualified quality; see BDRATE_r04 for the quality side)
    for name, (H, W, ns, nt) in (("avc_720p", (720, 1280, 15, 3)),
                                 ("avc_1080p", (1088, 1920, 17, 3))):
        try:
            fps, psnr, kbps = bench_avc(n_timed=nt, H=H, W=W, n_slices=ns)
            out[f"{name}_fps"] = round(fps, 3)
            out[f"{name}_psnr_y"] = round(psnr, 2)
            out[f"{name}_kbps"] = round(kbps, 0)
        except Exception as e:
            out[f"{name}_fps"] = None
            out[f"{name}_error"] = type(e).__name__
        emit()
    # honest anchor: JM 18.5 measured on THIS host, same settings as the
    # avc_* rows above (VERDICT r4: the 2008 log.dat anchor flatters)
    try:
        jm = bench_jm_host()
        if jm is not None:
            cif_fps, hd_fps = jm
            out["jm_host_cif_fps"] = round(cif_fps, 3) if cif_fps else None
            out["jm_host_1080p_fps"] = round(hd_fps, 3) if hd_fps else None
            if hd_fps and out.get("avc_1080p_fps"):
                out["avc_vs_jm_host"] = round(
                    out["avc_1080p_fps"] / hd_fps, 2)
    except Exception as e:
        out["jm_host_error"] = type(e).__name__
    emit()
    try:
        out["stages_1080p_s"] = bench_avc_stages()
    except Exception as e:
        out["stages_error"] = f"{type(e).__name__}: {str(e)[:100]}"
    emit()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
