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
    print(json.dumps(out))


if __name__ == "__main__":
    main()
