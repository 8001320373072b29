"""BD-rate harness: our encoders vs JM 18.5 lencod, multi-sequence.

Encodes the same frames with our encoders and the JM 18.5 anchor over a
QP sweep, computes Bjontegaard delta-rate/delta-PSNR per sequence (cubic
fit over log-bitrate, VCEG-M33), and prints one JSON line + a table.

Sequences (CIF; the reference ships only 3 QCIF foreman frames, so the
longer sequences are synthesized deterministically from them):

* ``foreman_tiled`` — 2x2-tiled foreman with a smooth global-shift
  camera trajectory (cycling source frames).
* ``pan_mosaic``   — camera pan over a 704x576 mosaic; new content
  enters the frame every step (no artificial self-similarity).
* ``motion_mix``   — tiled foreman plus two moving high-contrast
  texture patches and a static noise-texture band (occlusion stress).

Paths measured:

* AVC — :class:`h264tpu.avc.tpu_codec.TPUAVCCodec` (IPPP, CAVLC,
  full-RD mode decision, n_slices=3) vs ``lencod`` encoder_baseline
  RDOptimization=1 with matched tools.  North star: match JM (<= +5%).
* FVC — :class:`h264tpu.models.fractal_codec.FractalCodec` (the
  thesis's joint fractal+H.264 hybrid) vs the same JM anchor — the
  paper's headline claim (BASELINE.md §A: -50% bitrate at -0.14 dB).

Usage: python tools/bdrate.py [n_frames] [--avc-only|--fvc-only]
(default 30 frames; runs on the default JAX platform — TPU when live).
"""

import json
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

JM_BIN = os.path.join(REPO, ".jm", "JM", "bin")
QPS = (24, 28, 32, 36)
W, H = 352, 288


def _foreman_base():
    from h264tpu.utils.yuv import YUVReader
    path = os.path.join("/root/reference", "4.对比程序", "jm18.5", "JM",
                        "bin", "foreman_part_qcif.yuv")
    r = YUVReader(path, 176, 144)
    return [r.read(i) for i in range(len(r))]


def _tile_cif(yuv):
    y, u, v = yuv
    return (np.tile(y, (2, 2)), np.tile(u, (2, 2)), np.tile(v, (2, 2)))


def seq_foreman_tiled(n):
    base = [_tile_cif(f) for f in _foreman_base()]
    out = []
    for i in range(n):
        y, u, v = base[i % len(base)]
        # smooth global camera trajectory (even shifts keep chroma phase)
        dy = 2 * int(round(2.0 * np.sin(i / 4.0)))
        dx = 2 * int(round(3.0 * np.sin(i / 6.0 + 1.0)))
        out.append((np.roll(y, (dy, dx), (0, 1)),
                    np.roll(u, (dy // 2, dx // 2), (0, 1)),
                    np.roll(v, (dy // 2, dx // 2), (0, 1))))
    return out


def seq_pan_mosaic(n):
    base = [_tile_cif(f) for f in _foreman_base()]
    # 2x2 mosaic of distinct views -> 704x576; pan a CIF window over it
    y = np.block([[base[0][0], base[1][0][:, ::-1]],
                  [base[2][0][::-1, :], base[0][0][::-1, ::-1]]])
    u = np.block([[base[0][1], base[1][1][:, ::-1]],
                  [base[2][1][::-1, :], base[0][1][::-1, ::-1]]])
    v = np.block([[base[0][2], base[1][2][:, ::-1]],
                  [base[2][2][::-1, :], base[0][2][::-1, ::-1]]])
    out = []
    for i in range(n):
        # diagonal pan, 4/2 px per frame, bouncing at the borders
        ox = (6 * i) % (2 * (704 - W))
        oy = (4 * i) % (2 * (576 - H))
        ox = ox if ox < 704 - W else 2 * (704 - W) - ox
        oy = oy if oy < 576 - H else 2 * (576 - H) - oy
        ox &= ~1
        oy &= ~1
        out.append((y[oy:oy + H, ox:ox + W],
                    u[oy // 2:oy // 2 + H // 2, ox // 2:ox // 2 + W // 2],
                    v[oy // 2:oy // 2 + H // 2, ox // 2:ox // 2 + W // 2]))
    return out


def seq_motion_mix(n):
    rng = np.random.default_rng(7)
    base = [_tile_cif(f) for f in _foreman_base()]
    noise = rng.integers(0, 256, (64, W), np.uint8)   # static texture band
    patch = base[1][0][40:88, 40:104].copy()          # 48x64 texture patch
    out = []
    for i in range(n):
        y, u, v = (p.copy() for p in base[i % len(base)])
        y[H - 64:, :] = noise
        # two objects on crossing trajectories (5 px/frame)
        x1 = (20 + 5 * i) % (W - 64)
        y1 = (30 + 3 * i) % (H - 64 - 48)
        x2 = (W - 84 - 5 * i) % (W - 64)
        y2 = (60 + 2 * i) % (H - 64 - 48)
        y[y1:y1 + 48, x1:x1 + 64] = patch
        y[y2:y2 + 48, x2:x2 + 64] = 255 - patch
        out.append((y, u, v))
    return out


SEQS = {"foreman_tiled": seq_foreman_tiled,
        "pan_mosaic": seq_pan_mosaic,
        "motion_mix": seq_motion_mix}


def psnr(a, b):
    mse = ((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2).mean()
    return 10 * np.log10(255.0 ** 2 / mse) if mse else 99.0


def run_ours(frames, qp, sr=8, n_slices=1):
    # n_slices=1 matches the JM anchor (1 slice/picture): the 3-slice
    # parallel config costs ~6-14% bitrate from per-slice context
    # resets (MVP/nC/intra availability) — measured on pan_mosaic
    # qp36: 130536 -> 112816 bits at equal PSNR
    from h264tpu.avc.params import AVCParams
    from h264tpu.avc.tpu_codec import TPUAVCCodec
    # High profile with the per-MB 8x8 transform RD (round-5) and P8x8
    # sub-partitions (round-5 late); the JM anchor stays
    # encoder_baseline RDO=1 with matched tools
    p = AVCParams(width=W, height=H, qp=qp, num_ref_frames=1,
                  profile_idc=100, transform_8x8=True)
    codec = TPUAVCCodec(p, intra_period=0, search_range=sr,
                        n_slices=n_slices, sub8x8=True)
    res, stream = codec.encode_sequence(frames)
    py = np.mean([psnr(f[0], r.recon[0]) for f, r in zip(frames, res)])
    return len(stream) * 8, float(py)


def run_fvc(frames, qp, sr=7):
    """The fractal hybrid path (paper protocol: IPPP after one intra)."""
    from h264tpu.utils.config import CodecConfig, FractalConfig
    from h264tpu.models.fractal_codec import FractalCodec
    cfg = CodecConfig(width=W, height=H, qp=qp, intra_period=0,
                      deblock=True, fractal=FractalConfig(search_range=sr))
    codec = FractalCodec(cfg)
    res, stream = codec.encode_sequence(frames)
    py = np.mean([r.psnr_y for r in res])
    return len(stream) * 8, float(py)


def run_jm(frames, qp, tmp, tag, sr=8):
    raw = bytearray()
    for y, u, v in frames:
        raw += y.astype(np.uint8).tobytes()
        raw += u.astype(np.uint8).tobytes()
        raw += v.astype(np.uint8).tobytes()
    src = os.path.join(tmp, f"in_{tag}.yuv")
    open(src, "wb").write(bytes(raw))
    out264 = os.path.join(tmp, f"jm{tag}{qp}.264")
    rec = os.path.join(tmp, f"jmrec{tag}{qp}.yuv")
    r = subprocess.run(
        [os.path.join(JM_BIN, "lencod.exe"),
         "-d", os.path.join(JM_BIN, "encoder_baseline.cfg"),
         "-p", f"InputFile={src}", "-p", f"FramesToBeEncoded={len(frames)}",
         "-p", f"SourceWidth={W}", "-p", f"SourceHeight={H}",
         "-p", f"OutputWidth={W}", "-p", f"OutputHeight={H}",
         "-p", "IntraPeriod=0", "-p", "IDRPeriod=0",
         "-p", f"QPISlice={qp}", "-p", f"QPPSlice={qp}",
         "-p", "SymbolMode=0", "-p", "OutFileMode=0",
         "-p", f"OutputFile={out264}", "-p", f"ReconFile={rec}",
         "-p", "NumberReferenceFrames=1", "-p", "RDOptimization=1",
         "-p", f"SearchRange={sr}"],
        capture_output=True, text=True, cwd=tmp, timeout=3600)
    assert r.returncode == 0, r.stdout[-800:]
    bits = os.path.getsize(out264) * 8
    dec = np.fromfile(rec, np.uint8)
    n = W * H
    py = np.mean([psnr(frames[i][0],
                       dec[i * n * 3 // 2:i * n * 3 // 2 + n].reshape(H, W))
                  for i in range(len(frames))])
    return bits, float(py)


def bd_rate(r1, p1, r2, p2):
    """Bjontegaard delta-rate of curve 2 vs curve 1 (%; negative =
    curve 2 needs fewer bits at equal PSNR)."""
    lr1, lr2 = np.log(r1), np.log(r2)
    f1 = np.polyfit(p1, lr1, 3)
    f2 = np.polyfit(p2, lr2, 3)
    lo = max(min(p1), min(p2))
    hi = min(max(p1), max(p2))
    x = np.linspace(lo, hi, 100)
    v1 = np.polyval(f1, x).mean()
    v2 = np.polyval(f2, x).mean()
    return (np.exp(v2 - v1) - 1) * 100


def bd_psnr(r1, p1, r2, p2):
    lr1, lr2 = np.log(r1), np.log(r2)
    f1 = np.polyfit(lr1, p1, 3)
    f2 = np.polyfit(lr2, p2, 3)
    lo = max(min(lr1), min(lr2))
    hi = min(max(lr1), max(lr2))
    x = np.linspace(lo, hi, 100)
    return np.polyval(f2, x).mean() - np.polyval(f1, x).mean()


def main():
    args = [a for a in sys.argv[1:]]
    do_avc = "--fvc-only" not in args
    do_fvc = "--avc-only" not in args
    nums = [a for a in args if a.isdigit()]
    n = int(nums[0]) if nums else 30

    per_seq = {}
    fvc_seq = {}
    curves = {}
    with tempfile.TemporaryDirectory() as tmp:
        for name, gen in SEQS.items():
            frames = gen(n)
            jm_r, jm_p = [], []
            our_r, our_p = [], []
            fvc_r, fvc_p = [], []
            for qp in QPS:
                bj, pj = run_jm(frames, qp, tmp, name)
                jm_r.append(bj)
                jm_p.append(pj)
                row = f"{name} QP {qp}: JM {bj:8d} bits {pj:6.2f} dB"
                if do_avc:
                    b, p = run_ours(frames, qp)
                    our_r.append(b)
                    our_p.append(p)
                    row += f" | ours {b:8d} bits {p:6.2f} dB"
                if do_fvc:
                    b, p = run_fvc(frames, qp)
                    fvc_r.append(b)
                    fvc_p.append(p)
                    row += f" | fvc {b:8d} bits {p:6.2f} dB"
                print(row, file=sys.stderr)
            curves[name] = dict(jm_bits=jm_r, jm_psnr=[round(x, 2) for x in jm_p])
            if do_avc:
                per_seq[name] = round(float(bd_rate(jm_r, jm_p, our_r, our_p)), 2)
                curves[name].update(ours_bits=our_r,
                                    ours_psnr=[round(x, 2) for x in our_p])
            if do_fvc:
                fvc_seq[name] = round(float(bd_rate(jm_r, jm_p, fvc_r, fvc_p)), 2)
                curves[name].update(fvc_bits=fvc_r,
                                    fvc_psnr=[round(x, 2) for x in fvc_p])

    out = {"metric": "bd_rate_vs_jm185_pct", "frames": n, "qps": list(QPS)}
    if do_avc:
        out["value"] = round(float(np.mean(list(per_seq.values()))), 2)
        out["per_seq"] = per_seq
    if do_fvc:
        out["fvc_bd_rate_pct"] = round(float(np.mean(list(fvc_seq.values()))), 2)
        out["fvc_per_seq"] = fvc_seq
    out["curves"] = curves
    print(json.dumps(out))


if __name__ == "__main__":
    main()
