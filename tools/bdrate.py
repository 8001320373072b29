"""BD-rate harness: our TPU H.264 encoder vs JM 18.5 lencod.

Encodes the same frames with both encoders over a QP sweep, computes
Bjontegaard delta-rate/delta-PSNR (cubic fit over log-bitrate, the
standard VCEG-M33 method), and prints one JSON line + a table.

Input: the real foreman QCIF frames shipped with the reference, tiled to
CIF with per-frame shifts for motion (the same pinned set bench.py uses;
the reference ships no full CIF sequence).  The JM anchor runs lencod
from the reference checkout with matched tools (IPPP, full search, one
reference, CAVLC, fixed QP).

Usage: python tools/bdrate.py [n_frames] (default 12; runs on the default
JAX platform — the TPU when available).
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


def make_frames(n):
    from h264tpu.utils.yuv import YUVReader
    path = os.path.join("/root/reference", "4.对比程序", "jm18.5", "JM",
                        "bin", "foreman_part_qcif.yuv")
    r = YUVReader(path, 176, 144)
    base = [r.read(i) for i in range(len(r))]
    out = []
    for i in range(n):
        y, u, v = base[i % len(base)]
        s = i % 3
        out.append((np.roll(np.tile(y, (2, 2)), (s, -s), (0, 1)),
                    np.roll(np.tile(u, (2, 2)), (s, -s), (0, 1)),
                    np.roll(np.tile(v, (2, 2)), (s, -s), (0, 1))))
    return out


def psnr(a, b):
    mse = ((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2).mean()
    return 10 * np.log10(255.0 ** 2 / mse) if mse else 99.0


def run_ours(frames, qp, sr=8, n_slices=9):
    from h264tpu.avc.params import AVCParams
    from h264tpu.avc.tpu_codec import TPUAVCCodec
    p = AVCParams(width=W, height=H, qp=qp, num_ref_frames=1)
    codec = TPUAVCCodec(p, intra_period=0, search_range=sr,
                        n_slices=n_slices)
    res, stream = codec.encode_sequence(frames)
    py = np.mean([psnr(f[0], r.recon[0]) for f, r in zip(frames, res)])
    return len(stream) * 8, float(py)


def run_jm(frames, qp, tmp, sr=8):
    raw = bytearray()
    for y, u, v in frames:
        raw += y.astype(np.uint8).tobytes()
        raw += u.astype(np.uint8).tobytes()
        raw += v.astype(np.uint8).tobytes()
    src = os.path.join(tmp, "in.yuv")
    open(src, "wb").write(bytes(raw))
    out264 = os.path.join(tmp, f"jm{qp}.264")
    rec = os.path.join(tmp, f"jmrec{qp}.yuv")
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
        capture_output=True, text=True, cwd=tmp, timeout=1800)
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    frames = make_frames(n)
    ours_r, ours_p, jm_r, jm_p = [], [], [], []
    with tempfile.TemporaryDirectory() as tmp:
        for qp in QPS:
            b, p = run_ours(frames, qp)
            ours_r.append(b)
            ours_p.append(p)
            bj, pj = run_jm(frames, qp, tmp)
            jm_r.append(bj)
            jm_p.append(pj)
            print(f"QP {qp}: ours {b:8d} bits {p:6.2f} dB | "
                  f"JM {bj:8d} bits {pj:6.2f} dB", file=sys.stderr)
    bdr = bd_rate(jm_r, jm_p, ours_r, ours_p)
    bdp = bd_psnr(jm_r, jm_p, ours_r, ours_p)
    print(json.dumps({
        "metric": "bd_rate_vs_jm185_pct", "value": round(float(bdr), 2),
        "bd_psnr_db": round(float(bdp), 3), "frames": n,
        "qps": list(QPS),
        "ours_bits": ours_r, "ours_psnr": [round(x, 2) for x in ours_p],
        "jm_bits": jm_r, "jm_psnr": [round(x, 2) for x in jm_p]}))


if __name__ == "__main__":
    main()
