"""Per-syntax-element bit budget: ours vs JM on the same content.

Encodes one bdrate sequence with both encoders at one QP, decodes both
streams with AVCDecoder(trace=True), and prints each element's share so
the BD-rate gap can be attributed to specific syntax (the round-5 gap
analysis found ~1.8x more motion partitions than JM on low-motion
content; this tool measures where those bits land).

Usage: python tools/syntax_gap.py [qp] [n_frames] [seq]
"""

import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bdrate import (seq_foreman_tiled, seq_pan_mosaic, seq_motion_mix,
                    run_jm, W, H, psnr)  # noqa: E402

SEQS = {"foreman_tiled": seq_foreman_tiled, "pan_mosaic": seq_pan_mosaic,
        "motion_mix": seq_motion_mix}


def stats_of(stream):
    from h264tpu.avc.slice_dec import AVCDecoder
    d = AVCDecoder(trace=True)
    d.decode(stream)
    return d.bit_statistics()


def main():
    qp = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    seq = sys.argv[3] if len(sys.argv) > 3 else "foreman_tiled"
    frames = SEQS[seq](n)

    from h264tpu.avc.params import AVCParams
    from h264tpu.avc.tpu_codec import TPUAVCCodec
    p = AVCParams(width=W, height=H, qp=qp, num_ref_frames=1,
                  profile_idc=100, transform_8x8=True)
    codec = TPUAVCCodec(p, intra_period=0, search_range=8, n_slices=3)
    res, ours = codec.encode_sequence(frames)
    py = np.mean([psnr(f[0], r.recon[0]) for f, r in zip(frames, res)])

    with tempfile.TemporaryDirectory() as tmp:
        jm_bits, jm_py = run_jm(frames, qp, tmp, seq)
        jm_stream = open(os.path.join(tmp, f"jm{seq}{qp}.264"), "rb").read()

    st_o = stats_of(ours)
    st_j = stats_of(jm_stream)
    tot_o = len(ours) * 8
    tot_j = len(jm_stream) * 8
    print(f"\n{seq} qp{qp} n{n}: ours {tot_o} bits @ {py:.2f} dB | "
          f"JM {tot_j} bits @ {jm_py:.2f} dB | ratio {tot_o/tot_j:.3f}")
    keys = sorted(set(st_o) | set(st_j),
                  key=lambda k: -(st_o.get(k, (0, 0))[1]))
    print(f"{'element':<34}{'ours_n':>8}{'ours_bits':>11}{'jm_n':>8}"
          f"{'jm_bits':>10}{'d_bits':>9}")
    for k in keys:
        co, bo = st_o.get(k, (0, 0))
        cj, bj = st_j.get(k, (0, 0))
        print(f"{k:<34}{co:>8}{bo:>11}{cj:>8}{bj:>10}{bo-bj:>9}")


if __name__ == "__main__":
    main()
