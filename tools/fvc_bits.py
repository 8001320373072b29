"""FVC rate audit: where do the fractal-mode bits go?

Round-4 verdict item 5: the fractal differentiator measured +267%
BD-rate vs JM with no syntax-level explanation.  This tool encodes a
sequence with the FVC path, then splits every P frame's payload into
per-element bits (quadtree split flags / b8 modes / ref / mv / alpha /
beta / residual) by replaying the tree writer section-by-section from
the decoded maps.  Prints one JSON line.

Usage: python tools/fvc_bits.py [n_frames] [qp]
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from h264tpu.entropy.bitio import BitWriter, BitReader
from h264tpu.entropy import fractal_syntax as FS


def tree_section_bits(maps, sr, ref_bits):
    """Per-element bit counts of one plane's tree (mirrors
    FS.write_tree's layout exactly)."""
    shape = np.asarray(maps["shape"])
    mb_split = shape[::4, ::4] != 0
    counts = dict(split=mb_split.size, modes=8 * int(mb_split.sum()),
                  ref=0, mv=0, alpha=0, beta=0)
    mvb = FS._mv_bits(sr)

    def se_bits(vals):
        w = BitWriter()
        if np.size(vals):
            w.se(np.asarray(vals))
        return w.bit_length()

    for code in range(len(FS.SHAPES)):
        m = FS._leaf_corner_mask(shape, code)
        n = int(m.sum())
        if n == 0:
            continue
        counts["ref"] += n * ref_bits
        dxs = np.asarray(maps["dx"])[m] + sr
        dys = np.asarray(maps["dy"])[m] + sr
        ai = (np.asarray(maps["a"])[m] + 235) // 5
        bi = (np.asarray(maps["beta"])[m] + 60) // 5
        counts["mv"] += 2 * mvb + se_bits(np.diff(dxs)) \
            + se_bits(np.diff(dys))
        counts["alpha"] += 7 + se_bits(np.diff(ai))
        counts["beta"] += 6 + se_bits(np.diff(bi))
    return counts


def audit(frames, qp, sr=7):
    from h264tpu.utils.config import CodecConfig, FractalConfig
    from h264tpu.models.fractal_codec import FractalCodec
    H, W = frames[0][0].shape
    cfg = CodecConfig(width=W, height=H, qp=qp, intra_period=0,
                      fractal=FractalConfig(search_range=sr))
    codec = FractalCodec(cfg)
    res, stream = codec.encode_sequence(frames)

    # replay the container: header, then per-frame payloads
    r = BitReader(stream)
    hdr = FS.read_header(r)
    r.byte_align()
    halfpel = bool(hdr.get("use_halfpel", cfg.fractal.use_halfpel_refs))
    rb = 2 if halfpel else 0
    tot = dict(split=0, modes=0, ref=0, mv=0, alpha=0, beta=0,
               residual=0, intra_frames=0, frame_hdr=0)
    n_p = 0
    for res_i in res:
        p0 = r.pos
        kind = r.u(8)
        qpf = r.u(8)  # noqa: F841
        tot["frame_hdr"] += 16
        ph, pw = H, W
        for i, (hh, ww) in enumerate(((H, W), (H // 2, W // 2),
                                      (H // 2, W // 2))):
            if kind == 0:
                FS.read_intra_modes(r, hh // 4, ww // 4)
            elif kind == 1:
                t0 = r.pos
                maps = FS.read_tree(r, hh, ww, sr, halfpel, ref_bits=rb
                                    if rb else None)
                sec = tree_section_bits(maps, sr, rb)
                used = r.pos - t0
                acc = sum(sec.values())
                assert used == acc, (used, acc)
                for k, v in sec.items():
                    tot[k] += v
            rstart = r.pos
            FS.read_residual(r, hh // 4, ww // 4, int(cfg.entropy))
            tot["residual"] += r.pos - rstart
        if kind == 0:
            tot["intra_frames"] += r.pos - p0 - 16
        else:
            n_p += 1
        r.byte_align()
    total_bits = len(stream) * 8
    mean_psnr = float(np.mean([x.psnr_y for x in res]))
    return dict(qp=qp, frames=len(res), p_frames=n_p,
                total_bits=total_bits, psnr_y=round(mean_psnr, 2),
                **{k: int(v) for k, v in tot.items()})


def main():
    from bdrate import seq_foreman_tiled
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    qps = ([int(sys.argv[2])] if len(sys.argv) > 2 else [24, 28, 32, 36])
    frames = seq_foreman_tiled(n)
    out = {"seq": "foreman_tiled", "per_qp": []}
    for qp in qps:
        row = audit(frames, qp)
        out["per_qp"].append(row)
        print(f"QP {qp}: total {row['total_bits']} psnr {row['psnr_y']} | "
              + " ".join(f"{k}={row[k]}" for k in
                         ("split", "modes", "ref", "mv", "alpha", "beta",
                          "residual", "intra_frames")),
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
