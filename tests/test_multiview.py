"""Stereo 3-view coding round-trip (reference capability F25)."""

import numpy as np

from h264tpu.utils.config import CodecConfig, FractalConfig
from h264tpu.models.fractal_codec import FractalCodec, FractalDecoder


def make_views(rng, n_frames, h, w, disparity=4):
    """Synthetic stereo: R and L are horizontally shifted copies of C with a
    bit of noise (like real camera baselines)."""
    views = [[], [], []]
    base = rng.integers(0, 256, (h + 8, w + 16)).astype(np.float64)
    k = np.ones((5, 5)) / 25.0
    from numpy.lib.stride_tricks import sliding_window_view
    sm = sliding_window_view(np.pad(base, 2, mode="edge"), (5, 5))
    base = (sm * k).sum(axis=(2, 3))
    for t in range(n_frames):
        y_c = np.clip(base[t:t + h, 8:8 + w], 0, 255).astype(np.uint8)
        y_r = np.clip(base[t:t + h, 8 - disparity:8 - disparity + w], 0, 255).astype(np.uint8)
        y_l = np.clip(base[t:t + h, 8 + disparity:8 + disparity + w], 0, 255).astype(np.uint8)
        for v, y in zip(views, (y_c, y_r, y_l)):
            u = y[::2, ::2].copy()
            vv = 255 - u
            v.append((y, u, vv))
    return views


def test_three_view_roundtrip(rng):
    h, w = 64, 96
    views = make_views(rng, 3, h, w)
    cfg = CodecConfig(width=w, height=h, qp=30, intra_period=0, views=3,
                      fractal=FractalConfig(search_range=4))
    codec = FractalCodec(cfg)
    results, stream = codec.encode_sequence_views(views)
    assert len(results) == 3 and all(len(r) == 3 for r in results)

    decoded = FractalDecoder().decode(stream)
    assert len(decoded) == 3
    for vi in range(3):
        for fi in range(3):
            for p in range(3):
                np.testing.assert_array_equal(
                    decoded[vi][fi][p], results[vi][fi].recon[p],
                    err_msg=f"view {vi} frame {fi} plane {p}")

    # disparity prediction must work: side-view P frames should be far
    # cheaper than their I frame
    assert results[1][1].bits < results[1][0].bits
    assert results[2][1].bits < results[2][0].bits
