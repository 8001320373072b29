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


def test_side_views_search_own_previous_frame(rng):
    """F25 fidelity: side views search BOTH their own previous recon
    (planes 0-3) and the center's current recon (planes 4-7), with the
    3-bit reference signaled per leaf — and the dual-ref stream round-trips
    bit-exactly (reference chain FR/src/block_enc.c:560-830)."""
    import numpy as np
    from h264tpu.utils.config import CodecConfig, FractalConfig
    from h264tpu.models.fractal_codec import FractalCodec, FractalDecoder

    H, W = 64, 64
    rng2 = np.random.default_rng(7)

    def mk_frame(base, shift):
        y = np.roll(base, shift, axis=1)
        u = rng2.integers(0, 255, (H // 2, W // 2)).astype(np.uint8)
        v = rng2.integers(0, 255, (H // 2, W // 2)).astype(np.uint8)
        return (y, u, v)

    base_c = rng2.integers(0, 255, (H, W)).astype(np.uint8)
    # side view content follows its OWN temporal motion, very unlike the
    # center view -> the own-prev reference must win for many blocks
    base_s = rng2.integers(0, 255, (H, W)).astype(np.uint8)
    center = [mk_frame(base_c, i) for i in range(3)]
    right = [mk_frame(base_s, i * 2) for i in range(3)]
    left = [mk_frame(base_s.T.copy(), i) for i in range(3)]

    cfg = CodecConfig(width=W, height=H, qp=30, intra_period=0, views=3,
                      deblock=False, fractal=FractalConfig(search_range=3))
    codec = FractalCodec(cfg)
    results, stream = codec.encode_sequence_views([center, right, left])

    # side-view P frames must pick own-prev planes (ref < 4) predominantly
    # for content that only matches its own temporal predecessor
    dec = FractalDecoder()
    recons = dec.decode(stream)
    for vi in range(3):
        for res, fr in zip(results[vi], recons[vi]):
            for a, b in zip(res.recon, fr):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
