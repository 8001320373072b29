"""Classic H.264-style inter path (ME/MC) tests."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from h264tpu.ops import me as ME


def oracle_sixtap(p, y2, x2):
    """Scalar quarter-pel value at half-unit coords (y2, x2 in 1/4 pel) for
    spot-checking: only used at integer and pure half positions."""
    H, W = p.shape

    def at(y, x):
        return int(p[min(max(y, 0), H - 1), min(max(x, 0), W - 1)])

    def tap_h(y, x):  # horizontal half-pel between x and x+1
        s = (at(y, x - 2) - 5 * at(y, x - 1) + 20 * at(y, x) + 20 * at(y, x + 1)
             - 5 * at(y, x + 2) + at(y, x + 3))
        return min(255, max(0, (s + 16) >> 5))

    def tap_v(y, x):
        s = (at(y - 2, x) - 5 * at(y - 1, x) + 20 * at(y, x) + 20 * at(y + 1, x)
             - 5 * at(y + 2, x) + at(y + 3, x))
        return min(255, max(0, (s + 16) >> 5))

    fy, fx = y2 % 4, x2 % 4
    y, x = y2 // 4, x2 // 4
    if fy == 0 and fx == 0:
        return at(y, x)
    if fy == 0 and fx == 2:
        return tap_h(y, x)
    if fy == 2 and fx == 0:
        return tap_v(y, x)
    raise ValueError


def test_halfpel_matches_sixtap(rng):
    p = rng.integers(0, 256, (24, 32)).astype(np.int32)
    up = np.asarray(ME.sixtap_halfpel(jnp.asarray(p)))
    for (y, x) in [(5, 7), (0, 0), (23, 31), (10, 3)]:
        assert up[4 * y, 4 * x] == p[y, x]
        assert up[4 * y, 4 * x + 2] == oracle_sixtap(p, 4 * y, 4 * x + 2)
        assert up[4 * y + 2, 4 * x] == oracle_sixtap(p, 4 * y + 2, 4 * x)


def test_full_search_finds_known_shift(rng):
    H, W = 64, 64
    ref = rng.integers(0, 256, (H, W)).astype(np.int32)
    # org = ref shifted by (+3, -2): block content moved down 3, left 2
    org = np.roll(np.roll(ref, 3, axis=0), -2, axis=1)
    me = ME.full_search_int(jnp.asarray(org), jnp.asarray(ref), 16, 7, lam=0)
    # interior blocks must find mv = (dx=-(-2)? ) domain position = block+off:
    # org[y] == ref[y-3] so the matching ref offset is (-3, +2)
    assert int(me.mv_y[1, 1]) == -12 and int(me.mv_x[1, 1]) == 8
    assert int(me.sad[1, 1]) == 0


def test_subpel_refine_finds_half_shift(rng):
    H, W = 32, 32
    base = rng.integers(0, 256, (H, W + 1)).astype(np.int32)
    ref = base[:, :W]
    # org = horizontal half-pel version of ref (6-tap filtered)
    up_full = np.asarray(ME.sixtap_halfpel(jnp.asarray(ref)))
    org = up_full[0::4, 2::4]
    me0 = ME.full_search_int(jnp.asarray(org), jnp.asarray(ref), 16, 2, lam=0)
    me1 = ME.subpel_refine(jnp.asarray(org), jnp.asarray(up_full), me0, 16, lam=0)
    assert int(me1.mv_x[0, 0]) == 2 and int(me1.mv_y[0, 0]) == 0
    assert int(me1.sad[0, 0]) == 0


def test_classic_codec_roundtrip(foreman_qcif):
    from h264tpu.utils.config import CodecConfig
    from h264tpu.models.fractal_codec import FractalCodec, FractalDecoder
    cfg = CodecConfig(width=176, height=144, qp=28, intra_period=0,
                      inter_mode="classic", me_search_range=8)
    codec = FractalCodec(cfg)
    frames = [foreman_qcif.read(i % 3) for i in range(4)]
    results, stream = codec.encode_sequence(frames)
    assert results[1].frame_type == "P"
    for res in results[1:]:
        assert res.psnr_y > 33.0, res.psnr_y
    decoded = FractalDecoder().decode(stream)
    for i, res in enumerate(results):
        for p in range(3):
            np.testing.assert_array_equal(decoded[i][p], res.recon[p],
                                          err_msg=f"frame {i} plane {p}")
