"""Tests for the legacy capability surface: canonical Huffman layer,
JPEG-like still-image I codec (F22), per-frame Huffman fractal stream (F23)."""

import numpy as np
import pytest

from h264tpu.entropy import huffman as HUF
from h264tpu.entropy.bitio import BitReader, BitWriter


def test_huffman_roundtrip_random(rng):
    freqs = rng.integers(0, 1000, size=50)
    freqs[rng.integers(0, 50, size=10)] = 0
    present = np.nonzero(freqs > 0)[0]
    syms = rng.choice(present, size=400)
    lens = HUF.code_lengths(freqs)
    # Kraft inequality: valid prefix code
    assert sum(2.0 ** -l for l in lens if l > 0) <= 1.0 + 1e-12
    w = BitWriter()
    HUF.write_codebook(w, lens)
    HUF.encode_symbols(w, syms, lens)
    r = BitReader(w.to_bytes())
    lens2 = HUF.read_codebook(r)
    np.testing.assert_array_equal(lens2, lens)
    out = HUF.decode_symbols(r, lens2, len(syms))
    np.testing.assert_array_equal(out, syms)


def test_huffman_beats_fixed_width(rng):
    """Skewed histogram must compress below the fixed-width cost."""
    syms = np.minimum(rng.geometric(0.5, size=2000) - 1, 31)
    lens = HUF.code_lengths(np.bincount(syms, minlength=32))
    bits = int(lens[syms].sum())
    assert bits < 2000 * 5


def test_huffman_single_symbol():
    lens = HUF.code_lengths(np.array([0, 7, 0]))
    assert lens[1] == 1 and lens[0] == 0 and lens[2] == 0
    w = BitWriter()
    HUF.encode_symbols(w, np.full(9, 1), lens)
    r = BitReader(w.to_bytes())
    np.testing.assert_array_equal(HUF.decode_symbols(r, lens, 9), np.full(9, 1))


# ---------------------------------------------------------------------------
# F22: JPEG-like still-image codec
# ---------------------------------------------------------------------------

def test_legacy_icodec_roundtrip(foreman_qcif):
    from h264tpu.models import legacy_icodec as LIC
    y, u, v = foreman_qcif.read(0)
    stream = LIC.encode_image(y, u, v, quality=75)
    dy, du, dv = LIC.decode_image(stream)
    assert dy.shape == y.shape and du.shape == u.shape
    for org, dec in ((y, dy), (u, du), (v, dv)):
        mse = np.mean((org.astype(float) - dec.astype(float)) ** 2)
        psnr = 10 * np.log10(255**2 / max(mse, 1e-9))
        assert psnr > 30.0, psnr
    # decode must be deterministic/bit-faithful to the same stream
    dy2, _, _ = LIC.decode_image(stream)
    np.testing.assert_array_equal(dy, dy2)


def test_legacy_icodec_quality_monotone(foreman_qcif):
    from h264tpu.models import legacy_icodec as LIC
    y, u, v = foreman_qcif.read(0)
    sizes, psnrs = [], []
    for q in (20, 50, 90):
        s = LIC.encode_image(y, u, v, quality=q)
        dy, _, _ = LIC.decode_image(s)
        sizes.append(len(s))
        psnrs.append(10 * np.log10(
            255**2 / np.mean((y.astype(float) - dy.astype(float)) ** 2)))
    assert sizes[0] < sizes[1] < sizes[2]
    assert psnrs[0] < psnrs[1] < psnrs[2]


def test_legacy_icodec_quality_scaling_table():
    from h264tpu.models.legacy_icodec import scaled_qtable, STD_LUMA_QT
    # q=50 -> identity of the base table; clamps at extremes
    np.testing.assert_array_equal(scaled_qtable(STD_LUMA_QT, 50), STD_LUMA_QT)
    assert scaled_qtable(STD_LUMA_QT, 100).min() == 1
    assert scaled_qtable(STD_LUMA_QT, 1).max() == 255


def test_legacy_icodec_flat_plane():
    from h264tpu.models import legacy_icodec as LIC
    y = np.full((64, 64), 128, np.uint8)
    u = np.full((32, 32), 0, np.uint8)
    v = np.full((32, 32), 255, np.uint8)
    dy, du, dv = LIC.decode_image(LIC.encode_image(y, u, v, quality=75))
    np.testing.assert_array_equal(dy, y)
    assert du.max() <= 3 and int(dv.min()) >= 252  # DC-only, near-exact


# ---------------------------------------------------------------------------
# F23: per-frame Huffman fractal codestream
# ---------------------------------------------------------------------------

def test_fractal_huffman_roundtrip(foreman_qcif):
    import jax.numpy as jnp
    from h264tpu.ops import fractal as F
    from h264tpu.entropy import fractal_huffman as FH
    y0 = foreman_qcif.read(0)[0].astype(np.int32)
    y1 = foreman_qcif.read(1)[0].astype(np.int32)
    H, W = 144, 176
    tree = F.search_plane(jnp.asarray(y1), jnp.asarray(y0), search_range=4,
                          tol16=10.5, tol8=8.0)
    maps = {k: np.asarray(v) for k, v in F.leaf_maps(tree, H, W).items()}
    data = FH.encode_maps(maps, search_range=4)
    out = FH.decode_maps(data, H, W, search_range=4)
    for k in ("shape", "a", "beta", "dx", "dy", "ref"):
        np.testing.assert_array_equal(out[k], maps[k], err_msg=k)
    # stream must be materially smaller than raw fixed-width coding
    raw_bits = maps["shape"].size * (7 + 6 + 4 + 4 + 3)
    assert len(data) * 8 < raw_bits
