"""CAVLC round-trip and structure tests."""

import numpy as np
import pytest

from h264tpu.entropy import cavlc as C
from h264tpu.entropy.bitio import BitWriter, BitReader


def random_levels(rng, n, density=0.25, mag=8):
    zz = rng.integers(-mag, mag + 1, size=(n, 16))
    zz = np.where(rng.random((n, 16)) < 1 - density, 0, zz)
    # realistic energy compaction: taper high-frequency magnitudes
    zz = (zz * np.maximum(0.2, 1 - np.arange(16) / 16)).astype(np.int64)
    return zz


def test_block_fields(rng):
    zz = np.zeros((2, 16), np.int64)
    zz[0, [0, 2, 3, 7]] = [5, -1, 1, -1]
    total, t1, t1s, levels, runs, tzs = C.block_fields(zz)
    assert total[0] == 4
    assert t1[0] == 3
    # signs coded highest-frequency first: coeffs -1(pos7), +1(pos3), -1(pos2)
    np.testing.assert_array_equal(t1s[0], [1, 0, 1])
    np.testing.assert_array_equal(levels[0, :4], [5, -1, 1, -1])
    np.testing.assert_array_equal(runs[0, :4], [0, 1, 0, 3])
    assert tzs[0] == 4
    assert total[1] == 0


@pytest.mark.parametrize("density,mag", [(0.15, 4), (0.5, 30), (0.9, 300), (0.05, 2)])
def test_roundtrip(rng, density, mag):
    cy, cx = 8, 12
    zz = random_levels(rng, cy * cx, density, mag)
    w = BitWriter()
    C.encode_plane(zz, cy, cx, w)
    data = w.to_bytes()
    r = BitReader(data)
    back = C.decode_plane(r, cy, cx)
    np.testing.assert_array_equal(back, zz)


def test_roundtrip_extreme_levels(rng):
    """Escape-code paths: huge levels."""
    cy, cx = 2, 2
    zz = np.zeros((4, 16), np.int64)
    zz[0, :4] = [2000, -500, 17, -16]
    zz[1, 0] = 1
    zz[2, :16] = rng.integers(-2, 3, 16)
    zz[2, zz[2] == 0] = 1          # full block, no zeros
    w = BitWriter()
    C.encode_plane(zz, cy, cx, w)
    back = C.decode_plane(BitReader(w.to_bytes()), cy, cx)
    np.testing.assert_array_equal(back, zz)


def test_cavlc_beats_expgolomb(rng):
    """CAVLC must compress typical residual levels better than the interim
    Exp-Golomb coeff-set coding."""
    from h264tpu.entropy import fractal_syntax as FS
    cy, cx = 16, 16
    zz = random_levels(rng, cy * cx, 0.15, 4)
    w1 = BitWriter()
    C.encode_plane(zz, cy, cx, w1)
    w2 = BitWriter()
    FS.write_coeff_set(w2, zz)
    assert w1.bit_length() < w2.bit_length(), (w1.bit_length(), w2.bit_length())
