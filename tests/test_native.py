"""Native (C++) bit machinery vs pure-Python reference paths."""

import numpy as np
import pytest

from h264tpu.entropy import native, cavlc as C
from h264tpu.entropy.bitio import BitWriter, BitReader
from h264tpu.entropy import fractal_syntax as FS


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_native_cavlc_matches_python(rng):
    cy, cx = 12, 16
    for density, mag in ((0.1, 3), (0.4, 20), (0.9, 400)):
        zz = rng.integers(-mag, mag + 1, size=(cy * cx, 16))
        zz = np.where(rng.random(zz.shape) < 1 - density, 0, zz)
        w = BitWriter()
        C.encode_plane(zz, cy, cx, w)
        w.u(1, 1)  # trailing marker to check exact bit position
        data = w.to_bytes()

        r_py = BitReader(data)
        zz_py = C.decode_plane(r_py, cy, cx)
        zz_nat, pos = native.cavlc_decode_plane(data, len(data) * 8, 0, cy, cx)
        np.testing.assert_array_equal(zz_nat, zz_py)
        np.testing.assert_array_equal(zz_nat, zz)
        assert pos == r_py.pos


def test_native_modes_match_python(rng):
    cy, cx = 9, 13
    modes = rng.integers(0, 9, size=(cy, cx)).astype(np.int64)
    w = BitWriter()
    FS.write_intra_modes(w, modes)
    data = w.to_bytes()
    back = FS.read_intra_modes(BitReader(data), cy, cx)  # uses native
    np.testing.assert_array_equal(back, modes)


def test_decoder_uses_native_speed(foreman_qcif):
    """Full-pipeline decode must stay bit-exact with native decode active."""
    from h264tpu.utils.config import CodecConfig, FractalConfig
    from h264tpu.models.fractal_codec import FractalCodec, FractalDecoder
    cfg = CodecConfig(width=176, height=144, qp=30, intra_period=0,
                      fractal=FractalConfig(search_range=3))
    codec = FractalCodec(cfg)
    frames = [foreman_qcif.read(i % 3) for i in range(3)]
    results, stream = codec.encode_sequence(frames)
    decoded = FractalDecoder().decode(stream)
    for i, res in enumerate(results):
        for p in range(3):
            np.testing.assert_array_equal(decoded[i][p], res.recon[p])
