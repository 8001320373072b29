"""CABAC (M-coder) tests: round-trip, native/python cross-check, codec E2E."""

import numpy as np
import pytest

from h264tpu.entropy import cabac_eng as C
from h264tpu.entropy import native
from h264tpu.entropy.bitio import BitWriter, BitReader
from h264tpu.entropy import fractal_syntax as FS


def _random_zz(rng, nblocks, density=0.3, big=0.03):
    mask = rng.random((nblocks, 16)) < density
    vals = rng.integers(-3, 4, (nblocks, 16))
    bigmask = rng.random((nblocks, 16)) < big
    vals = np.where(bigmask, rng.integers(-2000, 2000, (nblocks, 16)), vals)
    return np.where(mask & (vals != 0), vals, 0).astype(np.int64)


def test_python_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(10):
        cy, cx = int(rng.integers(1, 10)), int(rng.integers(1, 10))
        zz = _random_zz(rng, cy * cx, density=float(rng.uniform(0.05, 0.6)))
        out = C.decode_plane(C.encode_plane(zz, cy, cx), cy, cx)
        assert (out == zz).all()


def test_edge_cases():
    # all-zero, dense, single coeff at scan pos 15, max magnitudes
    for zz in (np.zeros((9, 16), np.int64),
               np.full((4, 16), -7, np.int64)):
        n = zz.shape[0]
        cy = int(np.sqrt(n))
        out = C.decode_plane(C.encode_plane(zz, cy, n // cy), cy, n // cy)
        assert (out == zz).all()
    zz = np.zeros((1, 16), np.int64)
    zz[0, 15] = -1
    assert (C.decode_plane(C.encode_plane(zz, 1, 1), 1, 1) == zz).all()
    zz[0, 15] = 30000
    assert (C.decode_plane(C.encode_plane(zz, 1, 1), 1, 1) == zz).all()


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_bit_exact():
    rng = np.random.default_rng(1)
    for _ in range(10):
        cy, cx = int(rng.integers(1, 16)), int(rng.integers(1, 16))
        zz = _random_zz(rng, cy * cx)
        py_bytes = C.encode_plane(zz, cy, cx)
        assert py_bytes == native.cabac_encode_plane(zz, cy, cx)
        assert (native.cabac_decode_plane(py_bytes, cy, cx) == zz).all()


def test_stream_framing():
    """CABAC payloads embed in the FVC stream (byte-aligned, length-prefixed)."""
    rng = np.random.default_rng(2)
    zz = _random_zz(rng, 6 * 7)
    w = BitWriter()
    w.u(5, 3)  # misalign on purpose
    FS.write_residual(w, zz, 6, 7, FS.ENTROPY_CABAC)
    data = w.to_bytes()
    r = BitReader(data)
    assert r.u(3) == 5
    out = FS.read_residual(r, 6, 7, FS.ENTROPY_CABAC)
    assert (out == zz).all()


def test_cabac_beats_cavlc_on_typical_residual():
    from h264tpu.entropy import cavlc
    rng = np.random.default_rng(3)
    zz = _random_zz(rng, 18 * 22, density=0.15, big=0.0)
    w = BitWriter()
    cavlc.encode_plane(zz, 18, 22, w)
    cabac_bits = len(C.encode_plane(zz, 18, 22)) * 8
    assert cabac_bits < w.bit_length()


def test_codec_e2e_cabac():
    from h264tpu.models.fractal_codec import FractalCodec, FractalDecoder
    from h264tpu.utils.config import CodecConfig, EntropyMode
    rng = np.random.default_rng(4)
    H, W = 48, 64
    base = rng.integers(0, 255, (H, W)).astype(np.uint8)
    frames = []
    for t in range(3):
        y = np.roll(base, t, axis=1)
        u = np.full((H // 2, W // 2), 100 + t, np.uint8)
        v = np.full((H // 2, W // 2), 200 - t, np.uint8)
        frames.append((y, u, v))
    cfg = CodecConfig(width=W, height=H, intra_period=0, qp=28,
                      entropy=EntropyMode.CABAC)
    codec = FractalCodec(cfg)
    results, stream = codec.encode_sequence(frames)
    dec = FractalDecoder().decode(stream)
    assert len(dec) == 3
    for res, planes in zip(results, dec):
        for a, b in zip(res.recon, planes):
            assert (np.asarray(a) == np.asarray(b)).all()
