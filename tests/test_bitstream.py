"""Bit-exact encode->decode round-trip tests (SURVEY §4 strategy (a))."""

import numpy as np
import pytest

from h264tpu.entropy.bitio import BitWriter, BitReader
from h264tpu.entropy import fractal_syntax as FS
from h264tpu.utils.config import CodecConfig, FractalConfig
from h264tpu.models.fractal_codec import FractalCodec, FractalDecoder


def test_bitio_roundtrip(rng):
    w = BitWriter()
    fixed = rng.integers(0, 16, 100)
    ues = rng.integers(0, 1000, 200)
    ses = rng.integers(-500, 500, 200)
    w.u(fixed, 4)
    w.ue(ues)
    w.se(ses)
    w.u(1, 1)
    data = w.to_bytes()
    r = BitReader(data)
    np.testing.assert_array_equal(r.u_array(100, 4), fixed)
    np.testing.assert_array_equal(r.ue_array(200), ues)
    np.testing.assert_array_equal(r.se_array(200), ses)
    assert r.u(1) == 1


def test_ue_known_codes():
    w = BitWriter()
    w.ue([0, 1, 2, 3, 4])
    # 1, 010, 011, 00100, 00101 -> bits: 1 010 011 00100 00101
    bits = np.unpackbits(np.frombuffer(w.to_bytes(), np.uint8))
    want = [1, 0,1,0, 0,1,1, 0,0,1,0,0, 0,0,1,0,1]
    np.testing.assert_array_equal(bits[:len(want)], want)


def test_coeff_set_roundtrip(rng):
    zz = rng.integers(-5, 6, size=(50, 16))
    # make it sparse like real levels
    zz = np.where(rng.random((50, 16)) < 0.8, 0, zz)
    w = BitWriter()
    FS.write_coeff_set(w, zz)
    r = BitReader(w.to_bytes())
    back = FS.read_coeff_set(r, 50)
    np.testing.assert_array_equal(back, zz)


def test_tree_roundtrip(rng):
    """Serialize a synthetic legal leaf-map set and parse it back."""
    Hp, Wp, SR = 32, 32, 7
    cy, cx = Hp // 4, Wp // 4
    # build a legal shape map: MB0 whole, MB1 split to 8x8, MB2 split to 8x4
    # halves in one 8x8 + 4x4 in another, MB3 4x8
    shape = np.zeros((cy, cx), dtype=np.int64)
    shape[0:4, 4:8] = 1                       # MB (0,1): all four 8x8 leaves
    shape[4:8, 0:4] = 2                       # MB (1,0): all 8x4 halves
    shape[4:8, 4:6] = 3                       # MB (1,1): left 8x8s as 4x8
    shape[4:8, 6:8] = 4                       # right 8x8s as 4x4
    maps = dict(shape=shape)
    for name, lo, hi in (("a", -235, 400), ("beta", -60, 255),
                         ("dx", -SR, SR), ("dy", -SR, SR), ("ref", 0, 3)):
        vals = rng.integers(lo, hi + 1, size=(cy, cx)).astype(np.int64)
        if name == "a":
            vals = (vals // 5) * 5
        if name == "beta":
            vals = (vals // 5) * 5
        maps[name] = vals
    # params must be constant within each leaf: enforce by taking corner value
    from h264tpu.ops.fractal import SHAPES
    for code, (bh, bw) in enumerate(SHAPES):
        ch, cw = bh // 4, bw // 4
        for name in ("a", "beta", "dx", "dy", "ref"):
            v = maps[name]
            corner = v[::ch, ::cw]
            up = np.repeat(np.repeat(corner, ch, 0), cw, 1)
            maps[name] = np.where(shape == code, up, v)

    w = BitWriter()
    FS.write_tree(w, maps, SR, use_halfpel=True)
    r = BitReader(w.to_bytes())
    back = FS.read_tree(r, Hp, Wp, SR, use_halfpel=True)
    np.testing.assert_array_equal(back["shape"], maps["shape"])
    for name in ("a", "beta", "dx", "dy", "ref"):
        np.testing.assert_array_equal(back[name], maps[name], err_msg=name)


def test_sequence_roundtrip_bit_exact(foreman_qcif):
    """Decode-what-you-encode: decoder output == encoder reconstruction."""
    cfg = CodecConfig(width=176, height=144, qp=28, intra_period=12,
                      fractal=FractalConfig(search_range=4))
    codec = FractalCodec(cfg)
    frames = [foreman_qcif.read(i % len(foreman_qcif)) for i in range(4)]
    results, stream = codec.encode_sequence(frames)
    assert len(stream) > 100

    dec = FractalDecoder()
    decoded = dec.decode(stream)
    assert len(decoded) == len(results)
    for i, (res, dyuv) in enumerate(zip(results, decoded)):
        for p in range(3):
            np.testing.assert_array_equal(
                dyuv[p], res.recon[p],
                err_msg=f"frame {i} plane {p} decoder mismatch")


def test_bitrate_reported(foreman_qcif):
    cfg = CodecConfig(width=176, height=144, qp=36, intra_period=0,
                      fractal=FractalConfig(search_range=4))
    codec = FractalCodec(cfg)
    frames = [foreman_qcif.read(i % len(foreman_qcif)) for i in range(3)]
    results, stream = codec.encode_sequence(frames)
    # P frames must be much cheaper than the I frame
    assert results[1].bits < results[0].bits
    assert results[0].bits > 1000
