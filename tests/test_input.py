"""Input processing (J15): chroma formats, bit depth, RGB, TIFF."""

import numpy as np
import pytest

from h264tpu.utils import input as IN


REF_BIN = "/root/reference/4.对比程序/jm18.5/JM/bin"


@pytest.mark.parametrize("suffix,chroma", [("", IN.CHROMA_420),
                                           ("_422", IN.CHROMA_422),
                                           ("_444", IN.CHROMA_444)])
def test_reference_yuv_variants_normalize(suffix, chroma):
    """The reference's shipped 4:2:0/4:2:2/4:4:4 foreman stills all
    normalize to the same luma and downsample-consistent chroma."""
    path = f"{REF_BIN}/foreman_part_qcif{suffix}.yuv"
    y, u, v = IN.read_yuv_frame(path, 176, 144, 0, chroma=chroma)
    assert y.shape == (144, 176) and u.shape == (72, 88)
    y0, u0, v0 = IN.read_yuv_frame(f"{REF_BIN}/foreman_part_qcif.yuv",
                                   176, 144, 0)
    assert np.array_equal(y, y0)               # same luma in all variants
    # chroma content agrees closely after downsampling (not exactly:
    # the shipped variants were upsampled by JM's own filters)
    assert np.abs(u.astype(int) - u0.astype(int)).mean() < 4.0


def test_high_bitdepth_rescale(tmp_path):
    rng = np.random.default_rng(0)
    y = rng.integers(0, 1 << 10, (16, 16)).astype("<u2")
    u = rng.integers(0, 1 << 10, (8, 8)).astype("<u2")
    v = rng.integers(0, 1 << 10, (8, 8)).astype("<u2")
    p = tmp_path / "f10.yuv"
    p.write_bytes(y.tobytes() + u.tobytes() + v.tobytes())
    y8, u8, v8 = IN.read_yuv_frame(str(p), 16, 16, 0, bit_depth=10)
    assert np.array_equal(y8, ((y.astype(int) + 2) >> 2).clip(0, 255))


def test_rgb_roundtrip_and_encode():
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, (32, 48, 3)).astype(np.uint8)
    y, u, v = IN.rgb_to_yuv(rgb)
    assert y.shape == (32, 48) and u.shape == (16, 24)
    back = IN.yuv_to_rgb(y, u, v)
    # limited-range + 4:2:0 chroma loss: gray regions round-trip tightly
    gray = np.full((32, 48, 3), 120, np.uint8)
    yg, ug, vg = IN.rgb_to_yuv(gray)
    g2 = IN.yuv_to_rgb(yg, ug, vg)
    assert np.abs(g2.astype(int) - 120).max() <= 2
    assert back.shape == rgb.shape


def test_tiff_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    rgb = rng.integers(0, 256, (24, 40, 3)).astype(np.uint8)
    p = tmp_path / "t.tif"
    IN.write_tiff(str(p), rgb)
    out = IN.read_tiff(str(p))
    assert np.array_equal(out, rgb)
    gray = rng.integers(0, 256, (20, 30)).astype(np.uint8)
    IN.write_tiff(str(p), gray)
    assert np.array_equal(IN.read_tiff(str(p)), gray)
