"""Shard-invariance: the (gop, tile) sharded encode step must produce results
byte-identical to the single-device path (SURVEY §4 adopted strategy (e)),
including the deblocked reconstruction and the final BITSTREAM bytes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

from h264tpu.parallel.tiled_search import tiled_p_step
from h264tpu.utils.config import CodecConfig, FractalConfig
from h264tpu.models.fractal_codec import FractalCodec, FractalDecoder


@pytest.mark.parametrize("gop,tile,deblock", [(2, 4, True), (1, 2, False),
                                              (8, 1, True)])
def test_tiled_matches_single_device(rng, gop, tile, deblock):
    if gop * tile > len(jax.devices()):
        pytest.skip("not enough devices")
    H, W = 128, 64
    B = gop
    SR = 3
    tile_rows = 4          # config-fixed deblock band grid

    def mk(shape):
        return rng.integers(0, 256, shape).astype(np.int32)

    y, ry = mk((B, H, W)), mk((B, H, W))
    u, ru = mk((B, H // 2, W // 2)), mk((B, H // 2, W // 2))
    v, rv = mk((B, H // 2, W // 2)), mk((B, H // 2, W // 2))

    mesh = Mesh(np.array(jax.devices()[: gop * tile]).reshape(gop, tile),
                ("gop", "tile"))
    step = tiled_p_step(mesh, search_range=SR, tol16=10.5, tol8=8.0,
                        use_halfpel=True, deblock=deblock,
                        tile_rows=tile_rows)
    sh = NamedSharding(mesh, P("gop", "tile", None))
    args = tuple(jax.device_put(jnp.asarray(a), sh)
                 for a in (y, u, v, ry, ru, rv))
    maps_t, zz_t, rec_t = jax.jit(step)(*args, jnp.int32(28))

    cfg = CodecConfig(width=W, height=H, qp=28, intra_period=0,
                      deblock=deblock, tile_rows=tile_rows,
                      fractal=FractalConfig(search_range=SR))
    codec = FractalCodec(cfg)
    for b in range(B):
        maps_s, zz_s, rec_s = codec._p_step(
            *(jnp.asarray(p[b]) for p in (y, u, v, ry, ru, rv)))
        for pi in range(3):
            np.testing.assert_array_equal(
                np.asarray(rec_t[pi][b]), np.asarray(rec_s[pi]),
                err_msg=f"recon mismatch batch {b} plane {pi}")
            np.testing.assert_array_equal(
                np.asarray(zz_t[pi][b]), np.asarray(zz_s[pi]),
                err_msg=f"levels mismatch batch {b} plane {pi}")
            for k in ("a", "beta", "dx", "dy", "ref", "shape"):
                np.testing.assert_array_equal(
                    np.asarray(maps_t[pi][k][b]), np.asarray(maps_s[pi][k]),
                    err_msg=f"map {k} mismatch batch {b} plane {pi}")


def test_sharded_encode_bitstream_identical(rng):
    """FractalCodec(mesh) must emit BYTE-IDENTICAL streams to the
    single-device codec — the full encode path incl. deblock bands, entropy
    coding, and container assembly (VERDICT round-1 item 3)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    H, W = 128, 64
    cfg = CodecConfig(width=W, height=H, qp=28, intra_period=8, deblock=True,
                      tile_rows=4, fractal=FractalConfig(search_range=3))
    frames = [tuple(rng.integers(0, 256, s).astype(np.uint8)
                    for s in ((H, W), (H // 2, W // 2), (H // 2, W // 2)))
              for _ in range(3)]

    codec1 = FractalCodec(cfg)
    res1, stream1 = codec1.encode_sequence(frames)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(1, 4), ("gop", "tile"))
    codec4 = FractalCodec(cfg, mesh=mesh)
    res4, stream4 = codec4.encode_sequence(frames)

    assert stream1 == stream4, "sharded bitstream differs from single-device"
    # decoder round-trips the banded-deblock stream bit-exactly
    dec = FractalDecoder()
    recons = dec.decode(stream1)
    for r1, fr in zip(res1, recons):
        for a, b in zip(r1.recon, fr):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
