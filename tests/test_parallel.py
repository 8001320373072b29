"""Shard-invariance: the (gop, tile) sharded encode step must produce results
byte-identical to the single-device path (SURVEY §4 adopted strategy (e))."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

from h264tpu.parallel.tiled_search import tiled_p_step
from h264tpu.utils.config import CodecConfig, FractalConfig
from h264tpu.models.fractal_codec import FractalCodec


@pytest.mark.parametrize("gop,tile", [(2, 4), (1, 2), (8, 1)])
def test_tiled_matches_single_device(rng, gop, tile):
    if gop * tile > len(jax.devices()):
        pytest.skip("not enough devices")
    H, W = 128, 64
    B = gop
    SR = 3

    def mk(shape):
        return rng.integers(0, 256, shape).astype(np.int32)

    y, ry = mk((B, H, W)), mk((B, H, W))
    u, ru = mk((B, H // 2, W // 2)), mk((B, H // 2, W // 2))
    v, rv = mk((B, H // 2, W // 2)), mk((B, H // 2, W // 2))

    mesh = Mesh(np.array(jax.devices()[: gop * tile]).reshape(gop, tile),
                ("gop", "tile"))
    step = tiled_p_step(mesh, qp=28, search_range=SR, tol16=10.5, tol8=8.0,
                        use_halfpel=True)
    sh = NamedSharding(mesh, P("gop", "tile", None))
    args = tuple(jax.device_put(jnp.asarray(a), sh)
                 for a in (y, u, v, ry, ru, rv))
    maps_t, zz_t, rec_t = jax.jit(step)(*args)

    # deblock=False: the tiled step covers search+residual; cross-tile
    # deblock halo is the roadmap item (parallel/tiled_search docstring)
    cfg = CodecConfig(width=W, height=H, qp=28, intra_period=0, deblock=False,
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
