"""Row-tile sharding of the fractal encode step over a (gop, tile) mesh.

SPMD design (SURVEY §2.3): the fractal P path has no MB-to-MB dependency
within a frame — search and reconstruction depend only on the previous
reconstructed frame.  So each frame is sharded into horizontal MB-row tiles
across the ``tile`` mesh axis, and independent frames across the ``gop``
axis.  The only communication is a halo exchange of ``search_range + 1``
reference rows between tile neighbors over ICI (``jax.lax.ppermute``) —
the TPU equivalent of the reference's full-frame domain pool
(``FR/src/compute.c:277``), restricted to what a tile can actually reach.

Shard-invariance: with edge-replicated frame borders, dynamic domain-row
validity bounds per tile, and deblocking in config-fixed row bands
(``ops.deblock.deblock_plane_grouped`` — the band grid comes from
cfg.tile_rows, NOT the device count), the tiled step returns EXACTLY the
same trees, coefficients, and reconstruction as the single-device path
(asserted in tests/test_parallel.py, including the deblocked recon and the
final bitstream bytes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import fractal as F
from ..ops import transform as T
from ..ops import deblock as DB


def halo_exchange_rows(x: jnp.ndarray, halo: int, axis_name: str = "tile"):
    """[hl, W] -> [hl + 2*halo, W]: neighbor rows via ppermute; frame borders
    (first tile's top, last tile's bottom) use edge replication, matching the
    unsharded edge-pad semantics of h264tpu.ops.fractal.halfpel_planes."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    if n == 1:
        top = jnp.repeat(x[:1], halo, axis=0)
        bot = jnp.repeat(x[-1:], halo, axis=0)
        return jnp.concatenate([top, x, bot], axis=0)
    # tile i sends its bottom rows to i+1 (arriving as i+1's top halo)
    from_above = jax.lax.ppermute(x[-halo:], axis_name,
                                  [(i, i + 1) for i in range(n - 1)])
    from_below = jax.lax.ppermute(x[:halo], axis_name,
                                  [(i + 1, i) for i in range(n - 1)])
    edge_top = jnp.repeat(x[:1], halo, axis=0)
    edge_bot = jnp.repeat(x[-1:], halo, axis=0)
    from_above = jnp.where(idx == 0, edge_top, from_above)
    from_below = jnp.where(idx == n - 1, edge_bot, from_below)
    return jnp.concatenate([from_above, x, from_below], axis=0)


def _local_plane_step(org, ref, qp, *, search_range, tol16, tol8, use_halfpel,
                      is_luma, deblock, local_groups, search_mode=0,
                      chun_lo=0.9, chun_hi=1.0, bounds=None,
                      axis_name="tile"):
    """Encode one plane tile: search + fractal recon + residual coding
    (+ banded deblock; ``local_groups`` deblock bands inside this tile)."""
    halo = search_range + 1
    hl, W = org.shape
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    ext = halo_exchange_rows(ref.astype(jnp.int32), halo, axis_name)
    y_lo = jnp.where(idx == 0, 0, -search_range)
    y_hi = jnp.where(idx == n - 1, hl, hl + search_range)

    tree = F.search_plane(org, ext, search_range=search_range, tol16=tol16,
                          tol8=tol8, use_halfpel=use_halfpel, halo=halo,
                          y_lo=y_lo, y_hi=y_hi, search_mode=search_mode,
                          chun_lo=chun_lo, chun_hi=chun_hi, bounds=bounds)
    maps = F.leaf_maps(tree, hl, W)
    frec = F.reconstruct_from_maps(maps, ext, hl, W, use_halfpel, halo=halo)
    zz, rec = T.residual_code_plane(org, frec, qp, intra=False,
                                    luma_mb_grid=is_luma)
    if deblock:
        nz = (zz != 0).any(axis=-1).reshape(hl // 4, W // 4)
        bs_v, bs_h = DB.strengths_fractal(
            {k: m[:hl // 4, :W // 4] for k, m in maps.items()}, nz)
        rec = DB.deblock_plane_grouped(rec, bs_v, bs_h, qp, is_luma,
                                       groups=local_groups)
    return maps, zz, rec


def tiled_p_step(mesh: Mesh, search_range: int, tol16: float,
                 tol8: float, use_halfpel: bool = True, deblock: bool = False,
                 tile_rows: int = None, search_mode: int = 0,
                 chun_lo: float = 0.9, chun_hi: float = 1.0, bounds=None):
    """Build the sharded fractal P-frame step over ``mesh`` (gop, tile).

    Returns a function (y, u, v, ref_y, ref_u, ref_v, qp) over BATCHED planes
    [B, H, W] / [B, H/2, W/2] sharded P('gop', 'tile', None); ``qp`` is a
    traced scalar (rate control).  Tile heights (H/tiles and H/2/tiles) must
    be multiples of 16.  ``tile_rows`` (default = mesh tile count) is the
    config-fixed deblock band grid; it must be a multiple of the tile count.
    """
    n_tiles = mesh.shape["tile"]
    tile_rows = n_tiles if tile_rows is None else tile_rows
    if tile_rows % n_tiles:
        raise ValueError("tile_rows must be a multiple of the mesh tile axis")
    local_groups = tile_rows // n_tiles
    kw = dict(search_range=search_range, tol16=tol16, tol8=tol8,
              use_halfpel=use_halfpel, deblock=deblock,
              local_groups=local_groups, search_mode=search_mode,
              chun_lo=chun_lo, chun_hi=chun_hi, bounds=bounds)

    def local(y, u, v, ry, ru, rv, qp):
        cqp = T.chroma_qp(qp)

        # leading local batch axis (gop shard) of size B/gop
        def one(y1, u1, v1, ry1, ru1, rv1):
            my, zy, recy = _local_plane_step(y1, ry1, qp, is_luma=True, **kw)
            mu, zu, recu = _local_plane_step(u1, ru1, cqp, is_luma=False, **kw)
            mv_, zv, recv = _local_plane_step(v1, rv1, cqp, is_luma=False, **kw)
            return (my, mu, mv_), (zy, zu, zv), (recy, recu, recv)

        return jax.vmap(one)(y, u, v, ry, ru, rv)

    spec_l = P("gop", "tile", None)
    spec_zz = P("gop", "tile", None)   # zz: [B, nblocks, 16] blocks raster => rows shard
    in_specs = (spec_l,) * 6 + (P(),)
    out_specs = (
        ({k: spec_l for k in ("a", "beta", "dx", "dy", "ref", "shape")},) * 3,
        (spec_zz,) * 3,
        (spec_l,) * 3,
    )
    return shard_map(local, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
