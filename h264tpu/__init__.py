"""h264tpu — a TPU-native H.264/AVC + fractal (PIFS) video coding framework.

Re-designed from scratch for TPU (JAX/XLA/Pallas) with the capability surface of
the reference thesis codec "A high efficiency video coding system based on joint
fractal and H.264/AVC" (H264Fractal, a JM 8.6 fork) and the JM 18.5 reference
H.264 encoder/decoder it is benchmarked against.

Design stance (see SURVEY.md §7):
  * every per-pixel / per-block loop of the reference becomes a batched JAX op or
    Pallas kernel over ``[tiles, blocks, candidates]`` lattices;
  * sequential-by-nature stages (entropy coding, bitstream assembly) compute
    symbols + bit-lengths on device, then pack bits with a vectorized packer;
  * frames are sharded over a ``(gop, tile)`` device mesh via ``shard_map`` with
    ICI halo exchange for reference pixels.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent XLA compilation cache: the fractal search graph takes minutes to
# compile on TPU; cache hits bring warm-up to seconds across processes.
_cache_dir = _os.environ.get(
    "H264TPU_JAX_CACHE",
    _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                  ".jax_cache"))
try:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:  # older jax without these options
    pass
