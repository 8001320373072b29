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
