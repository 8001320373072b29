"""Picklable codec factories for process-distributed GOP encoding.

:class:`~h264tpu.models.gop_parallel.GOPEncoder` with ``processes=True``
ships each IDR-delimited GOP unit to a SPAWNED worker process — its own
interpreter and jax runtime, with inputs/outputs crossing a real process
boundary (the DCN distribution shape of SURVEY §4(e), testable on one
machine without N chips).  Factories must be importable top-level
functions; use ``functools.partial`` to bind parameters.
"""

from __future__ import annotations

import os


def _force_cpu():
    """Pin the worker's jax to CPU before its first jax import (workers
    must not race for the single axon TPU tunnel; on a real pod each
    worker process would instead own its host-local chips)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


def tpu_avc_cpu_factory(width: int, height: int, qp: int,
                        n_slices: int = 1, search_range: int = 8):
    """A TPUAVCCodec (CPU-pinned) for process workers."""
    _force_cpu()
    from ..avc.params import AVCParams
    from ..avc.tpu_codec import TPUAVCCodec
    p = AVCParams(width=width, height=height, qp=qp, num_ref_frames=1)
    return TPUAVCCodec(p, intra_period=0, search_range=search_range,
                       n_slices=n_slices)


def fractal_cpu_factory(width: int, height: int, qp: int,
                        search_range: int = 7):
    """A FractalCodec (CPU-pinned) for process workers."""
    _force_cpu()
    from ..utils.config import CodecConfig, FractalConfig
    from ..models.fractal_codec import FractalCodec
    cfg = CodecConfig(width=width, height=height, qp=qp, intra_period=0,
                      fractal=FractalConfig(search_range=search_range))
    return FractalCodec(cfg)
