"""End-to-end pipeline tests on the real foreman sequence."""

import numpy as np
import pytest

from h264tpu.utils.config import CodecConfig, FractalConfig
from h264tpu.models.fractal_codec import FractalCodec


def test_foreman_ipp(foreman_qcif):
    cfg = CodecConfig(width=176, height=144, qp=28, intra_period=12,
                      fractal=FractalConfig(search_range=4))
    codec = FractalCodec(cfg)
    frames = [foreman_qcif.read(i) for i in range(min(3, len(foreman_qcif)))]
    results, _stream = codec.encode_sequence(frames)

    assert results[0].frame_type == "I"
    assert all(r.frame_type == "P" for r in results[1:])
    # quality sanity: recon must track the source closely at QP28
    for r in results:
        assert r.psnr_y > 30.0, (r.frame_type, r.psnr_y)
        assert r.psnr_u > 30.0 and r.psnr_v > 30.0
    # P-frames must beat plain copy of the previous recon
    prev = results[0].recon[0]
    y1 = np.asarray(frames[1][0])
    copy_psnr = 10 * np.log10(255**2 / np.mean((prev.astype(float) - y1) ** 2))
    assert results[1].psnr_y > copy_psnr + 3.0


def test_residual_thresholding_zeroes_flat_mbs(rng):
    """An MB with near-zero residual must be dropped entirely (cost<=5 rule)."""
    import jax.numpy as jnp
    from h264tpu.ops import transform as T
    pred = rng.integers(0, 250, size=(32, 32)).astype(np.int32)
    org = pred.copy()
    org[0, 0] += 1  # tiny single-pixel residual -> level<=1, cost small
    zz, rec = T.residual_code_plane(jnp.asarray(org), jnp.asarray(pred), 28)
    assert int((np.asarray(zz) != 0).sum()) == 0
    np.testing.assert_array_equal(np.asarray(rec), pred)
