"""Rate-control tests (quadratic model, reference F18)."""

import numpy as np
import pytest

from h264tpu.models.ratectl import QuadraticRateControl, qp2qstep, qstep2qp
from h264tpu.utils.config import CodecConfig, FractalConfig
from h264tpu.models.fractal_codec import FractalCodec, FractalDecoder


def test_qstep_mapping():
    assert abs(qp2qstep(0) - 0.625) < 1e-9
    assert abs(qp2qstep(6) - 1.25) < 1e-9       # doubles every 6
    assert abs(qp2qstep(28) - qp2qstep(22) * 2) < 1e-9
    for qp in (0, 7, 23, 40, 51):
        assert qstep2qp(qp2qstep(qp)) == qp


def test_rc_converges_on_synthetic_model():
    """Feed the controller a synthetic encoder obeying an R-Q law; the bits
    must settle near the target."""
    rng = np.random.default_rng(0)
    target = 40000.0
    rc = QuadraticRateControl(target_bps=target * 30, frame_rate=30.0, qp_init=30)
    mad = 6.0
    bits_hist = []
    for t in range(60):
        qp = rc.frame_qp()
        q = qp2qstep(qp)
        bits = 90000.0 * mad / q + 20000.0 * mad / (q * q)
        bits *= 1 + 0.05 * rng.standard_normal()
        rc.update(bits, qp, mad)
        bits_hist.append(bits)
        mad = max(3.0, mad + 0.2 * rng.standard_normal())
    settled = np.mean(bits_hist[20:])
    assert abs(settled - target) / target < 0.25, settled


def test_rc_pipeline_roundtrip(foreman_qcif):
    cfg = CodecConfig(width=176, height=144, qp=30, intra_period=0,
                      rate_control=True, target_bitrate=300_000.0,
                      frame_rate=30.0,
                      fractal=FractalConfig(search_range=4))
    codec = FractalCodec(cfg)
    frames = [foreman_qcif.read(i % 3) for i in range(8)]
    results, stream = codec.encode_sequence(frames)
    # per-frame qp recorded and varies within clip bounds
    qps = [r.qp for r in results[1:]]
    assert all(1 <= q <= 51 for q in qps)
    # decodes bit-exact with per-frame qp from the stream
    decoded = FractalDecoder().decode(stream)
    for i, res in enumerate(results):
        for p in range(3):
            np.testing.assert_array_equal(decoded[i][p], res.recon[p])
