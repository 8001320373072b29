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


def test_rc_update_mode_family():
    """RCUpdateMode 0..3 semantics (rc_quadratic.c:1292 updateQPRC0-3):
    mode 0 trains on P only and derives I/B QPs from the P layer; mode 2
    lets I/B touch the buffer/MAD state but not the P R-Q fit; mode 1
    trains on everything."""
    rc0 = QuadraticRateControl(target_bps=1.2e6, frame_rate=30.0,
                               qp_init=30, rc_mode=0)
    for qp in (30, 31, 32, 31):
        rc0.update(40000, qp, 5.0, ftype="P")
    n_obs = len(rc0.obs)
    # I/B do not train the model in mode 0
    rc0.update(90000, 28, 7.0, ftype="I")
    assert len(rc0.obs) == n_obs
    # I derives from the recent-P average minus 2; B from last P plus 2
    assert rc0.frame_qp("I") == int(round(np.mean([30, 31, 32, 31]))) - 2
    assert rc0.frame_qp("B") == 31 + 2

    rc2 = QuadraticRateControl(target_bps=1.2e6, frame_rate=30.0,
                               qp_init=30, rc_mode=2)
    rc2.update(40000, 30, 5.0, ftype="P")
    bal = rc2.bits_balance
    n_obs, n_mads = len(rc2.obs), len(rc2.mads)
    rc2.update(90000, 28, 7.0, ftype="I")
    assert len(rc2.obs) == n_obs          # R-Q fit untouched
    assert len(rc2.mads) == n_mads + 1    # MAD history extended
    assert rc2.bits_balance > bal         # buffer charged

    rc1 = QuadraticRateControl(target_bps=1.2e6, frame_rate=30.0,
                               qp_init=30, rc_mode=1)
    rc1.update(40000, 30, 5.0, ftype="I")
    assert len(rc1.obs) == 1              # everything trains in mode 1


def test_rc_basic_unit_qps():
    """Mode-3 basic-unit layer: equal per-unit budget share + per-unit
    MAD -> higher-activity units take higher QP, all within +-2 of the
    frame QP."""
    rc = QuadraticRateControl(target_bps=1.2e6, frame_rate=30.0,
                              qp_init=30, rc_mode=3, basic_units=3)
    # no per-unit history yet -> flat QPs
    qps = rc.basic_unit_qps(3)
    assert (qps == qps[0]).all()
    for qp in (30, 31, 31):
        rc.update(40000, qp, 5.0)
    rc.update_basic_units([2.0, 5.0, 12.0])
    qps = rc.basic_unit_qps(3)
    fqp = rc.frame_qp()
    assert (np.abs(qps - fqp) <= 2).all()
    assert qps[0] <= qps[1] <= qps[2]     # MAD-monotone
    assert qps[2] > qps[0]                # actually differentiates
