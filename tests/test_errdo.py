"""K-decoder loss simulation tests (SURVEY F20)."""

import numpy as np

from h264tpu.models.errdo import KDecoderSim

H, W = 48, 64


def _frames(n, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (H, W)).astype(np.int32)
    out = []
    for t in range(n):
        out.append(np.clip(np.roll(base, t, axis=1)
                           + rng.integers(-2, 3, (H, W)), 0, 255))
    return out


def test_zero_loss_tracks_encoder_exactly():
    sim = KDecoderSim(4, 0.0, H, W, seed=1)
    for f in _frames(4):
        drift = np.asarray(sim.step(f))
        assert drift.shape == (H // 16, W // 16)
        assert drift.max() == 0.0


def test_drift_accumulates_then_intra_recovers():
    sim = KDecoderSim(8, 0.2, H, W, seed=2)
    frames = _frames(6)
    sim.reset(frames[0])
    drifts = [float(np.asarray(sim.step(f)).mean()) for f in frames[1:4]]
    assert drifts[0] > 0.0
    assert drifts[-1] >= drifts[0] * 0.5  # persistent, not vanishing
    # IDR: all decoders resync to the encoder recon
    sim.reset(frames[4])
    post = float(np.asarray(sim.step(frames[4])).mean())
    # only this frame's own losses remain, concealed from the same frame
    assert post == 0.0


def test_reproducible_given_seed():
    a = KDecoderSim(4, 0.3, H, W, seed=7)
    b = KDecoderSim(4, 0.3, H, W, seed=7)
    for f in _frames(3, seed=3):
        da = np.asarray(a.step(f))
        db = np.asarray(b.step(f))
        np.testing.assert_array_equal(da, db)
    np.testing.assert_array_equal(np.asarray(a.sim), np.asarray(b.sim))


def test_force_intra_mask_thresholds():
    sim = KDecoderSim(8, 0.5, H, W, seed=4)
    frames = _frames(3, seed=5)
    sim.reset(frames[0])
    sim.step(frames[1])
    drift = sim.step(frames[2])
    mask = np.asarray(sim.force_intra_mask(drift, threshold=1.0))
    assert mask.shape == (H // 16, W // 16)
    assert mask.any()
    none = np.asarray(sim.force_intra_mask(drift, threshold=1e12))
    assert not none.any()
