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


def test_kdecoder_drift_drives_forced_intra_in_conformant_stream(foreman_qcif):
    """Closed loss-aware loop (F20 wired): the K-decoder channel simulation's
    drift map forces intra MBs in the next conformant P frame (the batched
    analogue of RDOptimization=2 / md_highloss; ref FR/src/decoder.c:361)."""
    import numpy as np
    from h264tpu.models.errdo import KDecoderSim
    from h264tpu.avc.params import AVCParams
    from h264tpu.avc.slice_enc import encode_i_frame, encode_p_frame
    from h264tpu.avc.inter import RefPlanes

    frames = [foreman_qcif.read(i) for i in range(3)]
    p = AVCParams(width=176, height=144, qp=30, deblock=False)
    sim = KDecoderSim(k=8, p_loss=0.25, height=144, width=176, seed=3)

    rbsp, rec, _ = encode_i_frame(frames[0], p)
    sim.reset(rec[0])
    ref = RefPlanes(*rec)
    mask = None
    forced_total = 0
    for i in (1, 2):
        rbsp, rec, ctx, stats = encode_p_frame(
            frames[i], ref, p, frame_num=i, force_intra_mask=mask)
        drift = sim.step(rec[0])
        mask = np.asarray(sim.force_intra_mask(drift, threshold=20.0))
        forced_total += int(mask.sum())
        if mask.sum():
            assert stats["n_intra"] >= 0
        ref = RefPlanes(*rec)
    # with 25% loss the drift must flag at least some MBs across 2 frames
    assert forced_total > 0
