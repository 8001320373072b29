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


def test_multi_hypothesis_drift_matches_monte_carlo():
    """The deterministic multi-hypothesis expectation (errdo_dist_mhyp.c
    analogue) must agree with the K-decoder Monte-Carlo estimate it
    replaces: same loss model (frame-copy concealment, received MBs
    snap to the encoder recon => leak=0), large K."""
    import jax.numpy as jnp
    from h264tpu.models.errdo import KDecoderSim, MultiHypothesisDrift

    rng = np.random.default_rng(7)
    H = W = 64
    # structured activity: the left half moves hard, the right is static
    # (so the per-MB drift map has real spatial shape to correlate)
    frames = [rng.integers(0, 255, (H, W)).astype(np.int32)]
    for _ in range(5):
        nxt = frames[-1].copy()
        nxt[:, :W // 2] = np.clip(
            nxt[:, :W // 2] + rng.integers(-40, 41, (H, W // 2)), 0, 255)
        nxt[:, W // 2:] = np.clip(
            nxt[:, W // 2:] + rng.integers(-2, 3, (H, W // 2)), 0, 255)
        frames.append(nxt.astype(np.int32))

    sim = KDecoderSim(k=256, p_loss=0.15, height=H, width=W, seed=3)
    mh = MultiHypothesisDrift(p_loss=0.15, height=H, width=W, leak=0.0)
    sim.reset(frames[0])
    mh.reset(frames[0])
    for f in frames[1:]:
        mc = np.asarray(sim.step(f), np.float64)
        ex = np.asarray(mh.step(f), np.float64)
    # same scale and strongly correlated per-MB maps
    assert 0.5 < ex.mean() / mc.mean() < 2.0, (ex.mean(), mc.mean())
    c = np.corrcoef(ex.ravel(), mc.ravel())[0, 1]
    assert c > 0.8, c


def test_multi_hypothesis_intra_cuts_propagation():
    """Received intra MBs carry no propagated drift; with static content
    the expected drift decays once MBs go intra (leak branch) and the
    force-intra mask clears."""
    from h264tpu.models.errdo import MultiHypothesisDrift

    H = W = 32
    a = np.full((H, W), 100, np.int32)
    b = np.full((H, W), 160, np.int32)      # one big change -> drift source
    mh = MultiHypothesisDrift(p_loss=0.2, height=H, width=W, leak=1.0)
    mh.reset(a)
    d1 = np.asarray(mh.step(b))
    assert (d1 > 0).all()
    # static content, all inter: drift persists (p + (1-p)*leak = 1)
    d2 = np.asarray(mh.step(b))
    assert d2.mean() >= d1.mean() * 0.99
    # now every MB goes intra: received copies cut the propagation
    intra = np.ones((H // 16, W // 16), bool)
    d3 = np.asarray(mh.step(b, mb_intra=intra))
    assert d3.mean() < d2.mean() * 0.5
    assert not mh.force_intra_mask(d3 * 0.0, threshold=1.0).any()
