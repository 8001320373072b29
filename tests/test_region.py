"""Object/region-based coding tests (SURVEY F24) vs a direct NumPy oracle
of the reference's classify/fit/reconstruct semantics."""

import numpy as np
import pytest

from h264tpu.ops import region, segment

MB = 16


# ---------------------------------------------------------------------------
# oracle: straight loops, same f32 arithmetic as the module
# ---------------------------------------------------------------------------

def _quan_a(x):
    c = int(np.sign(x)) * (abs(int(x)) // 10)
    b = int(x) - c * 10
    if 2 < b < 8:
        return c * 10 + 5
    if b > 7:
        return (c + 1) * 10
    return c * 10


def _split_mul(a, b):
    a, b = int(a), int(b)
    return np.float32(np.float32(a * (b >> 8)) * np.float32(256.0)
                      + np.float32(a * (b & 255)))


def _fit(n, s_r, s_r2, s_d, s_d2, s_rd):
    num = np.float32(_split_mul(n, s_rd) - _split_mul(s_r, s_d))
    det = np.float32(_split_mul(n, s_d2) - _split_mul(s_d, s_d))
    if det == 0.0:
        a = 0
    else:
        a = _quan_a(np.trunc(np.float32(num / det) * np.float32(100.0)))
    beta = _quan_a(s_r // max(n, 1))
    ok = (n > 0 and -235 <= a <= 400 and -60 <= beta <= 255)
    aq = np.float32(a) / np.float32(100.0)
    bq = np.float32(beta)
    nf = np.float32(max(n, 1))
    mean_term = np.float32(bq - aq * np.float32(s_d) / nf)
    rms = np.float32(
        np.float32(s_r2)
        + aq * np.float32(aq * np.float32(s_d2)
                          - np.float32(2.0) * np.float32(s_rd)
                          + np.float32(2.0) * mean_term * np.float32(s_d))
        + mean_term * (mean_term * nf - np.float32(2.0) * np.float32(s_r)))
    if not ok:
        return 0, 0, np.float32(1e30)
    return a, beta, rms


def _oracle_search(org, ref, m_cur, m_ref, sr):
    from h264tpu.ops.fractal import spiral_offsets
    H, W = org.shape
    offs = spiral_offsets(sr)
    out = {k: np.zeros((2, H // MB, W // MB), np.int64)
           for k in ("a", "beta", "dx", "dy")}
    rms_out = np.full((2, H // MB, W // MB), 1e30, np.float32)
    for obj in (0, 1):
        mr = (m_cur // 255 == obj).astype(np.int64)
        md = (m_ref // 255 == obj).astype(np.int64)
        for by in range(H // MB):
            for bx in range(W // MB):
                sl = np.s_[by * MB:(by + 1) * MB, bx * MB:(bx + 1) * MB]
                r = org[sl].astype(np.int64)
                mrb = mr[sl]
                n_r = int(mrb.sum())
                s_r, s_r2 = int((mrb * r).sum()), int((mrb * r * r).sum())
                best = (np.float32(1e30), None)
                for oi, (dx, dy) in enumerate(offs):
                    y0, x0 = by * MB + dy, bx * MB + dx
                    if y0 < 0 or x0 < 0 or y0 + MB > H or x0 + MB > W:
                        continue
                    d = ref[y0:y0 + MB, x0:x0 + MB].astype(np.int64)
                    mdb = md[y0:y0 + MB, x0:x0 + MB]
                    match = mrb * mdb
                    n_m = int(match.sum())
                    s_dm = int((match * d).sum())
                    s_d2m = int((match * d * d).sum())
                    s_rdm = int((match * r * d).sum())
                    s_rm = int((match * r).sum())
                    avg = s_dm // n_m if n_m > 0 else 0
                    miss = n_r - n_m
                    s_d = s_dm + miss * avg
                    s_d2 = s_d2m + miss * avg * avg
                    s_rd = s_rdm + (s_r - s_rm) * avg
                    a, beta, rms = _fit(n_r, s_r, s_r2, s_d, s_d2, s_rd)
                    if rms < best[0]:
                        best = (rms, (a, beta, dx, dy))
                if best[1] is not None:
                    a, beta, dx, dy = best[1]
                    out["a"][obj, by, bx] = a
                    out["beta"][obj, by, bx] = beta
                    out["dx"][obj, by, bx] = dx
                    out["dy"][obj, by, bx] = dy
                rms_out[obj, by, bx] = best[0]
    return out, rms_out


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(11)
    H, W = 32, 48
    ref = rng.integers(40, 200, (H, W)).astype(np.uint8)
    # object = bright moving square; current frame shifts it by (2, 3)
    m_ref = np.zeros((H, W), np.uint8)
    m_ref[8:24, 10:30] = 255
    m_cur = np.roll(m_ref, (2, 3), axis=(0, 1))
    org = np.roll(ref, (2, 3), axis=(0, 1)).astype(np.int32)
    org = np.clip(org + (m_cur.astype(np.int32) // 255) * 20
                  + rng.integers(-3, 4, (H, W)), 0, 255).astype(np.uint8)
    return org, ref, m_cur, m_ref


def test_region_search_matches_oracle(scene):
    org, ref, m_cur, m_ref = scene
    got = {k: np.asarray(v) for k, v in region.region_search_plane(
        org, ref, m_cur, m_ref, search_range=2, use_halfpel=False).items()}
    want, want_rms = _oracle_search(org, ref, m_cur, m_ref, 2)
    for k in ("a", "beta", "dx", "dy"):
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)
    assert np.allclose(got["rms"], want_rms, rtol=1e-5)
    assert np.all(got["ref"] == 0)


def test_region_reconstruct_beats_frame_copy(scene):
    org, ref, m_cur, m_ref = scene
    params = region.region_search_plane(org, ref, m_cur, m_ref,
                                        search_range=4, use_halfpel=True)
    rec = np.asarray(region.region_reconstruct(params, ref, m_cur, m_ref))
    assert rec.min() >= 0 and rec.max() <= 255
    err_rec = float(((rec - org.astype(np.int64)) ** 2).mean())
    err_copy = float(((ref.astype(np.int64) - org.astype(np.int64)) ** 2).mean())
    assert err_rec < err_copy * 0.5


def test_region_reconstruct_deterministic(scene):
    org, ref, m_cur, m_ref = scene
    params = region.region_search_plane(org, ref, m_cur, m_ref,
                                        search_range=2, use_halfpel=False)
    r1 = np.asarray(region.region_reconstruct(params, ref, m_cur, m_ref,
                                              use_halfpel=False))
    r2 = np.asarray(region.region_reconstruct(
        {k: np.asarray(v) for k, v in params.items()}, ref, m_cur, m_ref,
        use_halfpel=False))
    np.testing.assert_array_equal(r1, r2)


# ---------------------------------------------------------------------------
# segmentation
# ---------------------------------------------------------------------------

def test_morphology_basics():
    img = np.zeros((16, 16), np.uint8)
    img[6:10, 6:10] = 200
    er = np.asarray(segment.gray_erosion(img))
    di = np.asarray(segment.gray_dilation(img))
    assert er.sum() < img.sum() < di.sum()
    assert er[7, 7] == 190 and di[5, 5] == 210  # flat cake of 10
    assert er.min() >= 0 and di.max() <= 255


def test_median_removes_speckle():
    img = np.zeros((16, 16), np.uint8)
    img[8, 8] = 255
    out = np.asarray(segment.median3x3(img))
    assert out[8, 8] == 0


def test_segment_sequence_finds_moving_square():
    H, W = 48, 64
    frames = []
    for t in range(10):
        f = np.full((H, W), 60, np.uint8)
        f[16:32, 8 + 4 * t:24 + 4 * t] = 200
        frames.append(f)
    masks = segment.segment_sequence(frames)
    m0 = np.asarray(masks[0])
    assert set(np.unique(m0)) <= {0, 255}
    # moving edge region flagged as object
    assert m0[20:28, 20:26].mean() > 128
    # far-away static background stays 0
    assert m0[:8, 40:].max() == 0
    labels = np.asarray(segment.mb_region_labels(m0))
    assert labels.shape == (H // 16, W // 16)
    assert set(np.unique(labels)) <= {0, 1, 2}
    assert (labels > 0).any() and (labels == 0).any()


def test_region_params_stream_roundtrip(scene):
    from h264tpu.entropy.bitio import BitWriter, BitReader
    from h264tpu.entropy import fractal_syntax as FS
    org, ref, m_cur, m_ref = scene
    params = {k: np.asarray(v) for k, v in region.region_search_plane(
        org, ref, m_cur, m_ref, search_range=4, use_halfpel=True).items()}
    w = BitWriter()
    FS.write_region_params(w, params, 4, True)
    rd = FS.read_region_params(BitReader(w.to_bytes()),
                               org.shape[0] // 16, org.shape[1] // 16, 4, True)
    for k in ("ref", "dx", "dy", "a", "beta"):
        np.testing.assert_array_equal(rd[k], params[k], err_msg=k)
    rec_enc = np.asarray(region.region_reconstruct(params, ref, m_cur, m_ref))
    rec_dec = np.asarray(region.region_reconstruct(rd, ref, m_cur, m_ref))
    np.testing.assert_array_equal(rec_enc, rec_dec)


def test_region_mode_end_to_end_roundtrip(rng):
    """num_regions=2 is reachable from CodecConfig: encode_sequence routes
    to the region-coded path, the stream carries write_region_params, and
    the decoder (given the same alpha masks) reconstructs bit-exactly
    (VERDICT round-1 item 6)."""
    import numpy as np
    from h264tpu.utils.config import CodecConfig, FractalConfig
    from h264tpu.models.fractal_codec import FractalCodec, FractalDecoder
    from h264tpu.ops import segment as SG

    H, W = 64, 64
    frames = []
    base = rng.integers(0, 255, (H, W)).astype(np.uint8)
    for i in range(3):
        y = np.roll(base, i * 2, axis=1)
        y[20:40, 20:40] = np.roll(y[20:40, 20:40], i * 3, axis=0)  # object
        u = rng.integers(0, 255, (H // 2, W // 2)).astype(np.uint8)
        v = rng.integers(0, 255, (H // 2, W // 2)).astype(np.uint8)
        frames.append((y, u, v))

    cfg = CodecConfig(width=W, height=H, qp=30, intra_period=0,
                      num_regions=2, deblock=False,
                      fractal=FractalConfig(search_range=3))
    codec = FractalCodec(cfg)
    results, stream, masks = codec.encode_sequence_region(frames)
    assert any(r.frame_type == "R" for r in results)

    dec = FractalDecoder()
    recons = dec.decode(stream, masks=masks)
    for res, fr in zip(results, recons):
        for a, b in zip(res.recon, fr):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # config-driven routing via plain encode_sequence
    res2, stream2 = FractalCodec(cfg).encode_sequence(frames)
    assert stream2 == stream
