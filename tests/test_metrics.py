"""Metrics tests (SURVEY J12): SSIM vs a direct NumPy oracle of the JM loop."""

import numpy as np
import pytest

from h264tpu.utils import metrics


def _ssim_oracle(ref, enc, max_pel=255, win=8, overlap=8):
    """Direct transcription of the JM window loop (img_dist_ssim.c:22)."""
    K1, K2 = 0.01, 0.03
    C1 = K1 * K1 * max_pel * max_pel
    C2 = K2 * K2 * max_pel * max_pel
    n = float(win * win)
    h, w = ref.shape
    tot, cnt = 0.0, 0
    for j in range(0, h - win + 1, overlap):
        for i in range(0, w - win + 1, overlap):
            ro = ref[j:j + win, i:i + win].astype(np.float64)
            eo = enc[j:j + win, i:i + win].astype(np.float64)
            mo, me = ro.sum() / n, eo.sum() / n
            vo = ((ro * ro).sum() - ro.sum() * mo) / n
            ve = ((eo * eo).sum() - eo.sum() * me) / n
            cov = ((ro * eo).sum() - ro.sum() * me) / n
            s = ((2 * mo * me + C1) * (2 * cov + C2)) / \
                ((mo * mo + me * me + C1) * (vo + ve + C2))
            tot += s
            cnt += 1
    return tot / cnt


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(7)
    ref = rng.integers(0, 256, (64, 80)).astype(np.uint8)
    enc = np.clip(ref.astype(np.int32)
                  + rng.integers(-12, 13, ref.shape), 0, 255).astype(np.uint8)
    return ref, enc


def test_ssim_matches_jm_oracle(pair):
    ref, enc = pair
    got = float(metrics.ssim(ref, enc))
    want = _ssim_oracle(ref, enc)
    assert abs(got - want) < 1e-4


def test_ssim_overlap4_matches_oracle(pair):
    ref, enc = pair
    got = float(metrics.ssim(ref, enc, overlap=4))
    want = _ssim_oracle(ref, enc, overlap=4)
    assert abs(got - want) < 1e-4


def test_identity_metrics(pair):
    ref, _ = pair
    assert float(metrics.psnr(ref, ref)) > 99.0
    assert abs(float(metrics.ssim(ref, ref)) - 1.0) < 1e-5
    big = np.tile(ref, (4, 4))  # >= 2^4 factor for 5 dyadic levels
    assert abs(float(metrics.ms_ssim(big, big)) - 1.0) < 1e-4


def test_metrics_monotonic_in_noise():
    rng = np.random.default_rng(3)
    ref = rng.integers(0, 256, (128, 160)).astype(np.uint8)
    vals = []
    for amp in (2, 10, 40):
        enc = np.clip(ref.astype(np.int32)
                      + rng.integers(-amp, amp + 1, ref.shape), 0, 255)
        vals.append((float(metrics.psnr(ref, enc)),
                     float(metrics.ssim(ref, enc)),
                     float(metrics.ms_ssim(ref, enc))))
    p, s, m = zip(*vals)
    assert p[0] > p[1] > p[2]
    assert s[0] > s[1] > s[2]
    assert m[0] > m[1] > m[2]
    assert all(0.0 < x <= 1.0 for x in s + m)


def test_frame_metrics_shape(pair):
    ref, enc = pair
    u = ref[::2, ::2]
    d = metrics.frame_metrics((ref, u, u), (enc, u, u))
    assert set(d) == {"psnr_y", "psnr_u", "psnr_v",
                      "ssim_y", "ssim_u", "ssim_v"}
    assert d["ssim_u"] == pytest.approx(1.0, abs=1e-5)
