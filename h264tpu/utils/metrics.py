"""Distortion metrics: PSNR, SSIM, MS-SSIM (SURVEY J12).

TPU-native re-implementation of JM 18.5's metric reporting layer:

* PSNR          — JM/lencod/src/img_dist_snr.c (and FR/src/code.c:514 `PSNR`)
* SSIM          — JM/lencod/src/img_dist_ssim.c:22 `compute_ssim`:
                  uniform win_h x win_w windows stepped by `overlap`,
                  biased variance (win_pixels denominator), K1=0.01 K2=0.03.
* MS-SSIM       — JM/lencod/src/img_dist_ms_ssim.c:279 `compute_ms_ssim`:
                  5 levels, exponents BETA0..4 (:31-35); per level the
                  *structural* term (2*cov+C2)/(varO+varE+C2) (:40), with the
                  luminance term (2*muO*muE+C1)/(muO^2+muE^2+C1) (:106)
                  applied once at the coarsest level; dyadic downsampling by
                  the separable [1 3 28 28 3 1]/64 filter with symmetric
                  edge extension (:225 `downsample`).

All window statistics are computed from integral images so every window is
one O(1) gather — the whole frame's window lattice evaluates as a handful of
vectorized ops (MXU/VPU friendly) instead of the reference's quadruple loop.
"""

from functools import partial

import jax
import jax.numpy as jnp

_K1, _K2 = 0.01, 0.03
_MS_SSIM_BETA = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def psnr(ref, enc, max_pel: int = 255):
    """PSNR in dB; FR/src/code.c:514 semantics (mean-squared error over plane)."""
    ref = jnp.asarray(ref, jnp.float32)
    enc = jnp.asarray(enc, jnp.float32)
    mse = jnp.mean((ref - enc) ** 2)
    return jnp.where(mse == 0, jnp.float32(99.99),
                     10.0 * jnp.log10(max_pel * max_pel / jnp.maximum(mse, 1e-12)))


def _integral(x):
    return jnp.cumsum(jnp.cumsum(
        jnp.pad(x, ((1, 0), (1, 0))), axis=0), axis=1)


def _window_sums(x, win_h, win_w, step):
    """Sum over every win_h x win_w window at stride `step` (top-left grid)."""
    ii = _integral(x)
    H, W = x.shape
    ys = jnp.arange(0, H - win_h + 1, step)
    xs = jnp.arange(0, W - win_w + 1, step)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    return (ii[yy + win_h, xx + win_w] - ii[yy, xx + win_w]
            - ii[yy + win_h, xx] + ii[yy, xx])


def _window_moments(ref, enc, win_h, win_w, step):
    ref = jnp.asarray(ref, jnp.float32)
    enc = jnp.asarray(enc, jnp.float32)
    n = float(win_h * win_w)
    ws = partial(_window_sums, win_h=win_h, win_w=win_w, step=step)
    s_o, s_e = ws(ref), ws(enc)
    s_oo, s_ee, s_oe = ws(ref * ref), ws(enc * enc), ws(ref * enc)
    mu_o, mu_e = s_o / n, s_e / n
    # biased variance: win_pixels denominator (img_dist_ssim.c:30-34 default)
    var_o = (s_oo - s_o * mu_o) / n
    var_e = (s_ee - s_e * mu_e) / n
    cov = (s_oe - s_o * mu_e) / n
    return mu_o, mu_e, var_o, var_e, cov


def ssim(ref, enc, max_pel: int = 255, win: int = 8, overlap: int = 8):
    """Mean SSIM over the window lattice (img_dist_ssim.c:22 `compute_ssim`)."""
    c1 = _K1 * _K1 * max_pel * max_pel
    c2 = _K2 * _K2 * max_pel * max_pel
    mu_o, mu_e, var_o, var_e, cov = _window_moments(ref, enc, win, win, overlap)
    num = (2.0 * mu_o * mu_e + c1) * (2.0 * cov + c2)
    den = (mu_o * mu_o + mu_e * mu_e + c1) * (var_o + var_e + c2)
    return jnp.mean(num / den)


def _structural(ref, enc, max_pel, win, overlap):
    """(2*cov+C2)/(varO+varE+C2) mean — img_dist_ms_ssim.c:40."""
    c2 = _K2 * _K2 * max_pel * max_pel
    _, _, var_o, var_e, cov = _window_moments(ref, enc, win, win, overlap)
    return jnp.mean((2.0 * cov + c2) / (var_o + var_e + c2))


def _luminance(ref, enc, max_pel, win, overlap):
    """(2*muO*muE+C1)/(muO^2+muE^2+C1) mean — img_dist_ms_ssim.c:106."""
    c1 = _K1 * _K1 * max_pel * max_pel
    mu_o, mu_e, _, _, _ = _window_moments(ref, enc, win, win, overlap)
    return jnp.mean((2.0 * mu_o * mu_e + c1) / (mu_o * mu_o + mu_e * mu_e + c1))


_DS_TAPS = jnp.asarray([1.0, 3.0, 28.0, 28.0, 3.0, 1.0]) / 64.0


def _downsample(x):
    """Dyadic 2x downsample, separable [1 3 28 28 3 1]/64, symmetric extension
    (img_dist_ms_ssim.c:225 `downsample`, integer >>6 done in float here)."""
    x = jnp.asarray(x, jnp.float32)

    def one_axis(v):                       # filter+decimate along last axis
        p = jnp.pad(v, ((0, 0), (2, 3)), mode="symmetric")
        w = v.shape[1] // 2
        pos = 2 * jnp.arange(w)[:, None] + jnp.arange(6)[None, :]
        return jnp.einsum("hwk,k->hw", p[:, pos], _DS_TAPS)

    x = one_axis(x)                        # horizontal
    x = one_axis(x.T).T                    # vertical
    return jnp.clip(jnp.round(x), 0, 255)


def ms_ssim(ref, enc, max_pel: int = 255, win: int = 8, overlap: int = 8,
            levels: int = 5):
    """Multi-scale SSIM, JM semantics (img_dist_ms_ssim.c:279).

    Product of per-level structural terms ** BETA[m], times the luminance
    term ** BETA[last] evaluated at the coarsest level (:296-316).
    """
    ref = jnp.asarray(ref, jnp.float32)
    enc = jnp.asarray(enc, jnp.float32)
    out = jnp.float32(1.0)
    for m in range(levels):
        w = min(win, ref.shape[0], ref.shape[1])
        s = _structural(ref, enc, max_pel, w, min(overlap, w))
        out = out * jnp.abs(s) ** _MS_SSIM_BETA[m]
        if m == levels - 1:
            lum = _luminance(ref, enc, max_pel, w, min(overlap, w))
            out = out * jnp.abs(lum) ** _MS_SSIM_BETA[m]
        else:
            ref, enc = _downsample(ref), _downsample(enc)
    return out


def frame_metrics(ref_yuv, enc_yuv, max_pel: int = 255):
    """Per-plane PSNR/SSIM dict for one (Y,U,V) frame pair — the shape of
    JM's `find_distortion` report row (img_distortion.c:95)."""
    names = ("y", "u", "v")
    out = {}
    for name, r, e in zip(names, ref_yuv, enc_yuv):
        out[f"psnr_{name}"] = float(psnr(r, e, max_pel))
        out[f"ssim_{name}"] = float(ssim(r, e, max_pel))
    return out
