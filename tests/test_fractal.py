"""Golden tests for the fractal engine against an independent scalar oracle.

The oracle re-implements the reference algorithm (spiral full search with
closed-form float64 α/β fit, QUAN_A quantization, quadtree descent) with
straightforward per-block numpy loops — the batched JAX lattice evaluation
must agree.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from h264tpu.ops import fractal as F


def jit_search(**kw):
    return jax.jit(functools.partial(F.search_plane, **kw))


# ----------------------------------------------------------------------------
# Scalar oracle
# ----------------------------------------------------------------------------

def oracle_quan_a(x):
    x = int(x)
    c = int(abs(x) // 10) * (1 if x >= 0 else -1)
    b = x - c * 10
    if 2 < b < 8:
        b = 5
    elif b > 7:
        b = 0
        c += 1
    else:
        b = 0
    return c * 10 + b


def oracle_fit_rms(r, d):
    """Float64 fit exactly as compute_rms (FR/src/compute.c:6) on blocks r, d."""
    n = r.size
    sr, sd = float(r.sum()), float(d.sum())
    sr2, sd2 = float((r.astype(np.int64) ** 2).sum()), float((d.astype(np.int64) ** 2).sum())
    srd = float((r.astype(np.int64) * d.astype(np.int64)).sum())
    det = n * sd2 - sd * sd
    alpha = 0.0 if det == 0.0 else (n * srd - sr * sd) / det
    a = oracle_quan_a(int(alpha * 100.0))
    if det == 0.0:
        a = 0
    beta = oracle_quan_a(int(sr / n))
    if not (-235 <= a <= 400) or not (-60 <= beta <= 255):
        return a, beta, 1e30
    aq = a / 100.0
    mt = beta - aq * sd / n
    rms = sr2 + aq * (aq * sd2 - 2 * srd + 2 * mt * sd) + mt * (mt * n - 2 * sr)
    return a, beta, rms


def oracle_search(org, ref, bx, by, bw, bh, sr):
    """Spiral full search for one block; returns (rms, dx, dy, a, beta)."""
    H, W = org.shape
    r = org[by:by + bh, bx:bx + bw]
    best = (1e30, 0, 0, 0, 0)
    first = True
    for dx, dy in F.spiral_offsets(sr):
        m, n_ = bx + dx, by + dy
        if not (0 <= m <= W - bw and 0 <= n_ <= H - bh):
            continue
        d = ref[n_:n_ + bh, m:m + bw]
        a, beta, rms = oracle_fit_rms(r.astype(np.int64), d.astype(np.int64))
        if first or rms < best[0]:
            best = (rms, dx, dy, a, beta)
        first = False
    return best


def oracle_multi_ref(org, refs, bx, by, bw, bh, sr):
    best = None
    for ri, ref in enumerate(refs):
        rms, dx, dy, a, beta = oracle_search(org, ref, bx, by, bw, bh, sr)
        if best is None or rms < best[0]:
            best = (rms, dx, dy, a, beta, ri)
    return best


def make_frames(rng, h, w):
    """Correlated frame pair: ref + motion + noise, like real video."""
    base = rng.integers(0, 256, size=(h + 8, w + 8)).astype(np.float64)
    # smooth it so blocks have structure
    k = np.ones((5, 5)) / 25.0
    from numpy.lib.stride_tricks import sliding_window_view
    sm = sliding_window_view(np.pad(base, 2, mode="edge"), (5, 5))
    base = (sm * k).sum(axis=(2, 3))
    ref = np.clip(base[:h, :w], 0, 255).astype(np.uint8)
    org = np.clip(base[3:3 + h, 2:2 + w] * 0.9 + 12 +
                  rng.normal(0, 4, size=(h, w)), 0, 255).astype(np.uint8)
    return org, ref


def test_quan_a_matches_oracle():
    xs = np.arange(-260, 420, dtype=np.int32)
    got = np.asarray(F.quan_a(jnp.asarray(xs)))
    want = np.array([oracle_quan_a(int(v)) for v in xs])
    np.testing.assert_array_equal(got, want)


def test_halfpel_planes():
    rng = np.random.default_rng(7)
    ref = rng.integers(0, 256, size=(16, 16)).astype(np.int32)
    h, m, n = F.halfpel_planes(jnp.asarray(ref))
    h, m, n = np.asarray(h), np.asarray(m), np.asarray(n)
    assert h[3, 4] == (ref[3, 4] + ref[3, 5]) // 2
    assert h[3, 15] == ref[3, 15]
    assert m[4, 3] == (ref[4, 3] + ref[5, 3]) // 2
    assert m[15, 3] == ref[15, 3]
    assert n[2, 2] == (ref[2, 2] + ref[3, 2] + ref[2, 3] + ref[3, 3]) // 4
    # edge-replication semantics at frame borders (shard-invariant choice)
    assert n[15, 5] == (2 * ref[15, 5] + 2 * ref[15, 6]) // 4
    assert n[5, 15] == (2 * ref[5, 15] + 2 * ref[6, 15]) // 4


def test_window_sums_exact():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 256, size=(24, 40)).astype(np.int64)
    ii = F.integral_image(jnp.asarray(x))
    for (h, w) in [(4, 4), (8, 4), (16, 16)]:
        s = np.asarray(F.window_sums(ii, h, w))
        for y in range(0, 24 - h + 1, 5):
            for xx in range(0, 40 - w + 1, 7):
                assert s[y, xx] == x[y:y + h, xx:xx + w].sum()


def test_spiral_offsets_structure():
    offs = F.spiral_offsets(2)
    assert offs.shape == (25, 2)
    assert tuple(offs[0]) == (0, 0)
    # ring 1 visit order from the reference scan
    assert [tuple(o) for o in offs[1:9]] == [
        (-1, -1), (0, -1), (1, -1), (1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0)]
    # every offset appears exactly once
    assert len({tuple(o) for o in offs}) == 25


@pytest.mark.parametrize("use_halfpel", [False, True])
def test_search_matches_oracle(rng, use_halfpel):
    H, W, SR = 32, 48, 3
    org, ref = make_frames(rng, H, W)
    tree = jit_search(search_range=SR, tol16=10.5, tol8=8.0,
                      use_halfpel=use_halfpel)(
        jnp.asarray(org, jnp.int32), jnp.asarray(ref, jnp.int32))

    refs = [ref.astype(np.int64)]
    if use_halfpel:
        h, m, n = (np.asarray(p) for p in F.halfpel_planes(jnp.asarray(ref, jnp.int32)))
        refs += [h, m, n]

    mismatch = 0
    total = 0
    for (bw, bh), sb in [((16, 16), tree.s16), ((8, 8), tree.s8),
                         ((8, 4), tree.s84), ((4, 8), tree.s48), ((4, 4), tree.s44)]:
        nby, nbx = H // bh, W // bw
        for iy in range(nby):
            for ix in range(nbx):
                rms, dx, dy, a, beta, ri = oracle_multi_ref(
                    org, refs, ix * bw, iy * bh, bw, bh, SR)
                got = (int(sb.dx[iy, ix]), int(sb.dy[iy, ix]), int(sb.a[iy, ix]),
                       int(sb.beta[iy, ix]), int(sb.ref[iy, ix]))
                total += 1
                if got != (dx, dy, a, beta, ri):
                    mismatch += 1
                    # rms must still be essentially as good (f32 boundary tie)
                    assert abs(float(sb.rms[iy, ix]) - rms) <= max(2e-4 * abs(rms), 1.0), (
                        (bw, bh, iy, ix, got, (dx, dy, a, beta, ri),
                         float(sb.rms[iy, ix]), rms))
    # near-boundary f32-vs-f64 flips must be rare
    assert mismatch <= max(1, total // 100), f"{mismatch}/{total} mismatches"


def test_reconstruct_matches_formula(rng):
    """Integer reconstruction == float64 bound(0.5 + α·d + β − α·mean) formula."""
    H, W, SR = 32, 32, 2
    org, ref = make_frames(rng, H, W)
    tree = jit_search(search_range=SR, tol16=10.5, tol8=8.0, use_halfpel=True)(
        jnp.asarray(org, jnp.int32), jnp.asarray(ref, jnp.int32))
    rec = np.asarray(jax.jit(functools.partial(
        F.reconstruct_plane, H=H, W=W, use_halfpel=True))(tree, jnp.asarray(ref, jnp.int32)))

    maps = {k: np.asarray(v) for k, v in F.leaf_maps(tree, H, W).items()}
    refs = [ref.astype(np.float64)]
    h, m, n = (np.asarray(p) for p in F.halfpel_planes(jnp.asarray(ref, jnp.int32)))
    refs += [h.astype(np.float64), m.astype(np.float64), n.astype(np.float64)]

    for y in range(H):
        for x in range(W):
            cy, cx = y // 4, x // 4
            a = maps["a"][cy, cx] / 100.0
            beta = float(maps["beta"][cy, cx])
            bh, bw = F.SHAPES[maps["shape"][cy, cx]]
            nn = bh * bw
            oy, ox = y - y % bh, x - x % bw
            dy, dx = maps["dy"][cy, cx], maps["dx"][cy, cx]
            dom = refs[maps["ref"][cy, cx]][oy + dy:oy + dy + bh, ox + dx:ox + dx + bw]
            mean_d = dom.sum() / nn
            d = refs[maps["ref"][cy, cx]][y + dy, x + dx]
            v = 0.5 + a * d + beta - a * mean_d
            want = int(min(255.0, max(0.0, v)))
            assert rec[y, x] == want, (y, x, rec[y, x], want, v)


def test_recon_improves_over_copy(rng):
    """Fractal prediction must beat plain frame-copy on correlated frames."""
    H, W = 64, 64
    org, ref = make_frames(rng, H, W)
    tree = jit_search(search_range=4, tol16=10.5, tol8=8.0, use_halfpel=True)(
        jnp.asarray(org, jnp.int32), jnp.asarray(ref, jnp.int32))
    rec = np.asarray(jax.jit(functools.partial(
        F.reconstruct_plane, H=H, W=W))(tree, jnp.asarray(ref, jnp.int32)))
    err_fract = np.mean((rec.astype(np.float64) - org) ** 2)
    err_copy = np.mean((ref.astype(np.float64) - org) ** 2)
    assert err_fract < err_copy * 0.5, (err_fract, err_copy)


# ---------------------------------------------------------------------------
# Search-mode candidate lattices (F7: hex / new-hex / UMHex)
# ---------------------------------------------------------------------------

def test_candidate_offsets_modes():
    from h264tpu.ops.fractal import candidate_offsets, spiral_offsets
    sr = 7
    full = candidate_offsets(sr, 0)
    np.testing.assert_array_equal(full, spiral_offsets(sr))
    for mode in (1, 2, 3):
        sub = candidate_offsets(sr, mode)
        # proper subset of the full window, center first, unique points
        assert tuple(sub[0]) == (0, 0)
        assert len({(int(x), int(y)) for x, y in sub}) == len(sub)
        assert len(sub) < len(full)
        assert np.abs(sub).max() <= sr
        # dense core always present
        pts = {(int(x), int(y)) for x, y in sub}
        for d in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            assert d in pts
        # subset preserves spiral (priority) order
        order = {(int(x), int(y)): i for i, (x, y) in enumerate(full)}
        pri = [order[(int(x), int(y))] for x, y in sub]
        assert pri == sorted(pri)


@pytest.mark.parametrize("mode", [1, 2, 3])
def test_search_mode_roundtrip(foreman_qcif, mode):
    """Every search mode must yield a decodable stream with near-full quality
    (the lattice covers fewer candidates, so PSNR may dip slightly)."""
    from h264tpu.utils.config import CodecConfig, FractalConfig, SearchMode
    from h264tpu.models.fractal_codec import FractalCodec, FractalDecoder
    cfg = CodecConfig(width=176, height=144, qp=28, intra_period=12,
                      fractal=FractalConfig(search_range=4,
                                            search_mode=SearchMode(mode)))
    codec = FractalCodec(cfg)
    frames = [foreman_qcif.read(i) for i in range(2)]
    results, stream = codec.encode_sequence(frames)
    assert results[1].frame_type == "P" and results[1].psnr_y > 30.0
    dec = FractalDecoder()
    drec = dec.decode(stream)
    for r, d in zip(results, drec):
        for p in range(3):
            np.testing.assert_array_equal(r.recon[p], d[p])


def test_search_impls_agree(rng):
    """The three search implementations (lax.scan / wide static XLA /
    Pallas kernel in interpret mode) pick identical candidates; rms may
    differ in f32 LSBs (fusion order), parameters must be exact."""
    import numpy as np
    import jax.numpy as jnp
    from h264tpu.ops import fractal as F

    org = jnp.asarray(rng.integers(0, 256, (96, 128)), jnp.int32)
    ref = jnp.asarray(rng.integers(0, 256, (96, 128)), jnp.int32)
    kw = dict(search_range=4, tol16=10.5, tol8=8.0, cross_chunk=32)
    t_scan = F.search_plane(org, ref, impl="scan", **kw)
    t_wide = F.search_plane(org, ref, impl="wide", **kw)
    t_pal = F.search_plane(org, ref, impl="pallas", interpret=True, **kw)
    for other in (t_wide, t_pal):
        for s in ("s16", "s8", "s84", "s48", "s44"):
            a, b = getattr(t_scan, s), getattr(other, s)
            for f in ("a", "beta", "dx", "dy", "ref", "s_d"):
                np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                              np.asarray(getattr(b, f)))
            np.testing.assert_allclose(np.asarray(a.rms),
                                       np.asarray(b.rms), rtol=1e-4)
