"""Error-resilience tests (SURVEY F21): FMO maps, intra refresh, leaky bucket."""

import numpy as np
import pytest

from h264tpu.models import resilience as rs

W, H = 11, 9  # QCIF MB grid


def _check_partition(m, num_groups):
    assert m.shape == (H, W)
    assert m.min() >= 0 and m.max() < num_groups
    order = rs.mb_scan_order(m)
    allmb = np.sort(np.concatenate(order))
    np.testing.assert_array_equal(allmb, np.arange(H * W))


def test_type0_interleaved():
    m = rs.slice_group_map(0, 3, W, H, run_lengths=[4, 2, 3])
    _check_partition(m, 3)
    flat = m.reshape(-1)
    assert list(flat[:9]) == [0, 0, 0, 0, 1, 1, 2, 2, 2]


def test_type1_dispersed():
    m = rs.slice_group_map(1, 4, W, H)
    _check_partition(m, 4)
    idx = np.arange(H * W)
    want = ((idx % W) + ((idx // W) * 4) // 2) % 4
    np.testing.assert_array_equal(m.reshape(-1), want)


def test_type2_foreground():
    # one foreground rectangle (MB 13 .. MB 36 => rows 1-3, cols 2-3), rest leftover
    m = rs.slice_group_map(2, 2, W, H, top_left=[1 * W + 2],
                           bottom_right=[3 * W + 3])
    _check_partition(m, 2)
    assert (m[1:4, 2:4] == 0).all()
    assert m[0, 0] == 1 and m[-1, -1] == 1
    assert (m == 0).sum() == 3 * 2


@pytest.mark.parametrize("direction", [0, 1])
def test_type3_boxout(direction):
    cyc = 10
    m = rs.slice_group_map(3, 2, W, H, change_direction=direction,
                           change_rate=2, change_cycle=cyc)
    _check_partition(m, 2)
    assert (m == 0).sum() == 2 * cyc
    # group 0 grows around the center
    assert m[H // 2, W // 2 - direction] == 0


@pytest.mark.parametrize("direction", [0, 1])
def test_type4_raster(direction):
    m = rs.slice_group_map(4, 2, W, H, change_direction=direction,
                           change_rate=3, change_cycle=5)
    _check_partition(m, 2)
    flat = m.reshape(-1)
    n0 = 15
    if direction == 0:
        assert (flat[:n0] == 0).all() and (flat[n0:] == 1).all()
    else:
        assert (flat[:H * W - n0] == 1).all() and (flat[H * W - n0:] == 0).all()


def test_type5_wipe():
    m = rs.slice_group_map(5, 2, W, H, change_direction=0,
                           change_rate=2, change_cycle=7)
    _check_partition(m, 2)
    assert (m == 0).sum() == 14
    # column-major fill: first full column is group 0
    assert (m[:, 0] == 0).all()


def test_type6_explicit():
    explicit = np.arange(H * W) % 3
    m = rs.slice_group_map(6, 3, W, H, explicit_map=explicit)
    _check_partition(m, 3)
    np.testing.assert_array_equal(m.reshape(-1), explicit)


def test_random_intra_refresh_full_coverage():
    r = rs.RandomIntraRefresh(W, H, refresh=7)
    seen = []
    pics = int(np.ceil(H * W / 7))
    for _ in range(pics):
        mbs = r.new_picture()
        assert len(mbs) == 7
        seen.extend(mbs.tolist())
    # one full cycle covers every MB at least once
    assert set(seen[:H * W]) == set(range(H * W))
    assert r.is_intra(int(r.current[0]))
    mask = r.intra_mask(H, W)
    assert mask.sum() == 7


def test_leaky_bucket_feasible_and_minimal():
    rng = np.random.default_rng(0)
    bits = rng.integers(5_000, 80_000, 60)
    bits[0] = 200_000  # big I frame
    params = rs.leaky_bucket_params(bits, 4, frame_rate=30.0)
    assert len(params) == 4
    rates = [p[0] for p in params]
    assert rates == sorted(rates)
    for R, B, F in params:
        assert 0 < F <= B
        assert rs.verify_leaky_bucket(bits, R, B, F, 30.0)
        # B is tight: a much smaller buffer must fail
        assert not rs.verify_leaky_bucket(bits, R, B // 2, min(F, B // 2), 30.0)
