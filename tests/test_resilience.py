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


def test_redundant_slices(foreman_qcif):
    """Redundant coded slices (spec 7.4.3 redundant_pic_cnt; JM
    RedundantPicture): every P picture is followed by a coarser
    stand-alone re-encode marked redundant_pic_cnt=1.  With the primary
    intact the decoder must discard the redundancy (recon bit-exact to
    the encoder); with a primary P slice NAL dropped, the redundant copy
    stands in and keeps the frame close to the source."""
    from h264tpu.avc.params import AVCParams
    from h264tpu.avc.codec import AVCCodec

    frames = [foreman_qcif.read(i % 3) for i in range(4)]
    p = AVCParams(width=176, height=144, qp=28, redundant_slices=True,
                  redundant_qp_offset=4)
    codec = AVCCodec(p, intra_period=0, search_range=8)
    res, stream = codec.encode_sequence(frames)

    # intact stream: redundancy is transparent
    dec = AVCCodec.decode_sequence(stream)[0]
    assert len(dec) == 4
    for i, fr in enumerate(dec):
        for c in range(3):
            assert np.array_equal(fr[c], res[i].recon[c]), (i, c)

    # drop the PRIMARY P slice of display frame 2 (slice NALs alternate
    # primary/redundant after the IDR): type-1 NALs are
    # [P1, P1r, P2, P2r, P3, P3r] -> drop index 2.  Slices carry 3-byte
    # start codes (annexb_write); splitting/rejoining on 00 00 01 keeps
    # the 4-byte codes' extra zero glued to the previous part.
    parts = stream.split(b"\x00\x00\x01")
    seen = 0
    kept = [parts[0]]
    for nal in parts[1:]:
        if (nal[0] & 0x1F) == 1:
            if seen == 2:
                seen += 1
                continue            # dropped primary
            seen += 1
        kept.append(nal)
    assert seen == 6, seen          # all slice NALs seen, one dropped
    lossy = b"\x00\x00\x01".join(kept)
    dec2 = AVCCodec.decode_sequence(lossy)[0]
    assert len(dec2) == 4
    # frames 0/1 unaffected
    for i in (0, 1):
        for c in range(3):
            assert np.array_equal(dec2[i][c], res[i].recon[c])
    # frame 2 now comes from the coarser redundant coding: not the
    # primary recon, but still a faithful approximation of the source
    assert not np.array_equal(dec2[2][0], res[2].recon[0])
    src = np.asarray(frames[2][0], np.float64)
    mse = ((src - dec2[2][0]) ** 2).mean()
    psnr = 10 * np.log10(255.0 ** 2 / mse)
    assert psnr > 30.0, psnr
