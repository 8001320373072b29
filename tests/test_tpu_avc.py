"""TPU-resident conformant AVC encoder: round trips + native twins.

The device graph runs on the CPU backend here (conftest forces
jax_platforms=cpu); the real-chip run is covered by bench.py and the
driver.  The conformance oracle is our independent AVCDecoder (itself
ldecod-verified in test_avc_conformance) — encoder-side recon must equal
decoded output bit-exactly for every config.
"""

import numpy as np
import pytest

from h264tpu.avc.params import AVCParams, SLICE_I, SLICE_P
from h264tpu.avc.codec import AVCCodec
from h264tpu.avc.tpu_codec import TPUAVCCodec


@pytest.fixture(scope="module")
def frames3(foreman_qcif):
    return [foreman_qcif.read(i) for i in range(3)]


def _roundtrip(codec, frames):
    results, stream = codec.encode_sequence(frames)
    dec, _ = AVCCodec.decode_sequence(stream)
    assert len(dec) == len(frames)
    for i, fr in enumerate(dec):
        for c in range(3):
            assert np.array_equal(fr[c], results[i].recon[c]), (i, c)
    return results, stream


def test_ippp_roundtrip(frames3):
    p = AVCParams(width=176, height=144, qp=30)
    res, _ = _roundtrip(TPUAVCCodec(p, intra_period=0, search_range=8),
                        frames3)
    assert res[0].frame_type == "IDR" and res[1].frame_type == "P"
    assert all(r.psnr_y > 32 for r in res)


def test_multiref_forced_intra_roundtrip(frames3):
    p = AVCParams(width=176, height=144, qp=27, num_ref_frames=3,
                  deblock=False)

    def fim(idx):
        m = np.zeros((9, 11), bool)
        if idx == 2:
            m[3] = True
        return m

    codec = TPUAVCCodec(p, intra_period=0, search_range=8)
    results, stream = codec.encode_sequence(frames3, force_intra=fim)
    dec, _ = AVCCodec.decode_sequence(stream)
    for i, fr in enumerate(dec):
        for c in range(3):
            assert np.array_equal(fr[c], results[i].recon[c]), (i, c)


@pytest.mark.parametrize("n_slices", [3, 9])
def test_multislice_roundtrip(frames3, n_slices):
    """Slice-parallel encode (vmap over row bands) -> multi-slice decode."""
    p = AVCParams(width=176, height=144, qp=32, num_ref_frames=2)
    codec = TPUAVCCodec(p, intra_period=2, search_range=8,
                        n_slices=n_slices)
    res, stream = _roundtrip(codec, frames3)
    assert all(r.psnr_y > 30 for r in res)


def test_native_pack_matches_python(frames3):
    """C slice packer must be byte-identical to the Python twin."""
    import jax
    import jax.numpy as jnp
    from h264tpu.avc import tpu_enc as TE, pack as PK
    from h264tpu.avc import native as AN
    if not AN.available():
        pytest.skip("native toolchain unavailable")
    import functools
    prep = functools.partial(jax.jit, static_argnames="sr")(TE.prep_ref)
    f0, f1 = frames3[0], frames3[1]
    qp, sr, mb_h, mb_w = 30, 8, 9, 11
    rec0 = tuple(jnp.asarray(np.asarray(pl).astype(np.int32)) for pl in f0)
    up, uu, vv = prep(*rec0, sr=sr)
    y, u, v = (jnp.asarray(np.asarray(pl).astype(np.int32)) for pl in f1)
    nf = jnp.zeros((mb_h, mb_w), bool)
    p = AVCParams(width=176, height=144, qp=qp)
    sym, _, _ = TE.encode_frame(y, u, v, up[None], uu[None], vv[None],
                                jnp.int32(qp), jnp.int32(1), nf,
                                mb_h=mb_h, mb_w=mb_w, sr=sr,
                                intra_only=False, n_slices=3)
    sym = jax.device_get(sym)
    for s0 in range(3):
        py_rbsp = PK.pack_p_slice(sym, p, qp, 1, 1, row0=s0 * 3, n_rows=3)
        c_rbsp = AN.pack_slice(sym, p, SLICE_P, qp, 1, False, 0, 1,
                               row0=s0 * 3, n_rows=3)
        assert py_rbsp == c_rbsp, s0


def test_native_deblock_matches_python(frames3):
    from h264tpu.avc.deblock import DeblockContext, deblock_frame
    from h264tpu.avc import native as AN
    if not AN.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(3)
    mb_w, mb_h = 11, 9
    y = rng.integers(0, 256, (144, 176)).astype(np.int64)
    u = rng.integers(0, 256, (72, 88)).astype(np.int64)
    v = rng.integers(0, 256, (72, 88)).astype(np.int64)
    ctx = DeblockContext(mb_w, mb_h, 30)
    ctx.mb_intra = rng.integers(0, 2, (mb_h, mb_w)).astype(bool)
    ctx.nnz = rng.integers(0, 3, (mb_h * 4, mb_w * 4)).astype(np.int64)
    ctx.mv = rng.integers(-20, 20, (mb_h * 4, mb_w * 4, 2)).astype(np.int64)
    ctx.ref = rng.integers(0, 2, (mb_h * 4, mb_w * 4)).astype(np.int64)
    ry, ru, rv = deblock_frame(y.copy(), u.copy(), v.copy(), ctx)
    cy, cu, cv = AN.deblock_frame(y, u, v, ctx)
    assert np.array_equal(ry, cy)
    assert np.array_equal(ru, cu)
    assert np.array_equal(rv, cv)


def test_cabac_roundtrip_own_decoder(frames3):
    """CABAC (Main profile) encode on the device graph -> our own CABAC
    decoder reproduces the encoder recon bit-exactly."""
    p = AVCParams(width=176, height=144, qp=30, profile_idc=77, cabac=True,
                  num_ref_frames=2)
    codec = TPUAVCCodec(p, intra_period=0, search_range=8)
    results, stream = codec.encode_sequence(frames3)
    dec, _ = AVCCodec.decode_sequence(stream)
    for i, fr in enumerate(dec):
        for c in range(3):
            assert np.array_equal(fr[c], results[i].recon[c]), (i, c)


def test_cabac_bits_beat_cavlc(frames3):
    pc = AVCParams(width=176, height=144, qp=30, profile_idc=77, cabac=True)
    pv = AVCParams(width=176, height=144, qp=30)
    rc, _ = TPUAVCCodec(pc, intra_period=0,
                        search_range=8).encode_sequence(frames3)
    rv, _ = TPUAVCCodec(pv, intra_period=0,
                        search_range=8).encode_sequence(frames3)
    cab = sum(r.bits for r in rc)
    cav = sum(r.bits for r in rv)
    assert cab < cav, (cab, cav)
    # identical decisions -> identical recon; only entropy coding differs
    for qc, qv in zip(rc, rv):
        assert np.array_equal(qc.recon[0], qv.recon[0])


def test_b_slices_roundtrip(frames3):
    """IbbP GOP (spatial direct, bipred, disposable Bs) round trips in our
    own decoder with POC display-order output."""
    import numpy as np
    f = frames3 + [tuple(np.roll(pl, (1, -2), (0, 1)) for pl in frames3[2])]
    p = AVCParams(width=176, height=144, qp=30, profile_idc=77, poc_type=0,
                  num_ref_frames=2)
    codec = AVCCodec(p, intra_period=0, search_range=8, bframes=2,
                     use_satd=False)
    res, stream = codec.encode_sequence(f)
    assert [q.frame_type for q in res] == ["IDR", "B", "B", "P"]
    dec, _ = AVCCodec.decode_sequence(stream)
    for i, fr in enumerate(dec):
        for c in range(3):
            assert np.array_equal(fr[c], res[i].recon[c]), (i, c)


def test_mesh_sharded_encode_byte_identical(frames3):
    """N-way mesh-sharded AVC encode == 1-device encode, byte for byte
    (SURVEY §2.3 MB-tile axis / BASELINE config 4 'sharded across chips').

    Row-band slices are the standard's own shard boundary: contexts reset
    per slice, each band's reference view carries its own search halo, so
    distributing bands over a mesh must not change a single bit."""
    import jax
    from jax.sharding import Mesh

    p = AVCParams(width=176, height=144, qp=30)
    base = TPUAVCCodec(p, intra_period=0, search_range=8, n_slices=3)
    r1, s1 = base.encode_sequence(frames3)
    mesh = Mesh(np.array(jax.devices()[:3]), ("slice",))
    sharded = TPUAVCCodec(p, intra_period=0, search_range=8, n_slices=3,
                          mesh=mesh)
    r2, s2 = sharded.encode_sequence(frames3)
    assert s1 == s2
    assert all(a.bits == b.bits for a, b in zip(r1, r2))


def test_avc_rate_control(foreman_qcif):
    """Quadratic RC drives per-frame QP on the AVC device path (traced
    scalar, no recompiles); total bits land near target and the stream
    stays self-decode bit-exact (VERDICT round-3 item 9)."""
    from h264tpu.models.ratectl import QuadraticRateControl

    base = [foreman_qcif.read(i) for i in range(3)]
    frames = []
    for i in range(8):
        s = (i * 2) % 5
        frames.append(tuple(np.roll(pl, (s, -s), (0, 1))
                            for pl in base[i % 3]))
    p = AVCParams(width=176, height=144, qp=30)
    target_bps = 40000 * 30 / 8      # bits/frame target 40k at 30 fps -> bps
    rc = QuadraticRateControl(target_bps=150000.0, frame_rate=30.0,
                              qp_init=30)
    codec = TPUAVCCodec(p, intra_period=0, search_range=8, n_slices=3)
    res, stream = codec.encode_sequence(frames, rate_control=rc)
    _roundtrip_check = AVCCodec.decode_sequence(stream)[0]
    for i, fr in enumerate(_roundtrip_check):
        for c in range(3):
            assert np.array_equal(fr[c], res[i].recon[c]), (i, c)
    # non-IDR frames should land within 40% of the per-frame budget on
    # average (short sequence, coarse model; JM tolerance is looser)
    pbits = [r.bits for r in res[1:]]
    avg = sum(pbits) / len(pbits)
    budget = 150000.0 / 30.0
    assert 0.4 * budget < avg < 1.9 * budget, (avg, budget)
    qps = rc.prev_qp
    assert 1 <= qps <= 51


def test_mesh_sharded_hierarchical_b_byte_identical(foreman_qcif):
    """BASELINE config 4 end to end at test scale: hierarchical-B CABAC
    with BOTH anchors and B pictures mesh-sharded — byte-identical to
    the single-device encode."""
    import jax
    from jax.sharding import Mesh

    base = [foreman_qcif.read(i) for i in range(3)]
    frames = [tuple(np.roll(pl, ((i * 2) % 6, -((i * 2) % 6)), (0, 1))
                    for pl in base[i % 3]) for i in range(5)]
    p = AVCParams(width=176, height=144, qp=30, profile_idc=77,
                  poc_type=0, num_ref_frames=3, cabac=True)
    c1 = TPUAVCCodec(p, intra_period=0, search_range=8, n_slices=3,
                     bframes=3, hierarchical=True)
    r1, s1 = c1.encode_sequence(frames)
    mesh = Mesh(np.array(jax.devices()[:3]), ("slice",))
    c2 = TPUAVCCodec(p, intra_period=0, search_range=8, n_slices=3,
                     bframes=3, hierarchical=True, mesh=mesh)
    r2, s2 = c2.encode_sequence(frames)
    assert s1 == s2


def test_avc_rate_control_basic_unit(foreman_qcif):
    """RCUpdateMode 3: basic-unit RC on the device path — each row-band
    slice is a basic unit carrying its own QP (slice_qp_delta, traced
    per-slice QP vector, rc_quadratic.c basic-unit layer).  The stream
    must stay self-decode bit-exact (per-slice QP flows through residual
    quant, the packers AND the per-MB-QP deblock average)."""
    from h264tpu.models.ratectl import QuadraticRateControl

    base = [foreman_qcif.read(i) for i in range(3)]
    frames = []
    for i in range(8):
        s = (i * 2) % 5
        frames.append(tuple(np.roll(pl, (s, -s), (0, 1))
                            for pl in base[i % 3]))
    # make the bands' activity differ strongly so per-BU QPs split:
    # flatten the top third of every frame
    for i in range(8):
        y, u, v = (np.array(pl) for pl in frames[i])
        y[:48] = 128
        frames[i] = (y, u, v)
    p = AVCParams(width=176, height=144, qp=30)
    rc = QuadraticRateControl(target_bps=150000.0, frame_rate=30.0,
                              qp_init=30, rc_mode=3, basic_units=3)
    codec = TPUAVCCodec(p, intra_period=0, search_range=8, n_slices=3)
    res, stream = codec.encode_sequence(frames, rate_control=rc)
    dec = AVCCodec.decode_sequence(stream)[0]
    for i, fr in enumerate(dec):
        for c in range(3):
            assert np.array_equal(fr[c], res[i].recon[c]), (i, c)
    # the controller saw per-unit MADs and produced a split QP at least
    # once (the flat band must not pay the busy bands' QP)
    assert rc.bu_mads is not None and rc.bu_mads[0] < rc.bu_mads[-1]
    qps = rc.basic_unit_qps(3)
    assert qps[0] <= qps[-1]
    pbits = [r.bits for r in res[1:]]
    avg = sum(pbits) / len(pbits)
    budget = 150000.0 / 30.0
    assert 0.3 * budget < avg < 2.0 * budget, (avg, budget)
