"""Conformance of the standard-H.264 path against JM 18.5 ldecod.

The oracle is the real JM 18.5 decoder built from the reference checkout
(tools/build_jm.sh).  Criteria (VERDICT round-1 item 1 / SURVEY §4(b)):
our Annex-B stream must decode in ldecod with output YUV BIT-EXACT equal to
our encoder-side reconstruction, and PSNR/bitrate must be within 5% of
lencod on BASELINE config 1 (foreman QCIF all-intra).
"""

import os
import subprocess

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JM_BIN = os.path.join(REPO, ".jm", "JM", "bin")
LDECOD = os.path.join(JM_BIN, "ldecod.exe")
LENCOD = os.path.join(JM_BIN, "lencod.exe")


@pytest.fixture(scope="session")
def jm_tools():
    if not (os.path.exists(LDECOD) and os.path.exists(LENCOD)):
        r = subprocess.run(["sh", os.path.join(REPO, "tools", "build_jm.sh")],
                           capture_output=True, text=True)
        if r.returncode != 0:
            pytest.skip(f"JM oracle build failed: {r.stderr[-400:]}")
    return JM_BIN


def ldecod_decode(tmp_path, stream: bytes) -> bytes:
    b264 = tmp_path / "t.264"
    byuv = tmp_path / "t_dec.yuv"
    b264.write_bytes(stream)
    r = subprocess.run([LDECOD, "-p", f"InputFile={b264}",
                        "-p", f"OutputFile={byuv}"],
                       capture_output=True, text=True, cwd=tmp_path,
                       timeout=120)
    assert r.returncode == 0, r.stdout[-800:] + r.stderr[-400:]
    return byuv.read_bytes()


def encode_intra_frames(frames, qp, deblock=True):
    from h264tpu.avc.params import AVCParams, assemble_stream
    from h264tpu.avc.slice_enc import encode_i_frame
    from h264tpu.avc.deblock import DeblockContext, deblock_frame

    p = AVCParams(width=176, height=144, qp=qp, deblock=deblock)
    slices, recs, bits = [], [], 0
    for i, (y, u, v) in enumerate(frames):
        rbsp, rec, stats = encode_i_frame((y, u, v), p, frame_num=0,
                                          idr=True, idr_pic_id=i)
        if deblock:
            rec = deblock_frame(*rec, DeblockContext(p.mb_w, p.mb_h, qp))
        recs.append(rec)
        slices.append((True, rbsp))
        bits += stats["bits"]
    return assemble_stream(p, slices), recs, bits


def recon_bytes(recs) -> bytes:
    out = bytearray()
    for fr in recs:
        for pl in fr:
            out += np.asarray(pl, np.uint8).tobytes()
    return bytes(out)


def psnr(a, b):
    mse = ((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2).mean()
    return 10 * np.log10(255.0 ** 2 / mse)


@pytest.mark.parametrize("qp,deblock", [(28, True), (28, False), (36, True)])
def test_ldecod_bit_exact(jm_tools, foreman_qcif, tmp_path, qp, deblock):
    frames = [foreman_qcif.read(i) for i in range(2)]
    stream, recs, _ = encode_intra_frames(frames, qp, deblock)
    dec = ldecod_decode(tmp_path, stream)
    assert dec == recon_bytes(recs)


def test_parity_vs_lencod_baseline_config1(jm_tools, foreman_qcif, tmp_path):
    """BASELINE config 1: foreman QCIF all-intra CAVLC QP28 within 5% of JM."""
    frames = [foreman_qcif.read(i) for i in range(3)]
    stream, recs, _ = encode_intra_frames(frames, 28, deblock=True)

    # run lencod on the same 3 frames
    r = subprocess.run(
        [LENCOD, "-d", os.path.join(JM_BIN, "encoder_baseline.cfg"),
         "-p", f"InputFile={os.path.join(JM_BIN, 'foreman_part_qcif.yuv')}",
         "-p", "FramesToBeEncoded=3", "-p", "SourceWidth=176",
         "-p", "SourceHeight=144", "-p", "OutputWidth=176",
         "-p", "OutputHeight=144", "-p", "IntraPeriod=1", "-p", "IDRPeriod=1",
         "-p", "QPISlice=28", "-p", "SymbolMode=0", "-p", "OutFileMode=0",
         "-p", f"OutputFile={tmp_path/'jm.264'}",
         "-p", f"ReconFile={tmp_path/'jm_rec.yuv'}",
         "-p", "NumberReferenceFrames=1", "-p", "RDOptimization=1"],
        capture_output=True, text=True, cwd=tmp_path, timeout=300)
    assert r.returncode == 0, r.stdout[-800:]
    jm_bits = os.path.getsize(tmp_path / "jm.264") * 8

    our_bits = len(stream) * 8
    our_psnr = np.mean([psnr(fr[0], rec[0])
                        for fr, rec in zip(frames, recs)])
    jm_rec = np.frombuffer((tmp_path / "jm_rec.yuv").read_bytes(), np.uint8)
    n = 176 * 144
    jm_psnr = np.mean([psnr(frames[i][0],
                            jm_rec[i * n * 3 // 2:i * n * 3 // 2 + n]
                            .reshape(144, 176)) for i in range(3)])
    assert our_bits <= jm_bits * 1.05, (our_bits, jm_bits)
    assert our_psnr >= jm_psnr - 0.5, (our_psnr, jm_psnr)


def test_own_decoder_cavlc_block_roundtrip(rng):
    """avc.cavlc read_block inverts write_block for random blocks."""
    from h264tpu.entropy.bitio import BitWriter, BitReader
    from h264tpu.avc import cavlc as CV

    for max_coeff, nc in [(16, 0), (16, 1), (16, 5), (16, 9), (15, 3),
                          (4, -1)]:
        blocks = []
        w = BitWriter()
        for _ in range(200):
            zz = np.zeros(max_coeff, np.int64)
            nnz = rng.integers(0, max_coeff + 1)
            pos = rng.permutation(max_coeff)[:nnz]
            zz[pos] = rng.integers(-2000, 2000, nnz)
            # bias towards small trailing levels like real data
            if nnz and rng.random() < 0.7:
                zz[pos] = np.clip(zz[pos], -3, 3)
                zz[pos][zz[pos] == 0] = 1
            blocks.append(zz)
            CV.write_block(w, zz, nc, max_coeff)
        r = BitReader(w.to_bytes())
        for zz in blocks:
            got = CV.read_block(r, nc, max_coeff)
            assert np.array_equal(got, zz), (zz, got)


def encode_ippp(frames, qp, p=None, force_intra=None, num_ref=1,
                use_satd=False):
    from h264tpu.avc.params import AVCParams, assemble_stream
    from h264tpu.avc.slice_enc import encode_i_frame, encode_p_frame
    from h264tpu.avc.deblock import DeblockContext, deblock_frame
    from h264tpu.avc.inter import RefPlanes

    p = p or AVCParams(width=176, height=144, qp=qp, deblock=True,
                       num_ref_frames=num_ref)
    slices, recs, dpb = [], [], []
    stats_all = []
    for i, (y, u, v) in enumerate(frames):
        ctx = DeblockContext(p.mb_w, p.mb_h, qp)
        if i == 0:
            rbsp, rec, stats = encode_i_frame((y, u, v), p, frame_num=0,
                                              idr=True)
        else:
            fim = force_intra(i) if force_intra else None
            rbsp, rec, pctx, stats = encode_p_frame(
                (y, u, v), dpb, p, qp=qp, frame_num=i, force_intra_mask=fim,
                use_satd=use_satd)
            ctx.mb_intra = pctx["mb_intra"]
            ctx.nnz = pctx["nnz"]
            ctx.mv = pctx["mvf"].mv
            ctx.ref = pctx["mvf"].ref
        drec = deblock_frame(*rec, ctx) if p.deblock else rec
        recs.append(drec)
        dpb.insert(0, RefPlanes(*drec))      # list0: most recent first
        dpb = dpb[:num_ref]
        slices.append((i == 0, rbsp))
        stats_all.append(stats)
    return assemble_stream(p, slices), recs, stats_all


def test_ippp_ldecod_bit_exact(jm_tools, foreman_qcif, tmp_path):
    frames = [foreman_qcif.read(i) for i in range(3)]
    stream, recs, stats = encode_ippp(frames, 28)
    assert stats[1]["n_skip"] > 0          # P_Skip path exercised
    dec = ldecod_decode(tmp_path, stream)
    assert dec == recon_bytes(recs)


def test_ippp_forced_intra_refresh(jm_tools, foreman_qcif, tmp_path):
    """Per-MB forced-intra in P frames (errdo / intra-refresh hook) stays
    conformant: ldecod decodes the stream bit-exactly and the forced MBs
    really are intra."""
    frames = [foreman_qcif.read(i) for i in range(2)]

    def force(i):
        m = np.zeros((9, 11), bool)
        m[2:4, 3:6] = True
        return m

    stream, recs, stats = encode_ippp(frames, 28, force_intra=force)
    assert stats[1]["n_intra"] >= 6
    dec = ldecod_decode(tmp_path, stream)
    assert dec == recon_bytes(recs)


def test_ippp_parity_vs_lencod(jm_tools, foreman_qcif, tmp_path):
    """BASELINE config 2 direction: foreman QCIF IPPP CAVLC QP28; our
    encoder must land within 20% bits at no worse than -0.7 dB vs lencod
    (16x16/16x8/8x16 partitions vs JM's full toolbox)."""
    frames = [foreman_qcif.read(i) for i in range(3)]
    stream, recs, _ = encode_ippp(frames, 28)

    r = subprocess.run(
        [LENCOD, "-d", os.path.join(JM_BIN, "encoder_baseline.cfg"),
         "-p", f"InputFile={os.path.join(JM_BIN, 'foreman_part_qcif.yuv')}",
         "-p", "FramesToBeEncoded=3", "-p", "SourceWidth=176",
         "-p", "SourceHeight=144", "-p", "OutputWidth=176",
         "-p", "OutputHeight=144", "-p", "IntraPeriod=0", "-p", "IDRPeriod=0",
         "-p", "QPISlice=28", "-p", "QPPSlice=28", "-p", "SymbolMode=0",
         "-p", "OutFileMode=0", "-p", f"OutputFile={tmp_path/'jm.264'}",
         "-p", f"ReconFile={tmp_path/'jm_rec.yuv'}",
         "-p", "NumberReferenceFrames=1", "-p", "RDOptimization=1",
         "-p", "SearchRange=16"],
        capture_output=True, text=True, cwd=tmp_path, timeout=300)
    assert r.returncode == 0, r.stdout[-800:]
    jm_bits = os.path.getsize(tmp_path / "jm.264") * 8
    our_bits = len(stream) * 8

    our_psnr = np.mean([psnr(fr[0], rec[0]) for fr, rec in zip(frames, recs)])
    jm_rec = np.frombuffer((tmp_path / "jm_rec.yuv").read_bytes(), np.uint8)
    n = 176 * 144
    jm_psnr = np.mean([psnr(frames[i][0],
                            jm_rec[i * n * 3 // 2:i * n * 3 // 2 + n]
                            .reshape(144, 176)) for i in range(3)])
    assert our_bits <= jm_bits * 1.2, (our_bits, jm_bits)
    assert our_psnr >= jm_psnr - 0.7, (our_psnr, jm_psnr)


# ---------------------------------------------------------------------------
# Our own standard-H.264 decoder (J17/J18): decode JM lencod streams
# ---------------------------------------------------------------------------

def run_lencod(tmp_path, **over):
    args = [LENCOD, "-d", os.path.join(JM_BIN, "encoder_baseline.cfg"),
            "-p", f"InputFile={os.path.join(JM_BIN, 'foreman_part_qcif.yuv')}",
            "-p", "FramesToBeEncoded=3", "-p", "SourceWidth=176",
            "-p", "SourceHeight=144", "-p", "OutputWidth=176",
            "-p", "OutputHeight=144", "-p", "SymbolMode=0",
            "-p", "OutFileMode=0", "-p", f"OutputFile={tmp_path/'jm.264'}",
            "-p", f"ReconFile={tmp_path/'jm_rec.yuv'}"]
    for k, v in over.items():
        args += ["-p", f"{k}={v}"]
    r = subprocess.run(args, capture_output=True, text=True, cwd=tmp_path,
                       timeout=300)
    assert r.returncode == 0, r.stdout[-800:]
    return (tmp_path / "jm.264").read_bytes(), \
        (tmp_path / "jm_rec.yuv").read_bytes()


def decode_ours(stream):
    from h264tpu.avc.slice_dec import AVCDecoder
    frames = AVCDecoder().decode(stream)
    return b"".join(np.asarray(pl, np.uint8).tobytes()
                    for fr in frames for pl in fr)


@pytest.mark.parametrize("cfg", [
    dict(IntraPeriod=0, IDRPeriod=0, QPISlice=28, QPPSlice=28,
         NumberReferenceFrames=2, SearchRange=16, RDOptimization=1),
    dict(IntraPeriod=1, IDRPeriod=1, QPISlice=36,
         NumberReferenceFrames=1, RDOptimization=1),
    dict(IntraPeriod=0, IDRPeriod=0, QPISlice=24, QPPSlice=26,
         NumberReferenceFrames=1, SearchRange=8, RDOptimization=0),
])
def test_decode_lencod_stream_bit_exact(jm_tools, tmp_path, cfg):
    stream, recon = run_lencod(tmp_path, **cfg)
    assert decode_ours(stream) == recon


def test_decode_own_stream_bit_exact(jm_tools, foreman_qcif):
    frames = [foreman_qcif.read(i) for i in range(3)]
    stream, recs, _ = encode_ippp(frames, 30)
    assert decode_ours(stream) == recon_bytes(recs)


def test_ippp_multiref_p8x8_satd_ldecod_bit_exact(jm_tools, foreman_qcif,
                                                  tmp_path):
    """Multi-reference (2 refs, te(v) ref_idx), P8x8 partitions, and the
    SATD subpel metric stay ldecod-conformant."""
    frames = [foreman_qcif.read(i) for i in range(3)]
    stream, recs, stats = encode_ippp(frames, 30, num_ref=2, use_satd=True)
    dec = ldecod_decode(tmp_path, stream)
    assert dec == recon_bytes(recs)
    # our own decoder agrees too
    assert decode_ours(stream) == recon_bytes(recs)


@pytest.mark.parametrize("groups,map_type", [(2, 1), (3, 0)])
def test_fmo_multi_slice_group_ldecod_bit_exact(jm_tools, foreman_qcif,
                                                tmp_path, groups, map_type):
    """Real FMO: num_slice_groups>1 in the PPS (dispersed / interleaved map),
    one coded slice per group, slice-group-limited prediction availability —
    ldecod decodes the stream bit-exactly (VERDICT round-1 item 6)."""
    from h264tpu.avc.params import AVCParams, assemble_stream
    from h264tpu.avc.slice_enc import encode_i_frame
    from h264tpu.avc.deblock import DeblockContext, deblock_frame

    y, u, v = foreman_qcif.read(0)
    p = AVCParams(width=176, height=144, qp=30, deblock=True,
                  slice_groups=groups, slice_group_map_type=map_type)
    rbsps, rec, stats = encode_i_frame((y, u, v), p)
    assert isinstance(rbsps, list) and len(rbsps) == groups
    rec = deblock_frame(*rec, DeblockContext(p.mb_w, p.mb_h, p.qp))
    stream = assemble_stream(p, [(True, r) for r in rbsps])
    dec = ldecod_decode(tmp_path, stream)
    assert dec == recon_bytes([rec])


def test_syntax_trace_and_report(jm_tools, tmp_path, foreman_qcif):
    """Observability: the decoder's syntax-element trace (JM TraceFile
    analogue) and the log.dat-style sequence report (SURVEY §4.3/§5)."""
    from h264tpu.avc.slice_dec import AVCDecoder
    from h264tpu.utils.report import SequenceReport

    frames = [foreman_qcif.read(i) for i in range(2)]
    stream, recs, stats = encode_ippp(frames, 30)

    dec = AVCDecoder(trace=True)
    out = dec.decode(stream)
    names = {n for _, n, _ in dec.trace}
    assert {"mb_type", "slice_type", "coded_block_pattern",
            "mvd_l0_x", "mb_skip_run"} <= names
    tf = tmp_path / "trace_dec.txt"
    dec.write_trace(str(tf))
    assert tf.read_text().count("mb_type") >= 99

    class R:
        pass

    rep = SequenceReport(label="test", frame_rate=30.0)
    for i, s in enumerate(stats):
        r = R()
        r.frame_type = "I" if i == 0 else "P"
        r.psnr_y = r.psnr_u = r.psnr_v = 35.0
        r.bits = s["bits"]
        r.qp = 30
        rep.add(r)
    rep.finish()
    assert rep.total_bits == sum(s["bits"] for s in stats)
    rep.append_logdat(str(tmp_path / "log.dat"))
    assert (tmp_path / "log.dat").read_text().count("|") > 8


def test_sei_and_conformance_checks(jm_tools, foreman_qcif, tmp_path):
    """SEI messages (recovery_point + user data) ride in the stream without
    breaking ldecod decode; the profile/level checker flags violations
    (J14 / J16)."""
    import pytest as _pytest
    from h264tpu.avc import sei as SEI
    from h264tpu.avc import conformance as CF
    from h264tpu.avc.params import AVCParams
    from h264tpu.bitstream.nal import (annexb_parse, annexb_write, NALU,
                                       NAL_SEI)

    frames = [foreman_qcif.read(i) for i in range(2)]
    stream, recs, _ = encode_ippp(frames, 30)

    # splice an SEI NALU after SPS/PPS
    nalus = annexb_parse(stream)
    msg = SEI.sei_nalu([
        (SEI.RECOVERY_POINT, SEI.recovery_point_payload(0)),
        (SEI.USER_DATA_UNREGISTERED, SEI.user_data_payload(b"h264tpu r2")),
    ])
    nalus = nalus[:2] + [msg] + nalus[2:]
    stream2 = annexb_write(nalus)
    assert ldecod_decode(tmp_path, stream2) == recon_bytes(recs)

    # our parser round-trips the messages
    got = SEI.parse_sei_rbsp([n for n in annexb_parse(stream2)
                              if n.nal_type == NAL_SEI][0].rbsp)
    assert got[0][0] == SEI.RECOVERY_POINT
    assert SEI.parse_recovery_point(got[0][1])["recovery_frame_cnt"] == 0
    assert got[1][1].endswith(b"h264tpu r2")

    # conformance checks (JM conformance.c semantics)
    CF.check_params(AVCParams(width=176, height=144, level_idc=30))
    with _pytest.raises(CF.ConformanceError):
        CF.level_check(10, width=1920, height=1088, frame_rate=30)
    with _pytest.raises(CF.ConformanceError):
        CF.profile_check(CF.BASELINE, cabac=True)
    with _pytest.raises(CF.ConformanceError):
        CF.profile_check(CF.MAIN, fmo=True)


def test_avccodec_driver_roundtrip(jm_tools, foreman_qcif, tmp_path):
    """The high-level AVCCodec driver (lencod-shaped API): IPPP with 2 refs
    + SATD, conformance-checked, ldecod- and self-decodable."""
    from h264tpu.avc.params import AVCParams
    from h264tpu.avc.codec import AVCCodec

    frames = [foreman_qcif.read(i) for i in range(3)]
    p = AVCParams(width=176, height=144, qp=30, deblock=True,
                  num_ref_frames=2)
    codec = AVCCodec(p, intra_period=0, search_range=8)
    results, stream = codec.encode_sequence(frames)
    assert results[0].frame_type == "IDR" and results[1].frame_type == "P"

    dec = ldecod_decode(tmp_path, stream)
    assert dec == recon_bytes([r.recon for r in results])
    ours, _ = AVCCodec.decode_sequence(stream)
    assert recon_bytes(ours) == dec


@pytest.mark.parametrize("n_slices", [1, 3])
def test_tpu_codec_ldecod_bit_exact(jm_tools, foreman_qcif, tmp_path,
                                    n_slices):
    """The TPU-resident encoder's streams (single- and multi-slice) decode
    bit-exactly in JM 18.5 ldecod (VERDICT round-2 item 1)."""
    from h264tpu.avc.params import AVCParams
    from h264tpu.avc.tpu_codec import TPUAVCCodec

    frames = [foreman_qcif.read(i) for i in range(3)]
    p = AVCParams(width=176, height=144, qp=30, num_ref_frames=2)
    codec = TPUAVCCodec(p, intra_period=0, search_range=8,
                        n_slices=n_slices)
    results, stream = codec.encode_sequence(frames)
    dec = ldecod_decode(tmp_path, stream)
    assert dec == recon_bytes([r.recon for r in results])


def test_tpu_codec_cabac_ldecod_bit_exact(jm_tools, foreman_qcif, tmp_path):
    """CABAC (Main profile) streams from the TPU encoder decode bit-exact
    in JM 18.5 ldecod (VERDICT round-2 item 3, encoder direction)."""
    from h264tpu.avc.params import AVCParams
    from h264tpu.avc.tpu_codec import TPUAVCCodec

    frames = [foreman_qcif.read(i) for i in range(3)]
    p = AVCParams(width=176, height=144, qp=30, profile_idc=77, cabac=True)
    codec = TPUAVCCodec(p, intra_period=0, search_range=8)
    results, stream = codec.encode_sequence(frames)
    dec = ldecod_decode(tmp_path, stream)
    assert dec == recon_bytes([r.recon for r in results])


def test_decode_lencod_cabac_stream_bit_exact(jm_tools, tmp_path):
    """Our decoder decodes lencod Main-profile CABAC IPP streams (multi-ref,
    MMCO, all sub-partitions) bit-exactly (item 3, decoder direction)."""
    from h264tpu.avc.slice_dec import AVCDecoder

    out264 = tmp_path / "jm_cabac.264"
    r = subprocess.run(
        [LENCOD, "-d", os.path.join(JM_BIN, "encoder_main.cfg"),
         "-p", f"InputFile={os.path.join(JM_BIN, 'foreman_part_qcif.yuv')}",
         "-p", "FramesToBeEncoded=3", "-p", "SourceWidth=176",
         "-p", "SourceHeight=144", "-p", "OutputWidth=176",
         "-p", "OutputHeight=144", "-p", "IntraPeriod=0", "-p", "IDRPeriod=0",
         "-p", "QPISlice=30", "-p", "QPPSlice=31", "-p", "SymbolMode=1",
         "-p", "OutFileMode=0", "-p", f"OutputFile={out264}",
         "-p", f"ReconFile={tmp_path/'jm_rec.yuv'}",
         "-p", "NumberReferenceFrames=2", "-p", "RDOptimization=1",
         "-p", "Transform8x8Mode=0", "-p", "NumberBFrames=0",
         "-p", "SearchRange=16"],
        capture_output=True, text=True, cwd=tmp_path, timeout=300)
    assert r.returncode == 0, r.stdout[-800:]
    stream = out264.read_bytes()
    frames = AVCDecoder().decode(stream)
    jm = ldecod_decode(tmp_path, stream)
    assert recon_bytes(frames) == jm


def test_b_slices_ldecod_bit_exact(jm_tools, foreman_qcif, tmp_path):
    """Our IbbP streams (B slices, spatial direct, bipred) decode bit-exact
    in JM ldecod (VERDICT round-2 item 4, encoder direction)."""
    from h264tpu.avc.params import AVCParams
    from h264tpu.avc.codec import AVCCodec

    frames = [foreman_qcif.read(i) for i in range(3)]
    frames += [tuple(np.roll(pl, (1, -2), (0, 1)) for pl in frames[2])]
    p = AVCParams(width=176, height=144, qp=30, profile_idc=77, poc_type=0,
                  num_ref_frames=2)
    codec = AVCCodec(p, intra_period=0, search_range=8, bframes=2,
                     use_satd=False)
    res, stream = codec.encode_sequence(frames)
    dec = ldecod_decode(tmp_path, stream)
    assert dec == recon_bytes([q.recon for q in res])


def test_decode_lencod_b_stream_bit_exact(jm_tools, tmp_path):
    """Our decoder decodes lencod B streams (B_8x8 sub-partitions, two-list
    deblock bS, spatial direct) bit-exactly (item 4, decoder direction)."""
    from h264tpu.avc.slice_dec import AVCDecoder

    out264 = tmp_path / "jm_b.264"
    r = subprocess.run(
        [LENCOD, "-d", os.path.join(JM_BIN, "encoder_main.cfg"),
         "-p", f"InputFile={os.path.join(JM_BIN, 'foreman_part_qcif.yuv')}",
         "-p", "FramesToBeEncoded=3", "-p", "SourceWidth=176",
         "-p", "SourceHeight=144", "-p", "OutputWidth=176",
         "-p", "OutputHeight=144", "-p", "IntraPeriod=0", "-p", "IDRPeriod=0",
         "-p", "QPISlice=30", "-p", "QPPSlice=31", "-p", "QPBSlice=32",
         "-p", "SymbolMode=0", "-p", "OutFileMode=0",
         "-p", f"OutputFile={out264}",
         "-p", f"ReconFile={tmp_path/'jm_rec.yuv'}",
         "-p", "NumberReferenceFrames=2", "-p", "RDOptimization=1",
         "-p", "Transform8x8Mode=0", "-p", "NumberBFrames=1",
         "-p", "PicOrderCntType=0", "-p", "SearchRange=16",
         "-p", "DirectModeType=1"],
        capture_output=True, text=True, cwd=tmp_path, timeout=300)
    assert r.returncode == 0, r.stdout[-800:]
    stream = out264.read_bytes()
    frames = AVCDecoder().decode(stream)
    jm = ldecod_decode(tmp_path, stream)
    assert recon_bytes(frames) == jm


def test_tpu_b_ibbp_ldecod_bit_exact(jm_tools, foreman_qcif, tmp_path):
    """Device-graph IbbP (B decisions in the jitted TPU graph,
    encode_frame_b): stream decodes bit-exact in ldecod AND in our own
    decoder (VERDICT round-3 item 4, IbbP half)."""
    from h264tpu.avc.params import AVCParams
    from h264tpu.avc.codec import AVCCodec
    from h264tpu.avc.tpu_codec import TPUAVCCodec

    frames = [foreman_qcif.read(i) for i in range(3)]
    frames += [tuple(np.roll(pl, (1, -2), (0, 1)) for pl in frames[2]),
               tuple(np.roll(pl, (-2, 1), (0, 1)) for pl in frames[0])]
    p = AVCParams(width=176, height=144, qp=30, profile_idc=77, poc_type=0,
                  num_ref_frames=2)
    codec = TPUAVCCodec(p, intra_period=0, search_range=8, n_slices=3,
                        bframes=2)
    res, stream = codec.encode_sequence(frames)
    assert sum(r.frame_type == "B" for r in res) >= 2
    dec = ldecod_decode(tmp_path, stream)
    assert dec == recon_bytes([q.recon for q in res])
    mine, _ = AVCCodec.decode_sequence(stream)
    for i, fr in enumerate(mine):
        for c in range(3):
            assert np.array_equal(fr[c], res[i].recon[c]), (i, c)


def test_tpu_hierarchical_b_ldecod_bit_exact(jm_tools, foreman_qcif,
                                             tmp_path):
    """Dyadic hierarchical-B GOP (reference B + MMCO drop at next anchor,
    JM pred_struct.c shape) from the device graph: ldecod + own decoder
    bit-exact (VERDICT round-3 item 4, hierarchical half)."""
    from h264tpu.avc.params import AVCParams
    from h264tpu.avc.codec import AVCCodec
    from h264tpu.avc.tpu_codec import TPUAVCCodec

    base = [foreman_qcif.read(i) for i in range(3)]
    frames = []
    for i in range(9):
        y, u, v = base[i % 3]
        s = (i * 2) % 6
        frames.append(tuple(np.roll(pl, (s, -s), (0, 1))
                            for pl in (y, u, v)))
    p = AVCParams(width=176, height=144, qp=30, profile_idc=77, poc_type=0,
                  num_ref_frames=3)
    codec = TPUAVCCodec(p, intra_period=0, search_range=8, n_slices=3,
                        bframes=3, hierarchical=True)
    res, stream = codec.encode_sequence(frames)
    assert [r.frame_type for r in res] == [
        "IDR", "B", "B", "B", "P", "B", "B", "B", "P"]
    dec = ldecod_decode(tmp_path, stream)
    assert dec == recon_bytes([q.recon for q in res])
    mine, _ = AVCCodec.decode_sequence(stream)
    assert len(mine) == len(res)
    for i, fr in enumerate(mine):
        for c in range(3):
            assert np.array_equal(fr[c], res[i].recon[c]), (i, c)


def test_tpu_hierarchical_b_cabac_ldecod_bit_exact(jm_tools, foreman_qcif,
                                                   tmp_path):
    """CABAC hierarchical-B from the device graph (Table 9-37 B mb_type
    binarization, per-list mvd/ref contexts): ldecod decodes bit-exact
    (VERDICT round-3 item 4 'CABAC hierarchical-B end-to-end')."""
    from h264tpu.avc.params import AVCParams
    from h264tpu.avc.tpu_codec import TPUAVCCodec

    base = [foreman_qcif.read(i) for i in range(3)]
    frames = []
    for i in range(9):
        s = (i * 2) % 6
        frames.append(tuple(np.roll(pl, (s, -s), (0, 1))
                            for pl in base[i % 3]))
    p = AVCParams(width=176, height=144, qp=30, profile_idc=77, poc_type=0,
                  num_ref_frames=3, cabac=True)
    codec = TPUAVCCodec(p, intra_period=0, search_range=8, n_slices=3,
                        bframes=3, hierarchical=True)
    res, stream = codec.encode_sequence(frames)
    dec = ldecod_decode(tmp_path, stream)
    assert dec == recon_bytes([q.recon for q in res])


def _fade_frames(foreman_qcif, n=5):
    base = [foreman_qcif.read(i) for i in range(3)]
    out = []
    for i in range(n):
        g = 1.0 - 0.12 * i                      # fade to black
        out.append(tuple(np.clip(pl.astype(np.float64) * g, 0,
                                 255).astype(np.uint8)
                         for pl in base[i % 3]))
    return out


def test_weighted_pred_encode_ldecod_bit_exact(jm_tools, foreman_qcif,
                                               tmp_path):
    """Explicit P weighted prediction (DC-ratio weights, wp_lms.c
    method-0 shape): our WP stream decodes bit-exact in ldecod and in
    our own decoder (VERDICT round-3 item 5, encoder direction)."""
    from h264tpu.avc.params import AVCParams
    from h264tpu.avc.codec import AVCCodec

    frames = _fade_frames(foreman_qcif)
    p = AVCParams(width=176, height=144, qp=28, profile_idc=77,
                  weighted_pred=True)
    codec = AVCCodec(p, intra_period=0, search_range=8)
    res, stream = codec.encode_sequence(frames)
    dec = ldecod_decode(tmp_path, stream)
    assert dec == recon_bytes([q.recon for q in res])
    mine, _ = AVCCodec.decode_sequence(stream)
    for i, fr in enumerate(mine):
        for c in range(3):
            assert np.array_equal(fr[c], res[i].recon[c]), (i, c)
    # WP must actually engage on a fade (non-default luma weight)
    from h264tpu.avc.codec import estimate_wp
    wp = estimate_wp(frames[1], [tuple(float(pl.mean())
                                       for pl in frames[0])])
    assert wp["l0"][0][0] != 32


def test_decode_lencod_wp_stream_bit_exact(jm_tools, foreman_qcif, tmp_path):
    """lencod WeightedPrediction=1 fade stream decodes bit-exact in our
    decoder (item 5, decoder direction; output compared vs ldecod)."""
    from h264tpu.avc.slice_dec import AVCDecoder

    frames = _fade_frames(foreman_qcif)
    raw = bytearray()
    for y, u, v in frames:
        raw += y.tobytes() + u.tobytes() + v.tobytes()
    src = tmp_path / "fade.yuv"
    src.write_bytes(bytes(raw))
    out264 = tmp_path / "jm_wp.264"
    r = subprocess.run(
        [LENCOD, "-d", os.path.join(JM_BIN, "encoder_main.cfg"),
         "-p", f"InputFile={src}", "-p", "FramesToBeEncoded=5",
         "-p", "SourceWidth=176", "-p", "SourceHeight=144",
         "-p", "OutputWidth=176", "-p", "OutputHeight=144",
         "-p", "IntraPeriod=0", "-p", "IDRPeriod=0", "-p", "QPISlice=28",
         "-p", "QPPSlice=28", "-p", "SymbolMode=0", "-p", "OutFileMode=0",
         "-p", "NumberBFrames=0", "-p", "WeightedPrediction=1",
         "-p", f"OutputFile={out264}",
         "-p", f"ReconFile={tmp_path/'jm_rec.yuv'}",
         "-p", "NumberReferenceFrames=2", "-p", "RDOptimization=1",
         "-p", "SearchRange=8"],
        capture_output=True, text=True, cwd=tmp_path, timeout=600)
    assert r.returncode == 0, r.stdout[-800:]
    stream = out264.read_bytes()
    want = ldecod_decode(tmp_path, stream)
    dec = AVCDecoder().decode(stream)
    got = recon_bytes(dec)
    assert got == want


def test_decode_lencod_temporal_direct_bit_exact(jm_tools, foreman_qcif,
                                                 tmp_path):
    """lencod DirectModeType=0 (temporal direct) B streams decode
    bit-exact in our decoder (spec 8.4.1.2.3; VERDICT item 10)."""
    from h264tpu.avc.slice_dec import AVCDecoder

    out264 = tmp_path / "jm_td.264"
    r = subprocess.run(
        [LENCOD, "-d", os.path.join(JM_BIN, "encoder_main.cfg"),
         "-p", f"InputFile={os.path.join(JM_BIN, 'foreman_part_qcif.yuv')}",
         "-p", "FramesToBeEncoded=3", "-p", "SourceWidth=176",
         "-p", "SourceHeight=144", "-p", "OutputWidth=176",
         "-p", "OutputHeight=144", "-p", "IntraPeriod=0",
         "-p", "IDRPeriod=0", "-p", "QPISlice=30", "-p", "QPPSlice=31",
         "-p", "QPBSlice=32", "-p", "SymbolMode=0", "-p", "OutFileMode=0",
         "-p", "NumberBFrames=1", "-p", "DirectModeType=0",
         "-p", "BiPredMESearchRange=8",
         "-p", f"OutputFile={out264}",
         "-p", f"ReconFile={tmp_path/'jm_rec.yuv'}",
         "-p", "NumberReferenceFrames=2", "-p", "RDOptimization=1",
         "-p", "SearchRange=8"],
        capture_output=True, text=True, cwd=tmp_path, timeout=600)
    assert r.returncode == 0, r.stdout[-800:]
    stream = out264.read_bytes()
    want = ldecod_decode(tmp_path, stream)
    got = recon_bytes(AVCDecoder().decode(stream))
    assert got == want


def test_own_fmo_stream_self_decode(foreman_qcif):
    """Our FMO (2 dispersed slice groups, all-IDR) streams now decode in
    our OWN decoder too — closes the encode/decode asymmetry (VERDICT
    round-3 weak #8)."""
    from h264tpu.avc.params import AVCParams
    from h264tpu.avc.codec import AVCCodec

    frames = [foreman_qcif.read(i) for i in range(2)]
    p = AVCParams(width=176, height=144, qp=30, slice_groups=2,
                  slice_group_map_type=1)
    codec = AVCCodec(p, intra_period=1)
    res, stream = codec.encode_sequence(frames)
    mine, _ = AVCCodec.decode_sequence(stream)
    for i, fr in enumerate(mine):
        for c in range(3):
            assert np.array_equal(fr[c], res[i].recon[c]), (i, c)


def test_pcm_macroblock_decode(foreman_qcif):
    """I_PCM macroblocks (mb_type 25, raw samples after alignment) decode
    per spec 7.3.5/8.3.5."""
    from h264tpu.avc.params import AVCParams, write_slice_header, SLICE_I
    from h264tpu.avc.params import assemble_stream
    from h264tpu.avc.slice_dec import AVCDecoder
    from h264tpu.entropy.bitio import BitWriter

    rng = np.random.default_rng(3)
    p = AVCParams(width=32, height=32, qp=28, deblock=False)
    y = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    u = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    v = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    w = BitWriter()
    write_slice_header(w, p, SLICE_I, 0, True, 28)
    for mby in range(2):
        for mbx in range(2):
            w.ue(25)                       # mb_type I_PCM
            pad = (-w.bit_length()) % 8
            if pad:
                w.u(0, pad)                # pcm_alignment_zero_bit
            w.u(y[mby*16:mby*16+16, mbx*16:mbx*16+16].reshape(-1), 8)
            w.u(u[mby*8:mby*8+8, mbx*8:mbx*8+8].reshape(-1), 8)
            w.u(v[mby*8:mby*8+8, mbx*8:mbx*8+8].reshape(-1), 8)
    w.u(1, 1)
    stream = assemble_stream(p, [(True, w.to_bytes())])
    out = AVCDecoder().decode(stream)
    assert np.array_equal(out[0][0], y)
    assert np.array_equal(out[0][1], u)
    assert np.array_equal(out[0][2], v)


def test_decoder_bit_statistics(jm_tools, foreman_qcif, tmp_path):
    """Per-syntax-element bit accounting (dec_statistics.c analogue,
    VERDICT item 10 / J22)."""
    from h264tpu.avc.params import AVCParams
    from h264tpu.avc.codec import AVCCodec
    from h264tpu.avc.slice_dec import AVCDecoder

    frames = [foreman_qcif.read(i) for i in range(2)]
    p = AVCParams(width=176, height=144, qp=30)
    _, stream = AVCCodec(p, intra_period=0,
                         search_range=8).encode_sequence(frames)
    dec = AVCDecoder(trace=True)
    dec.decode(stream)
    stats = dec.bit_statistics()
    assert stats and "mb_type" in stats or "coded_block_pattern" in stats
    total_bits = sum(b for _c, b in stats.values())
    assert total_bits > 0
    out = tmp_path / "dec_stats.txt"
    dec.write_statistics(str(out))
    assert out.read_text().splitlines()[0].startswith("syntax element")


def test_cabac_b_decode_own_and_lencod(jm_tools, foreman_qcif, tmp_path):
    """CABAC B slices decode in OUR decoder: (a) our device hierarchical-B
    CABAC stream round-trips, (b) a lencod Main B+CABAC stream (incl.
    B_8x8 Table 9-38 sub types) matches ldecod output bit-exactly."""
    from h264tpu.avc.params import AVCParams
    from h264tpu.avc.codec import AVCCodec
    from h264tpu.avc.tpu_codec import TPUAVCCodec
    from h264tpu.avc.slice_dec import AVCDecoder

    base = [foreman_qcif.read(i) for i in range(3)]
    frames = [tuple(np.roll(pl, ((i * 2) % 6, -((i * 2) % 6)), (0, 1))
                    for pl in base[i % 3]) for i in range(5)]
    p = AVCParams(width=176, height=144, qp=30, profile_idc=77, poc_type=0,
                  num_ref_frames=2, cabac=True)
    codec = TPUAVCCodec(p, intra_period=0, search_range=8, n_slices=3,
                        bframes=2)
    res, stream = codec.encode_sequence(frames)
    mine, _ = AVCCodec.decode_sequence(stream)
    for i, fr in enumerate(mine):
        for c in range(3):
            assert np.array_equal(fr[c], res[i].recon[c]), (i, c)

    out264 = tmp_path / "jm_bc.264"
    r = subprocess.run(
        [LENCOD, "-d", os.path.join(JM_BIN, "encoder_main.cfg"),
         "-p", f"InputFile={os.path.join(JM_BIN, 'foreman_part_qcif.yuv')}",
         "-p", "FramesToBeEncoded=3", "-p", "SourceWidth=176",
         "-p", "SourceHeight=144", "-p", "OutputWidth=176",
         "-p", "OutputHeight=144", "-p", "IntraPeriod=0",
         "-p", "IDRPeriod=0", "-p", "QPISlice=30", "-p", "QPPSlice=31",
         "-p", "QPBSlice=32", "-p", "SymbolMode=1", "-p", "OutFileMode=0",
         "-p", "NumberBFrames=1", "-p", "BiPredMESearchRange=8",
         "-p", f"OutputFile={out264}",
         "-p", f"ReconFile={tmp_path/'jm_rec.yuv'}",
         "-p", "NumberReferenceFrames=2", "-p", "RDOptimization=1",
         "-p", "SearchRange=8"],
        capture_output=True, text=True, cwd=tmp_path, timeout=600)
    assert r.returncode == 0, r.stdout[-800:]
    stream2 = out264.read_bytes()
    want = ldecod_decode(tmp_path, stream2)
    got = recon_bytes(AVCDecoder().decode(stream2))
    assert got == want


def test_long_term_refs_mmco_ldecod_bit_exact(jm_tools, foreman_qcif,
                                              tmp_path):
    """Long-term reference pictures + MMCO ops 2/3/4/6 (spec 8.2.5.4):
    a crafted stream marks the IDR long-term (long_term_reference_flag),
    then a P picture long-term via MMCO 4+3, keeps referencing both past
    the sliding window, and finally unmarks via MMCO 2.  ldecod and our
    decoder agree bit-exactly with the encoder recon (VERDICT item 10,
    long-term half; lencod never emits these, so the stream is our own
    and ldecod is the oracle)."""
    from h264tpu.avc.params import AVCParams, assemble_stream
    from h264tpu.avc.slice_enc import encode_i_frame, encode_p_frame
    from h264tpu.avc.deblock import DeblockContext, deblock_frame
    from h264tpu.avc.inter import RefPlanes
    from h264tpu.avc.codec import AVCCodec

    base = [foreman_qcif.read(i) for i in range(3)]
    frames = [tuple(np.roll(pl, (i, -i), (0, 1)) for pl in base[i % 3])
              for i in range(6)]
    p = AVCParams(width=176, height=144, qp=30, num_ref_frames=3)

    slices, recs = [], []

    def finish(rbsp, rec, pctx=None):
        ctx = DeblockContext(p.mb_w, p.mb_h, 30)
        if pctx is not None:
            ctx.mb_intra = pctx["mb_intra"]
            ctx.nnz = pctx["nnz"]
            ctx.mv = pctx["mvf"].mv
            ctx.ref = pctx["mvf"].ref
        rec = deblock_frame(*rec, ctx)
        recs.append(tuple(np.asarray(pl, np.uint8) for pl in rec))
        return RefPlanes(*rec)

    # IDR marked long-term (lt_idx 0)
    rbsp, rec, _ = encode_i_frame(frames[0], p, frame_num=0, idr=True,
                                  long_term_idr=True)
    slices.append((True, rbsp))
    lt0 = finish(rbsp, rec)

    # P1: l0 init = [LT(idr)] (no short-terms yet)
    rbsp, rec, pctx, _ = encode_p_frame(frames[1], [lt0], p, frame_num=1,
                                        sr=8)
    slices.append((False, rbsp))
    p1 = finish(rbsp, rec, pctx)

    # P2: l0 = [P1(st), IDR(lt)]; MMCO 4 (MaxLtIdx=1) + 3 (mark P1 lt 1)
    rbsp, rec, pctx, _ = encode_p_frame(frames[2], [p1, lt0], p,
                                        frame_num=2, sr=8,
                                        mmco=[(4, 2), (3, 0, 1)])
    slices.append((False, rbsp))
    p2 = finish(rbsp, rec, pctx)

    # P3: l0 = [P2(st), IDR(lt0), P1(lt1)]
    rbsp, rec, pctx, _ = encode_p_frame(frames[3], [p2, lt0, p1], p,
                                        frame_num=3, sr=8)
    slices.append((False, rbsp))
    p3 = finish(rbsp, rec, pctx)

    # P4: storing P3 evicted P2 (oldest short-term; the long-terms
    # survive the window) -> l0 = [P3(st), IDR(lt0), P1(lt1)].
    # Its MMCO 2 unmarks lt_idx 1 (P1) after decode.
    rbsp, rec, pctx, _ = encode_p_frame(frames[4], [p3, lt0, p1], p,
                                        frame_num=4, sr=8,
                                        mmco=[(2, 1)])
    slices.append((False, rbsp))
    p4 = finish(rbsp, rec, pctx)

    # P5: l0 = [P4, P3, IDR(lt0)]; MMCO 1 drops P3 and MMCO 6 marks
    # P5 ITSELF long-term (lt_idx 1)
    rbsp, rec, pctx, _ = encode_p_frame(frames[5], [p4, p3, lt0], p,
                                        frame_num=5, sr=8,
                                        mmco=[(1, 1), (6, 1)])
    slices.append((False, rbsp))
    p5 = finish(rbsp, rec, pctx)

    # P6 (re-coding frame 2): l0 = [P4(st), IDR(lt0), P5(lt1)]
    rbsp, rec, pctx, _ = encode_p_frame(frames[2], [p4, lt0, p5], p,
                                        frame_num=6, sr=8)
    slices.append((False, rbsp))
    finish(rbsp, rec, pctx)

    stream = assemble_stream(p, slices)
    want = ldecod_decode(tmp_path, stream)
    assert want == recon_bytes(recs)
    mine, _ = AVCCodec.decode_sequence(stream)
    for i, fr in enumerate(mine):
        for c in range(3):
            assert np.array_equal(fr[c], recs[i][c]), (i, c)


def test_mb_error_concealment(foreman_qcif):
    """MB-level error concealment (J21): dropping a slice NAL from a
    3-slice picture still decodes; the lost band is concealed spatially
    (I) / temporally (P) and lands far above garbage quality."""
    from h264tpu.avc.params import AVCParams
    from h264tpu.avc.tpu_codec import TPUAVCCodec
    from h264tpu.avc.codec import AVCCodec
    from h264tpu.bitstream.nal import annexb_parse, annexb_write, \
        NAL_SLICE, NAL_IDR

    frames = [foreman_qcif.read(i) for i in range(3)]
    p = AVCParams(width=176, height=144, qp=28)
    codec = TPUAVCCodec(p, intra_period=0, search_range=8, n_slices=3)
    res, stream = codec.encode_sequence(frames)

    # drop the middle slice of the LAST P picture (slices 6 of 9)
    nalus = list(annexb_parse(stream))
    slice_idx = [i for i, n in enumerate(nalus)
                 if n.nal_type in (NAL_SLICE, NAL_IDR)]
    del nalus[slice_idx[-2]]
    damaged = annexb_write(nalus)
    out = AVCCodec.decode_sequence(damaged)[0]
    assert len(out) == 3
    ref = res[2].recon[0].astype(np.float64)
    got = out[2][0].astype(np.float64)
    band = slice(48, 96)                      # the lost rows
    mse = ((ref[band] - got[band]) ** 2).mean()
    psnr_band = 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))
    assert psnr_band > 20, psnr_band          # concealed, not garbage
    # surviving rows away from the deblocked band edge are untouched
    assert np.array_equal(out[2][0][:40], res[2].recon[0][:40])

    # intra concealment path: drop a slice of the IDR picture
    nalus = list(annexb_parse(stream))
    del nalus[slice_idx[1]]
    out2 = AVCCodec.decode_sequence(annexb_write(nalus))[0]
    mse2 = ((res[0].recon[0][band].astype(np.float64)
             - out2[0][0][band].astype(np.float64)) ** 2).mean()
    assert 10 * np.log10(255.0 ** 2 / max(mse2, 1e-9)) > 12


def test_vui_parameters(jm_tools, foreman_qcif, tmp_path):
    """VUI timing/aspect in the SPS (spec E.1.1, J14): our stream with
    VUI still decodes in ldecod and in our decoder, which parses the
    fields back; a lencod EnableVUISupport stream also parses."""
    from h264tpu.avc.params import AVCParams
    from h264tpu.avc.tpu_codec import TPUAVCCodec
    from h264tpu.avc.codec import AVCCodec
    from h264tpu.avc.slice_dec import AVCDecoder, parse_sps
    from h264tpu.bitstream.nal import annexb_parse, NAL_SPS

    frames = [foreman_qcif.read(i) for i in range(2)]
    p = AVCParams(width=176, height=144, qp=30,
                  vui_timing=(1, 60), aspect_ratio_idc=1)
    codec = TPUAVCCodec(p, intra_period=0, search_range=8, n_slices=3)
    res, stream = codec.encode_sequence(frames)
    dec = ldecod_decode(tmp_path, stream)
    assert dec == recon_bytes([q.recon for q in res])
    sps = next(parse_sps(n.rbsp) for n in annexb_parse(stream)
               if n.nal_type == NAL_SPS)
    assert sps["vui"]["num_units_in_tick"] == 1
    assert sps["vui"]["time_scale"] == 60
    assert sps["vui"]["aspect_ratio_idc"] == 1
    mine, _ = AVCCodec.decode_sequence(stream)
    assert len(mine) == 2

    # lencod with VUI enabled parses in our decoder too
    out264 = tmp_path / "jm_vui.264"
    r = subprocess.run(
        [LENCOD, "-d", os.path.join(JM_BIN, "encoder_baseline.cfg"),
         "-p", f"InputFile={os.path.join(JM_BIN, 'foreman_part_qcif.yuv')}",
         "-p", "FramesToBeEncoded=2", "-p", "SourceWidth=176",
         "-p", "SourceHeight=144", "-p", "OutputWidth=176",
         "-p", "OutputHeight=144", "-p", "IntraPeriod=0",
         "-p", "QPISlice=30", "-p", "QPPSlice=30", "-p", "SymbolMode=0",
         "-p", "OutFileMode=0", "-p", "EnableVUISupport=1",
         "-p", f"OutputFile={out264}",
         "-p", f"ReconFile={tmp_path/'jm_rec.yuv'}",
         "-p", "NumberReferenceFrames=1", "-p", "RDOptimization=1",
         "-p", "SearchRange=8"],
        capture_output=True, text=True, cwd=tmp_path, timeout=600)
    assert r.returncode == 0, r.stdout[-400:]
    stream2 = out264.read_bytes()
    want = ldecod_decode(tmp_path, stream2)
    got = recon_bytes(AVCDecoder().decode(stream2))
    assert got == want


@pytest.mark.parametrize("sgtype,extra", [
    (2, ["-p", "SliceGroupConfigFileName=sg2conf.cfg"]),
    (3, ["-p", "SliceGroupChangeDirection=1",
         "-p", "SliceGroupChangeRate=10", "-p", "SliceGroupChangeCycle=3"]),
    (4, ["-p", "SliceGroupChangeDirection=0",
         "-p", "SliceGroupChangeRate=20", "-p", "SliceGroupChangeCycle=2"]),
    (5, ["-p", "SliceGroupChangeDirection=1",
         "-p", "SliceGroupChangeRate=15", "-p", "SliceGroupChangeCycle=1"]),
    (6, ["-p", "SliceGroupConfigFileName=sg6conf.cfg"]),
])
def test_decode_lencod_fmo_types(jm_tools, tmp_path, sgtype, extra):
    """FMO slice_group_map_types 2/4/5/6 (spec 8.2.2.3-8.2.2.8): lencod
    streams decode bit-exact via the shared generator toolbox
    (models/resilience.py; VERDICT FMO-decode long tail)."""
    import shutil
    from h264tpu.avc.slice_dec import AVCDecoder

    for cfg in ("sg2conf.cfg", "sg6conf.cfg"):
        shutil.copy(os.path.join(JM_BIN, cfg), tmp_path / cfg)
    out264 = tmp_path / f"jm_fmo{sgtype}.264"
    r = subprocess.run(
        [LENCOD, "-d", os.path.join(JM_BIN, "encoder_baseline.cfg"),
         "-p", f"InputFile={os.path.join(JM_BIN, 'foreman_part_qcif.yuv')}",
         "-p", "FramesToBeEncoded=2", "-p", "SourceWidth=176",
         "-p", "SourceHeight=144", "-p", "OutputWidth=176",
         "-p", "OutputHeight=144", "-p", "IntraPeriod=1",
         "-p", "IDRPeriod=1", "-p", "QPISlice=30", "-p", "QPPSlice=30",
         "-p", "SymbolMode=0", "-p", "OutFileMode=0",
         "-p", "NumSliceGroupsMinus1=1",
         "-p", f"SliceGroupMapType={sgtype}",
         "-p", f"OutputFile={out264}",
         "-p", f"ReconFile={tmp_path/'jm_rec.yuv'}",
         "-p", "NumberReferenceFrames=1", "-p", "RDOptimization=1",
         "-p", "SearchRange=8"] + extra,
        capture_output=True, text=True, cwd=tmp_path, timeout=600)
    assert r.returncode == 0, (r.stdout[-600:], r.stderr[-200:])
    stream = out264.read_bytes()
    want = ldecod_decode(tmp_path, stream)
    got = recon_bytes(AVCDecoder().decode(stream))
    assert got == want


def test_weighted_pred_tpu_path_ldecod_bit_exact(jm_tools, foreman_qcif,
                                                 tmp_path):
    """Explicit P WP on the DEVICE path (VERDICT round-4 item 9): the TPU
    encoder weights the phase-split luma planes (post-MC exact) and
    applies traced chroma weights at the MC sites; the stream decodes
    bit-exact in ldecod AND our decoder."""
    from h264tpu.avc.params import AVCParams
    from h264tpu.avc.tpu_codec import TPUAVCCodec

    frames = _fade_frames(foreman_qcif)
    p = AVCParams(width=176, height=144, qp=28, profile_idc=77,
                  weighted_pred=True)
    codec = TPUAVCCodec(p, intra_period=0, search_range=8, n_slices=3)
    res, stream = codec.encode_sequence(frames)
    dec = ldecod_decode(tmp_path, stream)
    assert dec == recon_bytes([q.recon for q in res])
    assert decode_ours(stream) == recon_bytes([q.recon for q in res])


def test_weighted_pred_lms_ldecod_bit_exact(jm_tools, foreman_qcif,
                                            tmp_path):
    """wp_lms.c member of the WP estimation family: least-squares
    gain+offset explicit WP.  An additive brightness shift needs a
    nonzero OFFSET (the DC-ratio method can only scale), so this also
    exercises the pred_weight_table offset path end to end: our LMS WP
    stream decodes bit-exact in ldecod and in our own decoder."""
    from h264tpu.avc.params import AVCParams
    from h264tpu.avc.codec import AVCCodec, estimate_wp_lms
    from h264tpu.avc.inter import RefPlanes

    base = [foreman_qcif.read(i) for i in range(3)]
    frames = []
    for i in range(6):
        off = -18 * i                         # additive fade (offset-shaped)
        frames.append(tuple(np.clip(pl.astype(np.float64) + off, 0,
                                    255).astype(np.uint8)
                            for pl in base[i % 3]))
    p = AVCParams(width=176, height=144, qp=28, profile_idc=77,
                  weighted_pred=True)
    codec = AVCCodec(p, intra_period=0, search_range=8, wp_method="lms")
    res, stream = codec.encode_sequence(frames)
    dec = ldecod_decode(tmp_path, stream)
    assert dec == recon_bytes([q.recon for q in res])
    mine, _ = AVCCodec.decode_sequence(stream)
    for i, fr in enumerate(mine):
        for c in range(3):
            assert np.array_equal(fr[c], res[i].recon[c]), (i, c)
    # the LMS fit must produce a materially nonzero luma offset on an
    # additive fade (w stays near 1.0 * 32, o carries the shift)
    rp = RefPlanes(*(pl.astype(np.int64) for pl in frames[0]))
    wp = estimate_wp_lms(frames[1], [rp])
    assert abs(wp["l0"][0][1]) >= 8, wp["l0"][0]
    assert 24 <= wp["l0"][0][0] <= 40, wp["l0"][0]


def test_open_gop_non_idr_intra(jm_tools, foreman_qcif, tmp_path):
    """Open GOP (J2): periodic intra pictures are NON-IDR I slices with a
    recovery_point SEI — one IDR only, the DPB survives the I pictures,
    frame_num keeps counting.  ldecod and our decoder both decode the
    stream bit-exactly."""
    from h264tpu.avc.params import AVCParams
    from h264tpu.avc.codec import AVCCodec
    from h264tpu.avc import sei as SEI
    from h264tpu.bitstream.nal import annexb_parse
    from h264tpu.entropy.bitio import BitReader

    frames = [foreman_qcif.read(i % 3) for i in range(9)]
    p = AVCParams(width=176, height=144, qp=30)
    codec = AVCCodec(p, intra_period=4, search_range=8, open_gop=True)
    res, stream = codec.encode_sequence(frames)

    nals = list(annexb_parse(stream))
    idrs = [n for n in nals if n.nal_type == 5]
    assert len(idrs) == 1                      # only frame 0 is an IDR
    stypes = []
    for n in nals:
        if n.nal_type == 1:
            r = BitReader(n.rbsp)
            r.ue()
            stypes.append(r.ue() % 5)
    assert stypes.count(2) == 2                # frames 4, 8: non-IDR I
    assert stypes.count(0) == 6                # the P pictures
    seis = [m for n in nals if n.nal_type == 6
            for m in SEI.parse_sei_rbsp(n.rbsp)]
    assert sum(1 for t, _ in seis if t == SEI.RECOVERY_POINT) == 2
    assert all(SEI.parse_recovery_point(pl)["recovery_frame_cnt"] == 0
               for t, pl in seis if t == SEI.RECOVERY_POINT)

    dec = ldecod_decode(tmp_path, stream)
    assert dec == recon_bytes([q.recon for q in res])
    mine, _ = AVCCodec.decode_sequence(stream)
    for i, fr in enumerate(mine):
        for c in range(3):
            assert np.array_equal(fr[c], res[i].recon[c]), (i, c)


def test_rd_picture_decision(jm_tools, foreman_qcif, tmp_path):
    """Multi-pass picture decision (rdpicdecision.c): each P picture is
    coded at qp-1/qp/qp+1 and the lowest-J pass wins.  The stream must
    stay ldecod- and self-decode-bit-exact (deblock follows the winning
    QP), and the sequence RD cost must not regress vs single-pass."""
    from h264tpu.avc.params import AVCParams
    from h264tpu.avc.codec import AVCCodec
    from h264tpu.avc.slice_enc import lambda_mode

    frames = [foreman_qcif.read(i % 3) for i in range(6)]
    p = AVCParams(width=176, height=144, qp=30)
    c_rd = AVCCodec(p, intra_period=0, search_range=8,
                    rd_picture_decision=True)
    res_rd, s_rd = c_rd.encode_sequence(frames)
    res_fx, _ = AVCCodec(p, intra_period=0,
                         search_range=8).encode_sequence(frames)

    dec = ldecod_decode(tmp_path, s_rd)
    assert dec == recon_bytes([q.recon for q in res_rd])
    mine, _ = AVCCodec.decode_sequence(s_rd)
    for i, fr in enumerate(mine):
        for c in range(3):
            assert np.array_equal(fr[c], res_rd[i].recon[c]), (i, c)

    assert len(c_rd.pic_qps) == 5 and all(29 <= q <= 31
                                          for q in c_rd.pic_qps)
    lam = lambda_mode(30)

    def seq_j(rs):
        j = 0.0
        for i, q in enumerate(rs):
            ssd = ((np.asarray(frames[i][0], np.float64)
                    - np.asarray(q.recon[0], np.float64)) ** 2).sum()
            j += ssd + lam * q.bits
        return j

    assert seq_j(res_rd) <= seq_j(res_fx) * 1.02


def test_explicit_sequence_file(jm_tools, foreman_qcif, tmp_path):
    """Explicit sequence description files (explicit_seq.c): the
    reference's own JM/bin/explicit_seq.cfg parses, and a custom coding
    order (I P B P B with display reordering) drives the encoder —
    ldecod and our decoder return the display-order reconstructions
    bit-exactly."""
    from h264tpu.avc.params import AVCParams
    from h264tpu.avc.codec import AVCCodec
    from h264tpu.avc.explicit_seq import (parse_explicit_seq,
                                          parse_explicit_seq_file,
                                          encode_explicit_seq)

    ref_cfg = os.path.join(JM_BIN, "explicit_seq.cfg")
    entries = parse_explicit_seq_file(ref_cfg)
    assert len(entries) == 19
    assert entries[0] == dict(seq_number=0, slice_type="I", idr=True,
                              reference=True)
    assert any(e["slice_type"] == "B" for e in entries)

    seq = parse_explicit_seq("""
    Sequence {
    FrameCount : 5
    Frame { SeqNumber : 0  SliceType : I  IDRPicture : 1  Reference : 1 }
    Frame { SeqNumber : 2  SliceType : P  IDRPicture : 0  Reference : 1 }
    Frame { SeqNumber : 1  SliceType : B  IDRPicture : 0  Reference : 0 }
    Frame { SeqNumber : 4  SliceType : P  IDRPicture : 0  Reference : 1 }
    Frame { SeqNumber : 3  SliceType : B  IDRPicture : 0  Reference : 0 }
    }
    """)
    assert [e["seq_number"] for e in seq] == [0, 2, 1, 4, 3]

    frames = [foreman_qcif.read(i % 3) for i in range(5)]
    p = AVCParams(width=176, height=144, qp=30, profile_idc=77,
                  poc_type=0, num_ref_frames=2)
    res, stream = encode_explicit_seq(frames, p, seq, search_range=8)
    assert [r.frame_type for r in res] == ["IDR", "B", "P", "B", "P"]

    dec = ldecod_decode(tmp_path, stream)
    assert dec == recon_bytes([q.recon for q in res])
    mine, _ = AVCCodec.decode_sequence(stream)
    assert len(mine) == 5
    for i, fr in enumerate(mine):
        for c in range(3):
            assert np.array_equal(fr[c], res[i].recon[c]), (i, c)


def test_lossless_pcm_coding(jm_tools, foreman_qcif, tmp_path):
    """Lossless coding (J7 lossless surface): all-I_PCM IDR pictures —
    reconstruction equals the SOURCE bit-exactly, in ldecod and in our
    decoder (mb_type 25, pcm alignment, QPY-0 no-op deblock)."""
    from h264tpu.avc.params import AVCParams
    from h264tpu.avc.codec import AVCCodec

    frames = [foreman_qcif.read(i) for i in range(3)]
    p = AVCParams(width=176, height=144, qp=28)
    codec = AVCCodec(p, lossless=True)
    res, stream = codec.encode_sequence(frames)
    src = recon_bytes([f for f in frames])
    assert recon_bytes([q.recon for q in res]) == src
    assert ldecod_decode(tmp_path, stream) == src
    mine, _ = AVCCodec.decode_sequence(stream)
    for i, fr in enumerate(mine):
        for c in range(3):
            assert np.array_equal(fr[c], np.asarray(frames[i][c])), (i, c)
    # PCM rate: slightly over raw 12 bpp (headers + alignment)
    bpp = res[0].bits / (176 * 144)
    assert 12.0 < bpp < 13.0, bpp


def test_weighted_pred_lms_tpu_path_ldecod_bit_exact(jm_tools,
                                                     foreman_qcif,
                                                     tmp_path):
    """LMS WP on the DEVICE path (host/device feature parity): the
    least-squares gain+offset weights flow through the weighted
    phase-split luma planes (incl. the OFFSET term) and the traced
    chroma weights; ldecod- and self-decode-bit-exact on an additive
    fade."""
    from h264tpu.avc.params import AVCParams
    from h264tpu.avc.tpu_codec import TPUAVCCodec

    base = [foreman_qcif.read(i) for i in range(3)]
    frames = [tuple(np.clip(pl.astype(np.float64) - 15 * i, 0,
                            255).astype(np.uint8)
                    for pl in base[i % 3]) for i in range(6)]
    p = AVCParams(width=176, height=144, qp=28, profile_idc=77,
                  weighted_pred=True)
    codec = TPUAVCCodec(p, intra_period=0, search_range=8, n_slices=3,
                        wp_method="lms")
    res, stream = codec.encode_sequence(frames)
    dec = ldecod_decode(tmp_path, stream)
    assert dec == recon_bytes([q.recon for q in res])
    assert decode_ours(stream) == recon_bytes([q.recon for q in res])


def test_umhex_fast_me(jm_tools, foreman_qcif, tmp_path):
    """UMHexagonS-shaped fast ME (me_umhex.c member of the J6 family):
    the pruned integer search must cut SAD evaluations by >5x at sr=16
    while staying within ~0.3 dB / ~12% bits of full search, and the
    stream stays ldecod- and self-decode-bit-exact."""
    from h264tpu.avc.params import AVCParams
    from h264tpu.avc.codec import AVCCodec
    from h264tpu.avc import inter as INTER

    frames = [foreman_qcif.read(i % 3) for i in range(6)]
    p = AVCParams(width=176, height=144, qp=28)
    runs = {}
    for m in ("full", "umhex"):
        INTER.ME_EVALS = 0
        codec = AVCCodec(p, intra_period=0, search_range=16, me_method=m)
        res, stream = codec.encode_sequence(frames)
        runs[m] = dict(res=res, stream=stream, evals=INTER.ME_EVALS,
                       bits=sum(q.bits for q in res),
                       psnr=np.mean([q.psnr_y for q in res[1:]]))
    assert runs["umhex"]["evals"] * 5 < runs["full"]["evals"], \
        (runs["umhex"]["evals"], runs["full"]["evals"])
    assert runs["umhex"]["psnr"] > runs["full"]["psnr"] - 0.3
    assert runs["umhex"]["bits"] < runs["full"]["bits"] * 1.12

    res, stream = runs["umhex"]["res"], runs["umhex"]["stream"]
    dec = ldecod_decode(tmp_path, stream)
    assert dec == recon_bytes([q.recon for q in res])
    mine, _ = AVCCodec.decode_sequence(stream)
    for i, fr in enumerate(mine):
        for c in range(3):
            assert np.array_equal(fr[c], res[i].recon[c]), (i, c)
