"""High profile / 8x8 transform: decode + encode conformance.

Decoder: JM 18.5 lencod High-profile streams (ProfileIDC=100,
Transform8x8Mode=1 -> transform_size_8x8_flag, intra 8x8, itrans8x8)
must decode bit-exactly (VERDICT round-4 item 2).
"""

import os
import subprocess

import numpy as np
import pytest

from test_avc_conformance import (JM_BIN, run_lencod, decode_ours,
                                  ldecod_decode, jm_tools,
                                  recon_bytes)  # noqa: F401


@pytest.mark.parametrize("cfg", [
    # P frames with inter 8x8 transform RD + intra I8x8 in the IDR
    dict(ProfileIDC=100, Transform8x8Mode=1, IntraPeriod=0, IDRPeriod=0,
         QPISlice=28, QPPSlice=28, NumberReferenceFrames=1,
         SearchRange=16, RDOptimization=1),
    # all-intra: heavy I8x8 usage
    dict(ProfileIDC=100, Transform8x8Mode=1, IntraPeriod=1, IDRPeriod=1,
         QPISlice=32, NumberReferenceFrames=1, RDOptimization=1),
    # low QP (dense coefficients) + multi-ref
    dict(ProfileIDC=100, Transform8x8Mode=1, IntraPeriod=0, IDRPeriod=0,
         QPISlice=22, QPPSlice=22, NumberReferenceFrames=2,
         SearchRange=8, RDOptimization=1),
    # qp<6: qp_per=0 makes odd dequantized cofs, so the inverse-4x4
    # stage ORDER (spec 8.5.12.2 rows-then-columns, truncating >>1) is
    # observable even without scaling matrices
    dict(ProfileIDC=100, Transform8x8Mode=1, IntraPeriod=0, IDRPeriod=0,
         QPISlice=4, QPPSlice=4, NumberReferenceFrames=1,
         SearchRange=8, RDOptimization=1),
])
def test_decode_lencod_high_8x8_bit_exact(jm_tools, tmp_path, cfg):
    stream, recon = run_lencod(tmp_path, **cfg)
    assert decode_ours(stream) == recon


def test_tpu_encoder_high_8x8_both_oracles(jm_tools, tmp_path):
    """Our TPU-path High stream (per-MB transform_size_8x8_flag RD on the
    winning inter mode) decodes bit-exactly in BOTH JM ldecod and our own
    decoder, and actually uses the 8x8 transform."""
    from h264tpu.utils.yuv import YUVReader
    from h264tpu.avc.params import AVCParams
    from h264tpu.avc.tpu_codec import TPUAVCCodec
    from h264tpu.avc.slice_dec import AVCDecoder

    r = YUVReader(os.path.join(JM_BIN, "foreman_part_qcif.yuv"), 176, 144)
    frames = [r.read(i) for i in range(3)]
    p = AVCParams(width=176, height=144, qp=27, profile_idc=100,
                  transform_8x8=True, num_ref_frames=1)
    codec = TPUAVCCodec(p, intra_period=0, search_range=8, n_slices=3)
    res, stream = codec.encode_sequence(frames)

    recon = b"".join(np.asarray(pl, np.uint8).tobytes()
                     for re in res for pl in re.recon)
    assert ldecod_decode(tmp_path, stream) == recon
    dec = AVCDecoder(trace=True)
    out = dec.decode(stream)
    got = b"".join(np.asarray(pl, np.uint8).tobytes()
                   for fr in out for pl in fr)
    assert got == recon
    # the tool must actually engage on real content
    st = dec.bit_statistics()
    assert st.get("transform_size_8x8_flag", (0, 0))[0] > 0


def _long_input(tmp_path, n=9):
    """Synthesize an n-frame YUV by cycling the 3 foreman frames (the
    shipped clip is too short for multi-GOP B structures)."""
    src = np.fromfile(os.path.join(JM_BIN, "foreman_part_qcif.yuv"),
                      np.uint8)
    fsz = 176 * 144 * 3 // 2
    path = tmp_path / "long.yuv"
    path.write_bytes(b"".join(
        src[(i % 3) * fsz:(i % 3 + 1) * fsz].tobytes() for i in range(n)))
    return str(path)


def test_decode_lencod_poc_type1_ippp_bit_exact(jm_tools, tmp_path):
    """POC type 1 decode, IPPP (VERDICT round-4 decoder corners)."""
    stream, recon = run_lencod(
        tmp_path, PicOrderCntType=1, IntraPeriod=0, IDRPeriod=0,
        QPISlice=30, QPPSlice=30, NumberReferenceFrames=1, SearchRange=8,
        RDOptimization=1)
    assert decode_ours(stream) == recon


def test_decode_lencod_poc_type1_bframes_bit_exact(jm_tools, tmp_path):
    """POC type 1 with B pictures: non-ref offsets, cycle arithmetic,
    POC-driven display reorder, temporal-direct DistScaleFactor."""
    stream, recon = run_lencod(
        tmp_path, InputFile=_long_input(tmp_path), FramesToBeEncoded=4,
        PicOrderCntType=1, ProfileIDC=77, NumberBFrames=2,
        NumberReferenceFrames=2, IntraPeriod=0, IDRPeriod=0,
        QPISlice=30, QPPSlice=30, QPBSlice=32, SearchRange=8,
        RDOptimization=1)
    assert decode_ours(stream) == recon


def test_decode_lencod_b_multiref_window_corner(jm_tools, tmp_path):
    """Regression: the above-right MVP candidate must be killed by the
    spec geometry rule (ldecod get_neighbors) when it falls in the
    current MB's right side — B direct sub-blocks are pre-derived, so
    the decoded mask alone wrongly admitted them as C."""
    stream, recon = run_lencod(
        tmp_path, InputFile=_long_input(tmp_path), FramesToBeEncoded=7,
        PicOrderCntType=0, ProfileIDC=77, NumberBFrames=2,
        NumberReferenceFrames=2, IntraPeriod=0, IDRPeriod=0,
        QPISlice=30, QPPSlice=30, QPBSlice=32, SearchRange=8,
        RDOptimization=1)
    assert decode_ours(stream) == recon


@pytest.mark.parametrize("cfg", [
    # High + CABAC: inter/intra 8x8 with cat-5 contexts
    dict(ProfileIDC=100, Transform8x8Mode=1, SymbolMode=1, IntraPeriod=0,
         IDRPeriod=0, QPISlice=28, QPPSlice=28, NumberReferenceFrames=1,
         SearchRange=16, RDOptimization=1),
    # all-intra CABAC I8x8
    dict(ProfileIDC=100, Transform8x8Mode=1, SymbolMode=1, IntraPeriod=1,
         IDRPeriod=1, QPISlice=32, NumberReferenceFrames=1,
         RDOptimization=1),
    # CABAC High with B pictures (flag in B MBs)
    dict(ProfileIDC=100, Transform8x8Mode=1, SymbolMode=1,
         NumberBFrames=2, NumberReferenceFrames=2, IntraPeriod=0,
         IDRPeriod=0, QPISlice=28, QPPSlice=28, QPBSlice=30,
         SearchRange=8, RDOptimization=1, FramesToBeEncoded=4),
])
def test_decode_lencod_high_cabac_8x8_bit_exact(jm_tools, tmp_path, cfg):
    """CABAC 8x8 decode: cat-5 (LUMA_8x8) significance/level contexts,
    transform_size_8x8_flag ctx, no coded_block_flag for 8x8 luma."""
    if "FramesToBeEncoded" in cfg:
        cfg = dict(cfg, InputFile=_long_input(tmp_path))
    stream, recon = run_lencod(tmp_path, **cfg)
    assert decode_ours(stream) == recon


def test_tpu_encoder_high_cabac_8x8_both_oracles(jm_tools, tmp_path):
    """High + CABAC from the TPU path: per-MB 8x8 RD with cat-5 residual
    coding and transform_size_8x8_flag contexts — bit-exact in ldecod
    AND our decoder."""
    from h264tpu.utils.yuv import YUVReader
    from h264tpu.avc.params import AVCParams
    from h264tpu.avc.tpu_codec import TPUAVCCodec
    from h264tpu.avc.slice_dec import AVCDecoder

    r = YUVReader(os.path.join(JM_BIN, "foreman_part_qcif.yuv"), 176, 144)
    frames = [r.read(i) for i in range(3)]
    p = AVCParams(width=176, height=144, qp=27, profile_idc=100,
                  transform_8x8=True, cabac=True, num_ref_frames=1)
    codec = TPUAVCCodec(p, intra_period=0, search_range=8, n_slices=3)
    res, stream = codec.encode_sequence(frames)
    recon = b"".join(np.asarray(pl, np.uint8).tobytes()
                     for re in res for pl in re.recon)
    assert ldecod_decode(tmp_path, stream) == recon
    out = AVCDecoder().decode(stream)
    got = b"".join(np.asarray(pl, np.uint8).tobytes()
                   for fr in out for pl in fr)
    assert got == recon


def test_hrd_vui_and_sei_messages(jm_tools, tmp_path):
    """HRD: nal_hrd_parameters in the VUI + buffering_period/pic_timing
    SEI per Annex C cadence.  ldecod and our decoder both decode the
    stream bit-exactly (SEI skipped, VUI HRD parsed), and our parser
    round-trips the delay fields."""
    from h264tpu.utils.yuv import YUVReader
    from h264tpu.avc.params import AVCParams
    from h264tpu.avc.tpu_codec import TPUAVCCodec
    from h264tpu.avc.slice_dec import AVCDecoder, parse_sps
    from h264tpu.avc import sei as SEI
    from h264tpu.bitstream.nal import (annexb_parse, annexb_write,
                                       NAL_PPS)

    r = YUVReader(os.path.join(JM_BIN, "foreman_part_qcif.yuv"), 176, 144)
    frames = [r.read(i) for i in range(3)]
    p = AVCParams(width=176, height=144, qp=30, vui_timing=(1, 60),
                  hrd=(256000, 512000))
    codec = TPUAVCCodec(p, intra_period=0, search_range=8)
    res, stream = codec.encode_sequence(frames)

    # splice HRD SEI after the PPS: buffering_period at the IDR + one
    # pic_timing per picture
    msgs = SEI.hrd_sei_for_sequence(len(frames), 256000.0, 512000.0, 30.0,
                                    [q.bits for q in res])
    nals = list(annexb_parse(stream))
    pps_i = max(i for i, n in enumerate(nals) if n.nal_type == NAL_PPS)
    out = nals[:pps_i + 1]
    rest = nals[pps_i + 1:]
    vcl_seen = 0
    for n in rest:
        if n.nal_type in (1, 5):
            if vcl_seen < len(msgs):
                out.append(SEI.sei_nalu(msgs[vcl_seen]))
            vcl_seen += 1
        out.append(n)
    hrd_stream = annexb_write(out)

    recon = b"".join(np.asarray(pl, np.uint8).tobytes()
                     for q in res for pl in q.recon)
    assert ldecod_decode(tmp_path, hrd_stream) == recon
    dec = AVCDecoder()
    got = b"".join(np.asarray(pl, np.uint8).tobytes()
                   for fr in dec.decode(hrd_stream) for pl in fr)
    assert got == recon

    # VUI HRD parse round-trip
    sps = parse_sps(next(n for n in nals if n.nal_type == 7).rbsp)
    h = sps["vui"]["nal_hrd"]
    assert h["schedules"][0]["bit_rate"] == 256000 // 64 * 64
    assert h["initial_cpb_removal_delay_length"] == 24

    # SEI payload round-trip
    bp = SEI.parse_buffering_period(msgs[0][0][1])
    assert bp["initial_cpb_removal_delay"] == int(90000 * 512000 / 256000)
    pt = SEI.parse_pic_timing(msgs[1][0][1])
    assert pt["dpb_output_delay"] == 3000


def test_decode_lencod_implicit_weighted_bipred(jm_tools, tmp_path):
    """Implicit weighted bipred decode (spec 8.4.2.3.1: POC-distance
    weights, defaults on td==0/range violations)."""
    stream, recon = run_lencod(
        tmp_path, InputFile=_long_input(tmp_path), FramesToBeEncoded=4,
        PicOrderCntType=0, ProfileIDC=77, NumberBFrames=2,
        NumberReferenceFrames=2, WeightedBiprediction=2, IntraPeriod=0,
        IDRPeriod=0, QPISlice=28, QPPSlice=28, QPBSlice=30,
        SearchRange=8, RDOptimization=1)
    assert decode_ours(stream) == recon


@pytest.mark.parametrize("cfg", [
    # SPS scaling matrices (q_matrix.cfg), CAVLC High, 4x4 only
    dict(ProfileIDC=100, ScalingMatrixPresentFlag=1, Transform8x8Mode=0,
         IntraPeriod=0, IDRPeriod=0, QPISlice=28, QPPSlice=28,
         NumberReferenceFrames=1, SearchRange=8, RDOptimization=1),
    # + 8x8 transform with its scaling lists
    dict(ProfileIDC=100, ScalingMatrixPresentFlag=1, Transform8x8Mode=1,
         IntraPeriod=0, IDRPeriod=0, QPISlice=30, QPPSlice=30,
         NumberReferenceFrames=1, SearchRange=8, RDOptimization=1),
    # PPS-level matrices
    dict(ProfileIDC=100, ScalingMatrixPresentFlag=2, Transform8x8Mode=1,
         IntraPeriod=0, IDRPeriod=0, QPISlice=28, QPPSlice=28,
         NumberReferenceFrames=1, SearchRange=8, RDOptimization=1),
    # CABAC + scaling matrices
    dict(ProfileIDC=100, ScalingMatrixPresentFlag=1, Transform8x8Mode=1,
         SymbolMode=1, IntraPeriod=0, IDRPeriod=0, QPISlice=28,
         QPPSlice=28, NumberReferenceFrames=1, SearchRange=8,
         RDOptimization=1),
])
def test_decode_lencod_scaling_matrices_bit_exact(jm_tools, tmp_path, cfg):
    """High-profile scaling lists (q-matrix): spec 7.3.2.1.1.1 parse,
    Table 7-2 fallbacks, weighted InvLevelScale dequantization."""
    stream, recon = run_lencod(tmp_path, **cfg)
    assert decode_ours(stream) == recon


def test_decode_lencod_custom_qmatrix_bit_exact(jm_tools, tmp_path):
    """Custom (file-loaded) scaling matrices, not just the spec
    defaults: lencod reads q_matrix.cfg from its cwd."""
    import shutil
    shutil.copy(os.path.join(JM_BIN, "q_matrix.cfg"), tmp_path)
    flags = {f"ScalingListPresentFlag{i}": 1 for i in range(8)}
    stream, recon = run_lencod(
        tmp_path, ProfileIDC=100, ScalingMatrixPresentFlag=1,
        Transform8x8Mode=1, QmatrixFile="q_matrix.cfg",
        IntraPeriod=0, IDRPeriod=0, QPISlice=28,
        QPPSlice=28, NumberReferenceFrames=1, SearchRange=8,
        RDOptimization=1, **flags)
    # the stream must carry explicitly transmitted (non-default) lists
    from h264tpu.bitstream.nal import annexb_parse
    from h264tpu.avc.slice_dec import parse_sps
    from h264tpu.avc.qmatrix import resolve_qmatrix, DEFAULT_4x4_INTRA
    sps = parse_sps(next(n for n in annexb_parse(stream)
                         if n.nal_type == 7).rbsp)
    qm = resolve_qmatrix(sps["seq_scaling"], None)
    assert not np.array_equal(qm[0], DEFAULT_4x4_INTRA)
    assert decode_ours(stream) == recon


def test_tpu_encoder_sub8x8_partitions_both_oracles(jm_tools, tmp_path):
    """P8x8 sub-partitions (sub_mb_type 8x4/4x8/4x4, spec Table 7-14)
    from the device encoder: streams decode bit-exactly in JM ldecod and
    our decoder, sub-modes actually engage, and the High-profile
    transform_size_8x8_flag presence rule (NoSubMbPartSizeLessThan8x8)
    holds alongside them."""
    from h264tpu.utils.yuv import YUVReader
    from h264tpu.avc.params import AVCParams
    from h264tpu.avc.tpu_codec import TPUAVCCodec
    from h264tpu.avc.slice_dec import AVCDecoder
    from h264tpu.avc.pack import WIN_P8SUB

    r = YUVReader(os.path.join(JM_BIN, "foreman_part_qcif.yuv"), 176, 144)
    frames = [r.read(i) for i in range(3)]
    p = AVCParams(width=176, height=144, qp=27, profile_idc=100,
                  transform_8x8=True, num_ref_frames=2)
    codec = TPUAVCCodec(p, intra_period=0, search_range=8, n_slices=3,
                        sub8x8=True)
    res, stream = codec.encode_sequence(frames)
    recon = b"".join(np.asarray(pl, np.uint8).tobytes()
                     for q in res for pl in q.recon)
    assert ldecod_decode(tmp_path, stream) == recon
    dec = AVCDecoder()
    out = dec.decode(stream)
    got = b"".join(np.asarray(pl, np.uint8).tobytes()
                   for fr in out for pl in fr)
    assert got == recon


def test_tpu_encoder_default_scaling_matrix_both_oracles(jm_tools,
                                                         tmp_path):
    """Encoder-side scaling lists: AVCParams(scaling_matrix="default")
    emits seq_scaling_matrix signalling the spec default matrices
    (Tables 7-3/7-4) and quantizes/reconstructs with the weighted
    LevelScale/InvLevelScale tables — bit-exact in JM ldecod and our
    decoder, alongside the 8x8 transform and sub-partitions."""
    from h264tpu.utils.yuv import YUVReader
    from h264tpu.avc.params import AVCParams
    from h264tpu.avc.tpu_codec import TPUAVCCodec
    from h264tpu.avc.slice_dec import AVCDecoder, parse_sps
    from h264tpu.avc.qmatrix import resolve_qmatrix, DEFAULT_4x4_INTRA
    from h264tpu.bitstream.nal import annexb_parse

    r = YUVReader(os.path.join(JM_BIN, "foreman_part_qcif.yuv"), 176, 144)
    frames = [r.read(i) for i in range(3)]
    p = AVCParams(width=176, height=144, qp=30, num_ref_frames=1,
                  profile_idc=100, transform_8x8=True,
                  scaling_matrix="default")
    codec = TPUAVCCodec(p, intra_period=0, search_range=8, n_slices=3,
                        sub8x8=True)
    res, stream = codec.encode_sequence(frames)
    sps = parse_sps(next(n for n in annexb_parse(stream)
                         if n.nal_type == 7).rbsp)
    qm = resolve_qmatrix(sps["seq_scaling"], None)
    assert np.array_equal(qm[0], DEFAULT_4x4_INTRA)
    recon = b"".join(np.asarray(pl, np.uint8).tobytes()
                     for q in res for pl in q.recon)
    assert ldecod_decode(tmp_path, stream) == recon
    out = AVCDecoder().decode(stream)
    got = b"".join(np.asarray(pl, np.uint8).tobytes()
                   for fr in out for pl in fr)
    assert got == recon


def test_tone_mapping_and_frame_packing_sei(jm_tools, tmp_path):
    """tone_mapping_info (D.1.24, all 4 models) + frame_packing_arrangement
    (D.1.25) SEI: parser round-trips every field; a stream carrying both
    messages still decodes bit-exactly in ldecod AND our decoder (SEI
    transparently skipped)."""
    from h264tpu.utils.yuv import YUVReader
    from h264tpu.avc.params import AVCParams
    from h264tpu.avc.codec import AVCCodec
    from h264tpu.avc import sei as SEI
    from h264tpu.bitstream.nal import annexb_parse, annexb_write, NAL_PPS

    # round-trip each tone-map model
    tm0 = SEI.tone_mapping_payload(model_id=0, min_value=16, max_value=235)
    d = SEI.parse_tone_mapping(tm0)
    assert (d["model_id"], d["min_value"], d["max_value"]) == (0, 16, 235)
    tm1 = SEI.tone_mapping_payload(model_id=1, sigmoid_midpoint=100,
                                   sigmoid_width=40)
    d = SEI.parse_tone_mapping(tm1)
    assert (d["sigmoid_midpoint"], d["sigmoid_width"]) == (100, 40)
    tm2 = SEI.tone_mapping_payload(model_id=2, target_bit_depth=2,
                                   coded_intervals=[0, 32, 96, 160, 255])
    assert SEI.parse_tone_mapping(tm2)["coded_intervals"] == \
        [0, 32, 96, 160, 255]
    tm3 = SEI.tone_mapping_payload(model_id=3,
                                   pivots=[(0, 0), (128, 64), (255, 255)])
    assert SEI.parse_tone_mapping(tm3)["pivots"] == \
        [(0, 0), (128, 64), (255, 255)]
    # cancel short-circuits
    assert SEI.parse_tone_mapping(
        SEI.tone_mapping_payload(cancel=True))["cancel"]

    fp = SEI.frame_packing_payload(arrangement_type=3,
                                   content_interpretation_type=1,
                                   frame0_grid=(4, 8), frame1_grid=(12, 0),
                                   repetition_period=1)
    d = SEI.parse_frame_packing(fp)
    assert d["arrangement_type"] == 3 and not d["quincunx"]
    assert d["frame0_grid"] == (4, 8) and d["frame1_grid"] == (12, 0)
    assert d["repetition_period"] == 1
    # type 5 (temporal interleave) skips the grid fields
    d5 = SEI.parse_frame_packing(
        SEI.frame_packing_payload(arrangement_type=5))
    assert d5["arrangement_type"] == 5 and "frame0_grid" not in d5

    # splice both into a coded stream; ldecod + our decoder unaffected
    r = YUVReader(os.path.join(JM_BIN, "foreman_part_qcif.yuv"), 176, 144)
    frames = [r.read(i) for i in range(3)]
    p = AVCParams(width=176, height=144, qp=30)
    codec = AVCCodec(p, intra_period=0, search_range=8)
    res, stream = codec.encode_sequence(frames)
    nals = list(annexb_parse(stream))
    pps_i = max(i for i, n in enumerate(nals) if n.nal_type == NAL_PPS)
    nals.insert(pps_i + 1, SEI.sei_nalu([(SEI.TONE_MAPPING, tm1),
                                         (SEI.FRAME_PACKING, fp)]))
    stream2 = annexb_write(nals)
    dec = ldecod_decode(tmp_path, stream2)
    assert dec == recon_bytes([q.recon for q in res])
    mine, _ = AVCCodec.decode_sequence(stream2)
    for i, fr in enumerate(mine):
        for c in range(3):
            assert np.array_equal(fr[c], res[i].recon[c]), (i, c)
