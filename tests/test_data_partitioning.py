"""Data partitioning (spec 7.4.1, NAL types 2/3/4; Extended profile).

Decoder: JM lencod PartitionMode=1 streams decode bit-exactly (slice
header + category-2 syntax from partition A, intra residual from B,
inter residual from C).  Encoder: our DP streams decode bit-exactly in
JM ldecod and in our own decoder.
"""

import os

import numpy as np

from test_avc_conformance import (JM_BIN, run_lencod, decode_ours,
                                  ldecod_decode, jm_tools)  # noqa: F401


def test_decode_lencod_dp_bit_exact(jm_tools, tmp_path):
    stream, recon = run_lencod(
        tmp_path, PartitionMode=1, ProfileIDC=88, IntraPeriod=0,
        IDRPeriod=0, QPISlice=30, QPPSlice=30, NumberReferenceFrames=1,
        SearchRange=8, RDOptimization=1)
    from h264tpu.bitstream.nal import annexb_parse
    types = [n.nal_type for n in annexb_parse(stream)]
    assert 2 in types and 3 in types and 4 in types
    assert decode_ours(stream) == recon


def test_tpu_encoder_dp_both_oracles(jm_tools, tmp_path):
    from h264tpu.utils.yuv import YUVReader
    from h264tpu.avc.params import AVCParams
    from h264tpu.avc.tpu_codec import TPUAVCCodec
    from h264tpu.avc.slice_dec import AVCDecoder
    from h264tpu.bitstream.nal import annexb_parse

    r = YUVReader(os.path.join(JM_BIN, "foreman_part_qcif.yuv"), 176, 144)
    frames = [r.read(i) for i in range(3)]
    p = AVCParams(width=176, height=144, qp=30, num_ref_frames=1,
                  profile_idc=88)
    codec = TPUAVCCodec(p, intra_period=0, search_range=8, n_slices=3,
                        data_partitioning=True)
    res, stream = codec.encode_sequence(frames)
    types = [n.nal_type for n in annexb_parse(stream)]
    assert types.count(2) == 6 and types.count(3) == 6 \
        and types.count(4) == 6          # 2 P frames x 3 slices
    recon = b"".join(np.asarray(pl, np.uint8).tobytes()
                     for q in res for pl in q.recon)
    assert ldecod_decode(tmp_path, stream) == recon
    out = AVCDecoder().decode(stream)
    got = b"".join(np.asarray(pl, np.uint8).tobytes()
                   for fr in out for pl in fr)
    assert got == recon
