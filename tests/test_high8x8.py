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
                                  jm_tools)  # noqa: F401


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
])
def test_decode_lencod_high_8x8_bit_exact(jm_tools, tmp_path, cfg):
    stream, recon = run_lencod(tmp_path, **cfg)
    assert decode_ours(stream) == recon
