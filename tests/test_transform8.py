"""8x8 transform/quant kernels (High-profile core groundwork, J7).

The forward/inverse butterflies are golden-tested against the reference
C compiled directly from the checkout (same oracle pattern as the
lencod/ldecod builds: reference source compiled as a test fixture, not
shipped)."""

import ctypes
import os
import re
import subprocess

import numpy as np
import pytest

import jax.numpy as jnp

from h264tpu.avc import quant8_jax as Q8

REF_TRANSFORM_C = ("/root/reference/4.对比程序/jm18.5/JM/lcommon/src/"
                   "transform.c")


@pytest.fixture(scope="module")
def ref_lib(tmp_path_factory):
    """Compile the reference forward8x8/inverse8x8 into a test .so."""
    if not os.path.exists(REF_TRANSFORM_C):
        pytest.skip("reference transform.c unavailable")
    text = open(REF_TRANSFORM_C, encoding="utf-8", errors="replace").read()

    def grab(name):
        m = re.search(r"void " + name + r"\(int \*\*.*?\n\}", text, re.S)
        return m.group(0)

    tmp = tmp_path_factory.mktemp("ref8")
    src = tmp / "t8.c"
    src.write_text(
        "#define BLOCK_SIZE_8x8 8\n"
        + grab("forward8x8") + "\n\n" + grab("inverse8x8") + "\n\n"
        + """
void fwd8(const int *in, int *out) {
  int brows[8][8], trows[8][8];
  int *bp[8], *tp[8];
  for (int i = 0; i < 8; i++) {
    bp[i] = brows[i]; tp[i] = trows[i];
    for (int j = 0; j < 8; j++) brows[i][j] = in[i * 8 + j];
  }
  forward8x8(bp, tp, 0, 0);
  for (int i = 0; i < 8; i++)
    for (int j = 0; j < 8; j++) out[i * 8 + j] = trows[i][j];
}
void inv8(const int *in, int *out) {
  int brows[8][8], trows[8][8];
  int *bp[8], *tp[8];
  for (int i = 0; i < 8; i++) {
    bp[i] = brows[i]; tp[i] = trows[i];
    for (int j = 0; j < 8; j++) trows[i][j] = in[i * 8 + j];
  }
  inverse8x8(tp, bp, 0);
  for (int i = 0; i < 8; i++)
    for (int j = 0; j < 8; j++) out[i * 8 + j] = brows[i][j];
}
""")
    so = tmp / "t8.so"
    subprocess.run(["gcc", "-O2", "-shared", "-fPIC", str(src),
                    "-o", str(so)], check=True, capture_output=True)
    lib = ctypes.CDLL(str(so))
    for f in (lib.fwd8, lib.inv8):
        f.argtypes = [ctypes.POINTER(ctypes.c_int),
                      ctypes.POINTER(ctypes.c_int)]
    return lib


def _ref(libfn, block):
    a = np.ascontiguousarray(block.reshape(64), np.int32)
    out = np.zeros(64, np.int32)
    libfn(a.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
          out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return out.reshape(8, 8).astype(np.int64)


def test_butterflies_match_reference(ref_lib, rng):
    for mag in (255, 30, 4000):
        blocks = rng.integers(-mag, mag + 1, (50, 8, 8))
        ours_f = np.asarray(Q8.fdct8x8(jnp.asarray(blocks)))
        ours_i = np.asarray(Q8.idct8x8(jnp.asarray(blocks)))
        for k in range(50):
            assert np.array_equal(ours_f[k], _ref(ref_lib.fwd8, blocks[k]))
            assert np.array_equal(ours_i[k], _ref(ref_lib.inv8, blocks[k]))


@pytest.mark.parametrize("qp", [0, 12, 26, 38, 51])
def test_quant_roundtrip_recon(qp, rng):
    """T -> Q -> IQ -> IT -> recon stays within the quantizer step."""
    pred = rng.integers(0, 256, (20, 8, 8))
    org = np.clip(pred + rng.integers(-24, 25, (20, 8, 8)), 0, 255)
    w = Q8.fdct8x8(jnp.asarray(org - pred))
    lev = Q8.quant8x8(w, qp, intra=False)
    deq = Q8.dequant8x8(lev, qp)
    rec = np.asarray(Q8.reconstruct8(jnp.asarray(pred), Q8.idct8x8(deq)))
    err = np.abs(rec - org).mean()
    qstep = 0.625 * 2 ** (qp / 6)
    assert err <= max(1.0, 1.2 * qstep), (qp, err)
    if qp == 0:
        assert np.abs(rec - org).max() <= 1


def test_zigzag8_is_spec_scan():
    zz = Q8.ZIGZAG8_FLAT
    assert sorted(zz.tolist()) == list(range(64))
    assert zz[0] == 0 and zz[1] == 1 and zz[2] == 8 and zz[3] == 16
    assert zz[-1] == 63
