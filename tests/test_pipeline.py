"""End-to-end pipeline tests on the real foreman sequence."""

import os

import numpy as np
import pytest

from h264tpu.utils.config import CodecConfig, FractalConfig
from h264tpu.models.fractal_codec import FractalCodec


def test_foreman_ipp(foreman_qcif):
    cfg = CodecConfig(width=176, height=144, qp=28, intra_period=12,
                      fractal=FractalConfig(search_range=4))
    codec = FractalCodec(cfg)
    frames = [foreman_qcif.read(i) for i in range(min(3, len(foreman_qcif)))]
    results, _stream = codec.encode_sequence(frames)

    assert results[0].frame_type == "I"
    assert all(r.frame_type == "P" for r in results[1:])
    # quality sanity: recon must track the source closely at QP28
    for r in results:
        assert r.psnr_y > 30.0, (r.frame_type, r.psnr_y)
        assert r.psnr_u > 30.0 and r.psnr_v > 30.0
    # P-frames must beat plain copy of the previous recon
    prev = results[0].recon[0]
    y1 = np.asarray(frames[1][0])
    copy_psnr = 10 * np.log10(255**2 / np.mean((prev.astype(float) - y1) ** 2))
    assert results[1].psnr_y > copy_psnr + 3.0


def test_residual_thresholding_zeroes_flat_mbs(rng):
    """An MB with near-zero residual must be dropped entirely (cost<=5 rule)."""
    import jax.numpy as jnp
    from h264tpu.ops import transform as T
    pred = rng.integers(0, 250, size=(32, 32)).astype(np.int32)
    org = pred.copy()
    org[0, 0] += 1  # tiny single-pixel residual -> level<=1, cost small
    zz, rec = T.residual_code_plane(jnp.asarray(org), jnp.asarray(pred), 28)
    assert int((np.asarray(zz) != 0).sum()) == 0
    np.testing.assert_array_equal(np.asarray(rec), pred)


def test_gop_parallel_and_checkpoint_resume(foreman_qcif, tmp_path):
    """IDR-delimited GOP distribution (SURVEY §2.3 GOP axis / §5
    checkpoint-resume): concatenated parallel encode == sequential
    stream byte-identical; a resumed encode skips finished GOP units and
    still produces the identical stream."""
    import numpy as np
    from h264tpu.avc.params import AVCParams
    from h264tpu.avc.tpu_codec import TPUAVCCodec
    from h264tpu.avc.codec import AVCCodec
    from h264tpu.models.gop_parallel import GOPEncoder, split_gops

    assert split_gops(10, 4) == [(0, 4), (4, 8), (8, 10)]
    assert split_gops(6, 0) == [(0, 6)]

    base = [foreman_qcif.read(i) for i in range(3)]
    frames = [tuple(np.roll(pl, (i, -i), (0, 1)) for pl in base[i % 3])
              for i in range(8)]

    def factory():
        p = AVCParams(width=176, height=144, qp=30)
        return TPUAVCCodec(p, intra_period=0, search_range=8, n_slices=3)

    # sequential reference: one codec per GOP, concatenated
    seq = GOPEncoder(factory, intra_period=4)
    units_seq, stream_seq = seq.encode(frames, workers=1)
    # parallel workers -> byte-identical
    par = GOPEncoder(factory, intra_period=4)
    _, stream_par = par.encode(frames, workers=2)
    assert stream_par == stream_seq
    # the joined stream decodes to all frames
    dec, _ = AVCCodec.decode_sequence(stream_seq)
    assert len(dec) == len(frames)

    # checkpoint: encode once, delete one unit, resume — identical
    ck = tmp_path / "ckpt"
    c1 = GOPEncoder(factory, intra_period=4, checkpoint_dir=str(ck))
    _, s1 = c1.encode(frames)
    assert len(list(ck.iterdir())) == 2
    (ck / "gop_00001.pkl").unlink()          # simulate partial crash
    calls = []
    real_factory = factory

    def counting_factory():
        calls.append(1)
        return real_factory()

    c2 = GOPEncoder(counting_factory, intra_period=4,
                    checkpoint_dir=str(ck))
    _, s2 = c2.encode(frames)
    assert s2 == s1
    assert len(calls) == 1                   # only the missing GOP re-ran


def test_gop_parallel_fvc(foreman_qcif):
    """GOPEncoder over the fractal codec: parallel == sequential."""
    from h264tpu.utils.config import CodecConfig, FractalConfig
    from h264tpu.models.fractal_codec import FractalCodec
    from h264tpu.models.gop_parallel import GOPEncoder

    base = [foreman_qcif.read(i) for i in range(3)]
    frames = [base[i % 3] for i in range(6)]

    def factory():
        cfg = CodecConfig(width=176, height=144, qp=30, intra_period=0,
                          fractal=FractalConfig(search_range=3))
        return FractalCodec(cfg)

    seq = GOPEncoder(factory, intra_period=3)
    units1, s1 = seq.encode(frames, workers=1)
    par = GOPEncoder(factory, intra_period=3)
    units2, s2 = par.encode(frames, workers=2)
    assert s1 == s2 and len(s1) > 0
    # raw-FVC GOP units are independently decodable work products
    from h264tpu.models.fractal_codec import FractalDecoder
    dec = FractalDecoder().decode(units1[0]["stream"])
    assert len(dec) == 3


def test_gop_parallel_multiprocess_byte_identical(foreman_qcif):
    """REAL process isolation (SURVEY 4(e)): GOP units encoded by spawned
    worker processes — separate interpreters/jax runtimes, results
    crossing a process boundary — concatenate byte-identically to the
    in-process sequential encode."""
    import functools
    from h264tpu.models.gop_parallel import GOPEncoder
    from h264tpu.models.gop_workers import tpu_avc_cpu_factory

    frames = [foreman_qcif.read(i % 3) for i in range(6)]
    factory = functools.partial(tpu_avc_cpu_factory, 176, 144, 30,
                                n_slices=1, search_range=4)
    _, seq_stream = GOPEncoder(factory, intra_period=3).encode(frames)
    _, mp_stream = GOPEncoder(factory, intra_period=3).encode(
        frames, workers=2, processes=True)
    assert mp_stream == seq_stream
