"""Legacy JPEG-like still-image I-frame codec (reference capability F22).

TPU-native re-design of the reference's dormant still-image codec
(``i_Frm_Encoder`` FR/src/i_Encode.c:531, ``i_Frm_Decoder``
FR/src/i_Decode.c:551, float 2-D DCT ``FDCT_2D`` FR/src/DCT.c:40, quality
scaling ``set_quant_table`` FR/src/i_Encode.c:43): 8x8 DCT + JPEG standard
quantization tables scaled by an ``I_Quality`` factor 1..100 + zigzag +
DC-DPCM / AC-run-length Huffman entropy coding.

TPU-first mapping: the whole pixel path (blocking, 8x8 DCT as two matmuls on
the MXU, quantization, zigzag) runs batched over every block of the plane in
one jitted call; only the entropy stage (inherently sequential bit packing)
is host-side, using per-image adaptive canonical Huffman tables
(:mod:`h264tpu.entropy.huffman`).  The reference's AAN scaled DCT is replaced
by the orthonormal DCT-II matrix — same transform, MXU-shaped.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..entropy import huffman as HUF
from ..entropy.bitio import BitReader, BitWriter

# JPEG Annex K standard base quantization tables (public spec constants; the
# reference embeds the same tables as std_{luminance,chrominance}_qt).
STD_LUMA_QT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64).reshape(8, 8)
STD_CHROMA_QT = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64).reshape(8, 8)


def scaled_qtable(base: np.ndarray, quality: int) -> np.ndarray:
    """JPEG quality 1..100 -> quant table (set_quant_table semantics,
    FR/src/i_Encode.c:43-66: sf = 5000/q below 50 else 200-2q;
    t = clip((base*sf+50)/100, 1, 255))."""
    q = int(np.clip(quality, 1, 100))
    sf = 5000 // q if q < 50 else 200 - q * 2
    t = (base * sf + 50) // 100
    return np.clip(t, 1, 255).astype(np.int64)


def _dct8_matrix() -> np.ndarray:
    k = np.arange(8)
    m = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    m[0] *= 1 / np.sqrt(2)
    return (m * 0.5).astype(np.float32)


_D8 = _dct8_matrix()

# 8x8 zigzag scan order (position i of the scan reads flat index ZZ8[i])
def _zigzag8() -> np.ndarray:
    order = sorted(((r + c, (c if (r + c) % 2 == 0 else r), r, c)
                    for r in range(8) for c in range(8)))
    return np.array([r * 8 + c for (_, _, r, c) in order], dtype=np.int64)


ZZ8 = _zigzag8()
ZZ8_INV = np.argsort(ZZ8)


def _blocks8(plane: jnp.ndarray) -> jnp.ndarray:
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)


def _unblocks8(blocks: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    return blocks.reshape(h // 8, w // 8, 8, 8).transpose(0, 2, 1, 3).reshape(h, w)


@functools.partial(jax.jit, static_argnums=(1, 2))
def fdct_quant_plane(plane: jnp.ndarray, quality: int, is_luma: bool):
    """Batched 8x8 FDCT + quantization + zigzag of a whole plane.

    Returns [nblk, 64] int32 zigzagged levels.  Level-shift by 128 as in
    JPEG/the reference (fdct_and_quantization, FR/src/i_Encode.c:233).
    """
    qt = scaled_qtable(STD_LUMA_QT if is_luma else STD_CHROMA_QT, quality)
    x = _blocks8(plane.astype(jnp.float32) - 128.0)
    d = jnp.einsum("ij,bjk,lk->bil", _D8, x, _D8)
    lv = jnp.round(d / qt.astype(jnp.float32)).astype(jnp.int32)
    return lv.reshape(-1, 64)[:, ZZ8]


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def dequant_idct_plane(zz: jnp.ndarray, quality: int, is_luma: bool,
                       h: int, w: int):
    """Inverse of :func:`fdct_quant_plane` -> uint8 plane."""
    qt = scaled_qtable(STD_LUMA_QT if is_luma else STD_CHROMA_QT, quality)
    lv = zz[:, ZZ8_INV].reshape(-1, 8, 8).astype(jnp.float32)
    d = lv * qt.astype(jnp.float32)
    x = jnp.einsum("ji,bjk,kl->bil", _D8, d, _D8)
    out = jnp.clip(jnp.round(x + 128.0), 0, 255).astype(jnp.uint8)
    return _unblocks8(out, h, w)


def _size_cat(v: np.ndarray) -> np.ndarray:
    """JPEG size category: bits needed for |v| (0 for v == 0)."""
    return np.where(v == 0, 0,
                    np.floor(np.log2(np.maximum(np.abs(v), 1))).astype(np.int64) + 1)


def _amp_bits(v: np.ndarray, size: np.ndarray):
    """JPEG amplitude coding: negative values stored as v + (2^size - 1)."""
    return np.where(v < 0, v + (1 << size) - 1, v).astype(np.int64)


def _amp_undo(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def _entropy_encode_plane(w: BitWriter, zz: np.ndarray):
    """DC DPCM + AC (run,size) run-length symbols, adaptive canonical
    Huffman tables serialized in-stream (HufBlock syntax family,
    FR/src/i_Decode.c:248, with per-image tables instead of fixed ones)."""
    nblk = zz.shape[0]
    dc = zz[:, 0]
    dcd = np.diff(dc, prepend=0)
    dc_size = _size_cat(dcd)

    ac_syms = []          # (run<<4)|size, 0x00 = EOB, 0xF0 = ZRL
    ac_amp = []           # (value, size) pairs
    for b in range(nblk):
        run = 0
        row = zz[b]
        nz = np.nonzero(row[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for i in range(1, last + 1):
            v = int(row[i])
            if v == 0:
                run += 1
                if run == 16:
                    ac_syms.append(0xF0)
                    run = 0
                continue
            s = int(_size_cat(np.int64(v)))
            ac_syms.append((run << 4) | s)
            ac_amp.append((v, s))
            run = 0
        if last < 63:
            ac_syms.append(0x00)
    ac_syms = np.asarray(ac_syms, dtype=np.int64)

    dc_hist = np.bincount(dc_size, minlength=16)
    ac_hist = np.bincount(ac_syms, minlength=256)
    dc_len = HUF.code_lengths(dc_hist)
    ac_len = HUF.code_lengths(ac_hist)

    w.ue(np.asarray([nblk], dtype=np.int64))
    HUF.write_codebook(w, dc_len)
    HUF.write_codebook(w, ac_len)
    w.ue(np.asarray([len(ac_syms)], dtype=np.int64))

    dc_codes = HUF.canonical_codes(dc_len)
    HUF.encode_symbols(w, dc_size, dc_len, dc_codes)
    # DC amplitude bits interleaving is unnecessary for a grouped layout:
    # write all DC amplitudes, then AC symbols, then AC amplitudes (grouped
    # fields pack/unpack vectorized — same information, fewer host loops).
    nzdc = dc_size > 0
    w.raw(_amp_bits(dcd[nzdc], dc_size[nzdc]), dc_size[nzdc])
    HUF.encode_symbols(w, ac_syms, ac_len)
    if ac_amp:
        av = np.asarray([v for v, _ in ac_amp], dtype=np.int64)
        asz = np.asarray([s for _, s in ac_amp], dtype=np.int64)
        w.raw(_amp_bits(av, asz), asz)


def _entropy_decode_plane(r: BitReader) -> np.ndarray:
    nblk = r.ue()
    dc_len = HUF.read_codebook(r)
    ac_len = HUF.read_codebook(r)
    n_ac = r.ue()
    dc_size = HUF.decode_symbols(r, dc_len, nblk)
    dcd = np.zeros(nblk, dtype=np.int64)
    for i in range(nblk):
        s = int(dc_size[i])
        dcd[i] = _amp_undo(r.u(s), s) if s else 0
    ac_syms = HUF.decode_symbols(r, ac_len, n_ac)
    zz = np.zeros((nblk, 64), dtype=np.int64)
    zz[:, 0] = np.cumsum(dcd)
    # replay run-length symbols into positions, then read grouped amplitudes
    pos_list, size_list = [], []
    b, i = 0, 1
    for sym in ac_syms:
        sym = int(sym)
        if sym == 0x00:
            b += 1
            i = 1
            continue
        if sym == 0xF0:
            i += 16
            continue
        run, s = sym >> 4, sym & 15
        i += run
        pos_list.append((b, i))
        size_list.append(s)
        i += 1
        if i > 63:
            b += 1
            i = 1
    for (bb, ii), s in zip(pos_list, size_list):
        zz[bb, ii] = _amp_undo(r.u(s), s)
    return zz


MAGIC = b"LIC1"


def encode_image(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                 quality: int = 75) -> bytes:
    """Encode one YUV420 image with the legacy JPEG-like codec."""
    w = BitWriter()
    for byte in MAGIC:
        w.u(np.asarray([byte], dtype=np.int64), 8)
    h, wd = y.shape
    w.u(np.asarray([h, wd, int(np.clip(quality, 1, 100))], dtype=np.int64), 16)
    for plane, is_luma in ((y, True), (u, False), (v, False)):
        zz = np.asarray(fdct_quant_plane(jnp.asarray(plane), quality, is_luma),
                        dtype=np.int64)
        _entropy_encode_plane(w, zz)
    return w.to_bytes()


def decode_image(stream: bytes):
    """Decode a legacy-codec image -> (y, u, v) uint8 planes."""
    r = BitReader(stream)
    magic = bytes(r.u(8) for _ in range(4))
    if magic != MAGIC:
        raise ValueError("not a legacy I-codec stream")
    h, wd, quality = (r.u(16) for _ in range(3))
    out = []
    for is_luma in (True, False, False):
        ph, pw = (h, wd) if is_luma else (h // 2, wd // 2)
        zz = _entropy_decode_plane(r)
        out.append(np.asarray(dequant_idct_plane(
            jnp.asarray(zz, dtype=jnp.int32), quality, is_luma, ph, pw)))
    return tuple(out)
